"""GS3DRenderer — residual decoding, deformation, and view rendering.

Reference parity: GS3DRenderer (igs/models/gs.py:499-962). Split TPU-style:
  * ``ResidualDecoder`` (flax) = mlp_net + zero-init output heads
    (gs.py:535-559, decode_residual_feature gs.py:858-869). Rotation head
    bias is initialized to (1, 1e-2, 1e-2, 1e-2) exactly as gs.py:553.
  * ``interpolate_residuals`` = query_ir_grid (gs.py:759-821) over the
    static AnchorState (weights/neighbors precomputed).
  * ``render_views`` = forward_single_batch/forward_single_view
    (gs.py:566-856): deform then rasterize each output camera with the
    clamp rasterizer, kernel_size=0, full depth/coord outputs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.models.networks import MLP
from igs_tpu.ops.anchors import AnchorState, interpolate_anchor_features
from igs_tpu.ops.rasterize import RasterSettings, rasterize


class ResidualDecoder(nn.Module):
    """anchor/gaussian feature (…, C) → residual dict {xyz (…,3), rotation (…,4)}."""

    in_channels: int = 128
    n_neurons: int = 128
    n_hidden_layers: int = 2
    feature_channels: tuple = (("xyz", 3), ("rotation", 4))

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = MLP(
            dim_in=self.n_neurons,
            dim_out=self.in_channels,
            n_neurons=self.n_neurons,
            n_hidden_layers=self.n_hidden_layers,
            activation="silu",
            name="mlp_net",
        )(x)
        out = {}
        for key, ch in self.feature_channels:
            if key == "rotation":
                bias_init = lambda *_: jnp.array([1.0, 1e-2, 1e-2, 1e-2])
            else:
                bias_init = nn.initializers.zeros
            out[key] = nn.Dense(
                ch,
                kernel_init=nn.initializers.zeros,
                bias_init=bias_init,
                name=f"head_{key}",
            )(x)
        return out


def interpolate_residuals(
    anchor_feats: jnp.ndarray,  # (A, C)
    state: AnchorState,
) -> jnp.ndarray:  # (N, C)
    """K-anchor weighted feature blend per Gaussian (query_ir_grid)."""
    return interpolate_anchor_features(
        anchor_feats, state.weights, state.neighbor_idx
    )


def render_views(
    gaussians: Gaussians,
    cameras: Camera,  # stacked pytree over V views
    bg: jnp.ndarray,
    settings: RasterSettings,
    ret_rgb: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Render a set of output views of one deformed Gaussians model.

    Returns images_pred (V, 3, H, W), depth_pred (V, H, W), alpha.
    """

    def one(cam):
        out = rasterize(
            means3d=gaussians.get_xyz,
            opacity=gaussians.get_opacity,
            scaling=gaussians.get_scaling,
            rotation=gaussians.get_rotation,
            camera=cam,
            shs=gaussians.shs,
            bg=bg,
            valid=gaussians.valid,
            settings=settings,
        )
        return {
            "images_pred": out["color"],
            "depth_pred": out["depth"],
            "alpha": out["alpha"],
            "normal": out["normal"],
            # static-budget truncation counter (0 = no tile clamped); the
            # driver logs it — fail-loudly posture of the reference's NaN
            # asserts (…_rade/__init__.py:156-162) adapted to static shapes
            "overflow_tiles": out["overflow_tiles"],
        }

    return jax.lax.map(one, cameras)


def deform_and_render(
    gaussians: Gaussians,
    residuals: Dict[str, jnp.ndarray],  # dense (N, ·)
    mask: jnp.ndarray,
    cameras: Camera,
    bg: jnp.ndarray,
    settings: RasterSettings,
):
    """forward_single_batch parity (gs.py:824-856)."""
    gs = gaussians.deform(
        res_xyz=residuals["xyz"],
        res_rotation=residuals.get("rotation"),
        res_shs=residuals.get("shs"),
        mask=mask,
    )
    out = render_views(gs, cameras, bg, settings)
    out["3dgs"] = gs
    return out
