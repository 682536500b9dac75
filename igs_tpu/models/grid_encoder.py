"""GridEncoder — anchor feature lifting ("triplane encoder" slot, irgrid mode).

Reference parity: GridEncoder (igs/models/grid_encoder.py:17-107) in the
active config (proj_type=perspective_projection, grid_type=irgrid,
use_gs_emb=False, res_cat=False): perspective-project the anchors into every
input view's motion-feature map (grid_sample), average over views, then a
Transformer1D over anchor tokens for global context.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from igs_tpu.core.camera import fov2focal
from igs_tpu.models.transformer1d import Transformer1D
from igs_tpu.ops.grid_sample import perspective_project_features


class GridEncoder(nn.Module):
    in_channels: int = 128
    num_attention_heads: int = 8
    attention_head_dim: int = 64
    num_layers: int = 4
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        motion_feature: jnp.ndarray,  # (B·V, C, h, w)
        anchor_points: jnp.ndarray,  # (B, A, 3)
        fov: jnp.ndarray,  # (B, 2)
        c2w_input: jnp.ndarray,  # (B, V, 4, 4)
    ) -> jnp.ndarray:  # (B, A, C)
        b, v = c2w_input.shape[:2]
        _, c, h, w = motion_feature.shape
        # NOTE reference bug-compatibility: grid_encoder.py:75 reads
        # "W, H = motion_feature.shape[-2:]" (so W:=h, H:=w) — harmless
        # when square; we use the correct order (square in all configs).
        fx = fov2focal(fov[:, 0], w)
        fy = fov2focal(fov[:, 1], h)
        intr = jnp.zeros((b, 3, 3), jnp.float32)
        intr = intr.at[:, 0, 0].set(fx)
        intr = intr.at[:, 1, 1].set(fy)
        intr = intr.at[:, 0, 2].set(w / 2.0)
        intr = intr.at[:, 1, 2].set(h / 2.0)
        intr = intr.at[:, 2, 2].set(1.0)

        feats = motion_feature.reshape(b, v, c, h, w)

        def per_scene(anchors, c2ws, intr_s, feat_s):
            def per_view(c2w, feat):
                return perspective_project_features(anchors, c2w, intr_s, feat)

            return jax.vmap(per_view)(c2ws, feat_s).mean(axis=0)  # (A, C)

        proj = jax.vmap(per_scene)(anchor_points, c2w_input, intr, feats)

        out = Transformer1D(
            in_channels=self.in_channels,
            num_attention_heads=self.num_attention_heads,
            attention_head_dim=self.attention_head_dim,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="conv",
        )(proj.transpose(0, 2, 1))
        return out.transpose(0, 2, 1)  # (B, A, C)
