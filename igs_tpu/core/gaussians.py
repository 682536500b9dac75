"""The streamed Gaussian-splat representation as an immutable JAX pytree.

Reference parity: GaussianModel NamedTuple (igs/models/gs.py:199-398),
3D-filter fusion (igs/models/gs.py:480-490), deform (gs.py:347-375).

TPU-first design: arrays are FIXED CAPACITY. A boolean ``valid`` field marks
live rows; densification/pruning re-pad instead of reallocating so every
jitted graph keeps static shapes. ``mask`` is the dynamic-region (in-bbox)
mask used by AGM-Net deformation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from igs_tpu.core.quaternion import quat_multiply, quat_normalize


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@struct.dataclass
class Gaussians:
    """Raw (pre-activation) Gaussian parameters.

    xyz:      (N, 3)  world positions
    opacity:  (N, 1)  logit; activation sigmoid
    rotation: (N, 4)  quaternion wxyz; activation L2-normalize
    scaling:  (N, 3)  log-scale; activation exp
    shs:      (N, 16, 3) SH coefficients (deg ≤ 3)
    valid:    (N,)    live-row mask (padding rows are dead)
    mask:     (N,)    optional dynamic-region mask (in bounding box)
    resi_xyz / resi_rotation: residuals of the last deform (for flow render)
    """

    xyz: jnp.ndarray
    opacity: jnp.ndarray
    rotation: jnp.ndarray
    scaling: jnp.ndarray
    shs: jnp.ndarray
    valid: jnp.ndarray
    mask: Optional[jnp.ndarray] = None
    resi_xyz: Optional[jnp.ndarray] = None
    resi_rotation: Optional[jnp.ndarray] = None

    # -- activations (parity: gs.py:229-261) ------------------------------
    @property
    def get_scaling(self):
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self):
        return quat_normalize(self.rotation)

    @property
    def get_xyz(self):
        return self.xyz

    @property
    def get_opacity(self):
        op = jax.nn.sigmoid(self.opacity)
        # dead padding rows must never contribute
        return jnp.where(self.valid[:, None], op, 0.0)

    @property
    def get_features(self):
        return self.shs

    @property
    def num_capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @property
    def get_bounding_box(self):
        big = jnp.float32(1e30)
        v = self.valid[:, None]
        lo = jnp.min(jnp.where(v, self.xyz, big), axis=0)
        hi = jnp.max(jnp.where(v, self.xyz, -big), axis=0)
        return jnp.stack([lo, hi], axis=0)

    # -- deformation (parity: gs.py:347-375) ------------------------------
    def deform(
        self,
        res_xyz: jnp.ndarray,
        res_rotation: Optional[jnp.ndarray] = None,
        res_shs: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> "Gaussians":
        """Apply dense per-Gaussian residuals gated by ``mask``.

        The reference scatters residuals of the masked subset
        (gs.py:362-374); on TPU we keep residuals dense (N, ·) and gate by
        the boolean mask — identical result, static shapes.
        """
        if mask is None:
            mask = jnp.ones(self.xyz.shape[0], dtype=bool)
        m = mask[:, None]
        new = {"mask": mask, "resi_xyz": jnp.where(m, res_xyz, 0.0)}
        new["xyz"] = jnp.where(m, self.xyz + res_xyz, self.xyz)
        if res_rotation is not None:
            rot = quat_multiply(self.rotation, res_rotation)
            new["rotation"] = jnp.where(m, rot, self.rotation)
            new["resi_rotation"] = jnp.where(m, res_rotation, 0.0)
        if res_shs is not None:
            shs = self.shs + res_shs.reshape(-1, 16, 3)
            new["shs"] = jnp.where(mask[:, None, None], shs, self.shs)
        return self.replace(**new)

    def lbs_deform(
        self,
        new_xyz: jnp.ndarray,
        new_rotation: jnp.ndarray,
        d_rotation: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> "Gaussians":
        """Rigid-transform deformation mode (parity: gs.py:377-398)."""
        if mask is None:
            mask = jnp.ones(self.xyz.shape[0], dtype=bool)
        m = mask[:, None]
        return self.replace(
            xyz=jnp.where(m, new_xyz, self.xyz),
            rotation=jnp.where(m, new_rotation, self.rotation),
            resi_xyz=jnp.where(m, new_xyz - self.xyz, 0.0),
            resi_rotation=jnp.where(m, d_rotation, 0.0),
            mask=mask,
        )

    # -- construction ------------------------------------------------------
    @classmethod
    def create(cls, xyz, opacity, rotation, scaling, shs, valid=None) -> "Gaussians":
        xyz = jnp.asarray(xyz, jnp.float32)
        if valid is None:
            valid = jnp.ones(xyz.shape[0], dtype=bool)
        return cls(
            xyz=xyz,
            opacity=jnp.asarray(opacity, jnp.float32).reshape(xyz.shape[0], 1),
            rotation=jnp.asarray(rotation, jnp.float32),
            scaling=jnp.asarray(scaling, jnp.float32),
            shs=jnp.asarray(shs, jnp.float32),
            valid=valid,
        )

    def pad_to(self, capacity: int) -> "Gaussians":
        """Grow arrays to ``capacity`` with dead rows (for densify budget)."""
        n = self.num_capacity
        if capacity < n:
            raise ValueError(f"capacity {capacity} < current {n}")
        if capacity == n:
            return self
        extra = capacity - n

        def pad(x):
            if x is None:
                return None
            pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        return Gaussians(
            xyz=pad(self.xyz),
            # keep padded rows numerically tame: opacity logit ≈ -10 → σ≈0
            opacity=jnp.concatenate(
                [self.opacity, jnp.full((extra, 1), -10.0, jnp.float32)]
            ),
            rotation=jnp.concatenate(
                [
                    self.rotation,
                    jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (extra, 1)),
                ]
            ),
            scaling=jnp.concatenate(
                [self.scaling, jnp.full((extra, 3), -10.0, jnp.float32)]
            ),
            shs=pad(self.shs),
            valid=jnp.concatenate([self.valid, jnp.zeros(extra, dtype=bool)]),
            mask=pad(self.mask),
            resi_xyz=pad(self.resi_xyz),
            resi_rotation=pad(self.resi_rotation),
        )


def fuse_3d_filter(
    scaling: jnp.ndarray, opacity: jnp.ndarray, filter_3d: jnp.ndarray
):
    """Fuse the RaDe-GS 3D smoothing filter into scale/opacity.

    Parity: get_scaling_n_opacity_with_3D_filter (igs/models/gs.py:480-490).
    Inputs are raw (log-scale, logit-opacity); returns ACTIVATED
    (scales, opacity).
    """
    opacity = jax.nn.sigmoid(opacity)
    scales = jnp.exp(scaling)
    scales_sq = jnp.square(scales)
    det1 = jnp.prod(scales_sq, axis=1)
    scales_after = scales_sq + jnp.square(filter_3d)
    det2 = jnp.prod(scales_after, axis=1)
    coef = jnp.sqrt(det1 / det2)
    return jnp.sqrt(scales_after), opacity * coef[..., None]


def select_points_bbox(points: jnp.ndarray, bbox: jnp.ndarray) -> jnp.ndarray:
    """Boolean in-bbox mask (N,). bbox is (2, 3) = [min, max].

    Parity: select_points_bbox (igs/utils/ops.py:402-415) — returned there
    as gathered indices; here as a mask (TPU static shapes).
    """
    ge = jnp.all(points >= bbox[0][None, :], axis=-1)
    le = jnp.all(points <= bbox[1][None, :], axis=-1)
    return ge & le
