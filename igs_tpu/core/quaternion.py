"""Quaternion math (wxyz convention, matching 3DGS).

Reference parity: build_rotation / quaternion_multiply in
/root/reference/igs/utils/general_utils.py:79-101,177-202 and the CUDA
rotation construction in cuda_rasterizer/forward.cu:270-304.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Quaternion (..., 4) in (w, x, y, z) order → rotation matrix (..., 3, 3).

    With ``normalize=False`` this matches the raster preprocess, which builds
    R from the already-activated (normalized) quaternion without
    re-normalizing (forward.cu:279 comments out the division).
    """
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, both (..., 4) wxyz.

    Matches igs/utils/general_utils.py:177-202 used by
    GaussianModel.deform for rotation residuals.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize, torch.nn.functional.normalize semantics (clamped norm).

    NaN-safe gradient at ‖q‖=0 (double-where), unlike jnp.linalg.norm.
    """
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    ok = n2 > 0
    n = jnp.sqrt(jnp.where(ok, n2, 1.0))
    return q / jnp.maximum(jnp.where(ok, n, 0.0), eps)
