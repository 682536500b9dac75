"""Bilinear grid sampling (torch F.grid_sample parity).

Used by the anchor-feature projection (igs/utils/ops.py:444-477 calls
F.grid_sample(align_corners=False, padding_mode='zeros')). Gathers are
XLA-native; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_points(
    features: jnp.ndarray,  # (C, H, W)
    coords: jnp.ndarray,  # (N, 2) normalized [-1, 1] (x, y)
) -> jnp.ndarray:
    """Sample features at N points; zeros outside. Returns (N, C)."""
    c, h, w = features.shape
    # align_corners=False unnormalization: ((g + 1) * size - 1) / 2
    x = ((coords[:, 0] + 1.0) * w - 1.0) * 0.5
    y = ((coords[:, 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi, weight):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = features[:, yi_c, xi_c]  # (C, N)
        # weights follow the feature dtype (bf16-safe; f32 would promote)
        return vals * (weight * inside)[None, :].astype(vals.dtype)

    out = (
        tap(x0, y0, (1 - wx) * (1 - wy))
        + tap(x0 + 1, y0, wx * (1 - wy))
        + tap(x0, y0 + 1, (1 - wx) * wy)
        + tap(x0 + 1, y0 + 1, wx * wy)
    )
    return out.T  # (N, C)


def perspective_project_features(
    points: jnp.ndarray,  # (N, 3) world
    c2w: jnp.ndarray,  # (4, 4)
    intrinsics: jnp.ndarray,  # (3, 3)
    features: jnp.ndarray,  # (C, H, W)
) -> jnp.ndarray:
    """Project points into a view and sample its feature map → (N, C).

    Parity: perspective_projection (igs/utils/ops.py:444-477): w2c = inv(c2w),
    image coords normalized by 2·u/W − 1 (align_corners=False convention).
    """
    _, h, w = features.shape
    w2c = jnp.linalg.inv(c2w)
    pc = points @ w2c[:3, :3].T + w2c[:3, 3]
    pi = pc @ intrinsics.T
    z = pi[:, 2:3]
    uv = pi[:, :2] / z  # (reference divides without an eps)
    gx = 2.0 * uv[:, 0] / w - 1.0
    gy = 2.0 * uv[:, 1] / h - 1.0
    return grid_sample_points(features, jnp.stack([gx, gy], -1))
