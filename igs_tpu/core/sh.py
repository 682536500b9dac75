"""Real spherical harmonics — color evaluation for Gaussian splats.

Reference parity: computeColorFromSH (cuda_rasterizer/forward.cu:23-74),
SH constants (cuda_rasterizer/auxiliary.h:35-52), eval_sh / RGB2SH
(igs/utils/sh_utils.py:57-117), rsh_cart_3 (igs/IGS.py:297-344).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_basis(dirs: jnp.ndarray, deg: int) -> jnp.ndarray:
    """SH basis values for unit directions (..., 3) → (..., (deg+1)²).

    Basis ordering and signs follow the 3DGS convention of
    computeColorFromSH (forward.cu:33-62): note SH_C1 terms are
    (-y, +z, -x).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, SH_C0, dtype=dirs.dtype)]
    if deg > 0:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if deg > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh_color(
    shs: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray, deg: int = 3
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SH → RGB exactly as the rasterizer's preprocess.

    shs: (N, M, 3) coefficients (M ≥ (deg+1)²), means (N, 3), campos (3,).
    Returns (color (N,3) clamped ≥ 0, clamped mask (N,3) bool). The clamp
    mask is what the CUDA backward uses to zero gradients of clamped
    channels (forward.cu:68-73); under JAX AD the ReLU VJP does the same.
    """
    from igs_tpu.utils.safe_math import safe_normalize

    dirs = safe_normalize(means - campos[None, :])
    basis = sh_basis(dirs, deg)  # (N, K)
    k = basis.shape[-1]
    result = jnp.einsum("nk,nkc->nc", basis, shs[:, :k, :]) + 0.5
    return jnp.maximum(result, 0.0), result < 0.0


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term (igs/utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / SH_C0


def rsh_cart_3(xyz: jnp.ndarray) -> jnp.ndarray:
    """All real SH up to degree 3, torch-spherical-harmonics ordering.

    Parity with igs/IGS.py:297-344 (used for plucker-ray conditioning when
    local_ray=False).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    x2, y2, z2 = x**2, y**2, z**2
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.full(x.shape, 0.282094791773878, dtype=xyz.dtype),
            -0.48860251190292 * y,
            0.48860251190292 * z,
            -0.48860251190292 * x,
            1.09254843059208 * xy,
            -1.09254843059208 * yz,
            0.94617469575756 * z2 - 0.31539156525252,
            -1.09254843059208 * xz,
            0.54627421529604 * x2 - 0.54627421529604 * y2,
            -0.590043589926644 * y * (3.0 * x2 - y2),
            2.89061144264055 * xy * z,
            0.304697199642977 * y * (1.5 - 7.5 * z2),
            1.24392110863372 * z * (1.5 * z2 - 0.5) - 0.497568443453487 * z,
            0.304697199642977 * x * (1.5 - 7.5 * z2),
            1.44530572132028 * z * (x2 - y2),
            -0.590043589926644 * x * (x2 - 3.0 * y2),
        ],
        -1,
    )
