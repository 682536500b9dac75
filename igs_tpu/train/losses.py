"""Training losses: L1, SSIM (3DGS flavor), PSNR, quaternion loss.

Reference parity: igs/utils/loss_utils.py:17-73 — SSIM uses an 11×11
gaussian window (σ=1.5), SAME zero-padding, C1=0.01², C2=0.03² on [0,1]
images. The LPIPS slot (kiui.lpips in main.py:216-219) is exposed as a
pluggable callable; a conv-feature LPIPS can be dropped in when torchvision
weights are available offline.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt):
    return -10.0 * jnp.log10(jnp.mean((pred - gt) ** 2))


@lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
            for x in range(window_size)
        ],
        np.float32,
    )
    g /= g.sum()
    return np.outer(g, g)


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """img1/img2: (..., C, H, W). Returns (mean, map) like the reference."""
    win2d = _gaussian_window(window_size, 1.5)
    # the window is an outer product g gᵀ — run it separably (11×1 then
    # 1×11): ~5× fewer MACs, same values
    g1d = jnp.asarray(win2d[:, window_size // 2])
    g1d = g1d / jnp.sum(g1d)
    pad = window_size // 2

    lead = img1.shape[:-2]
    h, w = img1.shape[-2:]

    def blur(x):
        # precision=HIGHEST: TPU convs default to bf16 inputs, and the
        # σ² = blur(x²) − μ² cancellation at bf16 (~1e-3 abs error)
        # swamps the C2=9e-4 stabilizer — the SSIM map then blows past
        # ±1 and 1−SSIM goes NEGATIVE, poisoning the training loss
        # (found when the 256² convergence run collapsed; CPU was fine).
        x = x.reshape(-1, 1, h, w)
        y = jax.lax.conv_general_dilated(
            x, g1d[:, None][None, None],
            window_strides=(1, 1),
            padding=[(pad, pad), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        y = jax.lax.conv_general_dilated(
            y, g1d[None, :][None, None],
            window_strides=(1, 1),
            padding=[(0, 0), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.reshape(*lead, h, w)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map), ssim_map
    return jnp.mean(ssim_map, axis=(-3, -2, -1))


def quaternion_loss(q1, q2):
    """Parity: loss_utils.py:65-73."""
    num = jnp.sum(q1 * q2, axis=1)
    den = jnp.linalg.norm(q1, axis=1) * jnp.linalg.norm(q2, axis=1)
    cos = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 0.0)
    cos = jnp.clip(cos, -1 + 1e-7, 1 - 1e-7)
    return 1 - jnp.mean(cos**2)


def rgb_ssim_loss(pred, gt, lambda_l1: float = 0.8):
    """The key-frame refine loss (infer_batch.py:302-306):
    λ·L1 + (1−λ)·(1−SSIM)."""
    s, _ = ssim(pred, gt)
    return lambda_l1 * l1_loss(pred, gt) + (1 - lambda_l1) * (1.0 - s)
