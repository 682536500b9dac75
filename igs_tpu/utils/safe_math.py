"""NaN-safe math primitives for AD.

JAX AD of sqrt/norm/div at singular points produces NaN even when the
result is masked out by `where` (inf·0 in the VJP). These helpers apply the
double-where trick: the forward value is bit-identical on the valid branch
while the backward is finite everywhere. The CUDA reference never hits this
because its hand-written backward simply skips culled Gaussians
(backward.cu preprocessCUDA guards on radii > 0).
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False, eps: float = 0.0):
    """L2 norm with NaN-free gradient at 0 (returns eps there)."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    ok = n2 > 0
    n = jnp.sqrt(jnp.where(ok, n2, 1.0))
    return jnp.where(ok, n, eps)


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-30):
    """x/‖x‖ with zero output and finite gradient at ‖x‖=0."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=True)
    ok = n2 > eps * eps
    inv = 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0))
    return jnp.where(ok, x * inv, 0.0)


def safe_sqrt(x: jnp.ndarray, eps: float = 0.0):
    ok = x > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), eps)


def safe_div(num: jnp.ndarray, den: jnp.ndarray, eps: float = 1e-12):
    ok = jnp.abs(den) > eps
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)
