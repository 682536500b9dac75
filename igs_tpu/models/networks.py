"""Small generic networks (flax.linen).

Reference parity: MLP (igs/models/networks.py:60-108), InstanceNorm
semantics of torch nn.InstanceNorm2d(affine=False) used across the GMFlow
backbone.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn


def get_activation(name: Optional[str]) -> Callable:
    if name is None or name == "none":
        return lambda x: x
    import jax

    table = {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "exp": jnp.exp,
        "softplus": jax.nn.softplus,
        "trunc_exp": lambda x: jnp.exp(jnp.minimum(x, 15.0)),
    }
    if name not in table:
        raise ValueError(f"unknown activation {name}")
    return table[name]


class MLP(nn.Module):
    """dim_in → n_neurons ×(n_hidden_layers) → dim_out with activations.

    Layer layout parity: igs/models/networks.py:60-96 (first linear + act,
    (n_hidden_layers-1) inner linear+act, final linear, optional output
    activation).
    """

    dim_in: int
    dim_out: int
    n_neurons: int
    n_hidden_layers: int
    activation: str = "relu"
    output_activation: Optional[str] = None
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        x = act(nn.Dense(self.n_neurons, use_bias=self.bias, name="layer0")(x))
        for i in range(self.n_hidden_layers - 1):
            x = act(
                nn.Dense(self.n_neurons, use_bias=self.bias, name=f"layer{i+1}")(x)
            )
        x = nn.Dense(self.dim_out, use_bias=self.bias, name="layer_out")(x)
        return get_activation(self.output_activation)(x)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False) on NCHW tensors."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, C, H, W)
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps)


class ModLN(nn.Module):
    """Modulation with adaLN (parity: igs/IGS.py:259-284).

    x: (..., D) tokens, cond: (..., mod_dim) per-token condition.
    """

    inner_dim: int
    hidden_dim: int = 128
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        h = nn.Dense(self.hidden_dim, name="mlp0")(cond)
        h = nn.silu(h)
        h = nn.Dense(self.inner_dim * 2, name="mlp2")(h)
        shift, scale = jnp.split(h, 2, axis=-1)
        normed = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        return normed * (1 + scale) + shift
