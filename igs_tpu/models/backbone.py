"""GMFlow CNN encoder (flax) — 1/8-resolution feature extractor.

Reference parity: CNNEncoder / ResidualBlock
(igs/models/unimatch/backbone.py:6-122): 7×7 s2 conv → 3 residual stages
(strides 1, 2, 2) → 1×1 conv to 128ch; InstanceNorm (affine-free), ReLU.

Data layout: NCHW at the API boundary (matching the reference tensors and
the torch checkpoint conversion); internally everything runs NHWC — the
TPU-native conv layout — with exactly ONE transpose at entry and exit
(per-conv transposes were the dominant cost of the original port).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class _Conv(nn.Module):
    """NHWC conv with torch-style padding; param tree shape-compatible
    with the previous NCHW wrapper (inner module named 'conv')."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class _InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # NHWC
        # statistics ALWAYS in f32 — a 64k-element bf16 mean/var loses
        # ~2 decimal digits; output returns to the input compute dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # NHWC
        y = x
        y = nn.relu(
            _InstanceNorm()(
                _Conv(
                    self.planes, 3, stride=self.stride,
                    padding=self.dilation, dilation=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv1",
                )(y)
            )
        )
        y = nn.relu(
            _InstanceNorm()(
                _Conv(
                    self.planes, 3, padding=self.dilation,
                    dilation=self.dilation, use_bias=False,
                    dtype=self.dtype, name="conv2",
                )(y)
            )
        )
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _InstanceNorm()(
                _Conv(self.planes, 1, stride=self.stride,
                      dtype=self.dtype, name="downsample")(x)
            )
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    output_dim: int = 128
    # bf16 compute (params f32): the encoder is HBM-bound at 512² inputs
    # (hundreds of MB per activation pass), so halving the traffic ≈
    # doubles it; InstanceNorm statistics stay f32. Off by default —
    # enable via system.cnn_bf16 after measuring quality on real ckpts.
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # (B, 3, H, W) → (B, C, H/8, W/8)
        dims = [64, 96, 128]
        x = x.transpose(0, 2, 3, 1)  # → NHWC once
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _Conv(dims[0], 7, stride=2, padding=3, use_bias=False,
                  dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_InstanceNorm()(x))
        x = ResidualBlock(dims[0], stride=1, dtype=self.dtype, name="layer1_0")(x)
        x = ResidualBlock(dims[0], stride=1, dtype=self.dtype, name="layer1_1")(x)
        x = ResidualBlock(dims[1], stride=2, dtype=self.dtype, name="layer2_0")(x)
        x = ResidualBlock(dims[1], stride=1, dtype=self.dtype, name="layer2_1")(x)
        x = ResidualBlock(dims[2], stride=2, dtype=self.dtype, name="layer3_0")(x)
        x = ResidualBlock(dims[2], stride=1, dtype=self.dtype, name="layer3_1")(x)
        x = _Conv(self.output_dim, 1, dtype=self.dtype, name="conv2")(x)
        return x.transpose(0, 3, 1, 2).astype(jnp.float32)  # → NCHW once
