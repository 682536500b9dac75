"""Transformer1D over anchor tokens (diffusers-style, flax).

Reference parity: Transformer1D / BasicTransformerBlock / FeedForward(GEGLU)
(igs/models/transformers.py:137-397,400-525,673-908) in the configuration
IGS uses: layer_norm, no cross-attention, no ada-norm, geglu FF, 8 heads ×
64 dims × 4 layers over 8192 anchor tokens (configs/train.yaml
triplane_encoder.unet).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn


def _use_flash(seq_len: int) -> bool:
    """Flash attention on real TPUs for long sequences; the chunked XLA
    path elsewhere (CPU tests, tiny shapes where kernel launch overhead
    would dominate). IGS_TPU_NO_FLASH=1 forces the chunked path."""
    if os.environ.get("IGS_TPU_NO_FLASH"):
        return False
    return seq_len >= 2048 and jax.default_backend() == "tpu"


class Attention(nn.Module):
    """diffusers Attention: q/k/v Dense(no bias) → heads → out Dense(bias).

    Memory-efficient: query-chunked softmax(QKᵀ)V so the (L, L) score
    matrix never materializes — at the production 8192 anchor tokens the
    full matrix is ~10 GB and does not fit HBM (the torch reference
    materializes it; enable_memory_efficient_attention is off in its
    configs). Exact, not an approximation.

    ``dtype``: compute dtype for the projections/matmuls (params stay
    f32; softmax runs in f32). bf16 ≈ 4× on the MXU — the reference
    trains in fp16 mixed precision (configs/train.yaml mixed_precision).
    """

    heads: int = 8
    head_dim: int = 64
    q_chunk: int = 1024
    # None = follow the input dtype (mixed-precision step casts params +
    # inputs); an explicit dtype forces the compute type (encoder_bf16)
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        b, L, _ = x.shape
        inner = self.heads * self.head_dim
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def split(t):
            return t.reshape(b, L, self.heads, self.head_dim).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)  # (B, H, L, C)
        scale = self.head_dim ** -0.5

        if _use_flash(L):
            # Fused online-softmax kernel: the chunked XLA path round-trips
            # (B, H, qc, L) f32 score blocks through HBM (~1.3 GB per block
            # at L=8192) — the flash kernel keeps them in VMEM. Measured at
            # the triplane shape (5, 8, 8192, 64) on v5e: 19 ms vs 54 ms
            # chunked (tools_bench_attn.py); bf16 variants are SLOWER
            # (88-979 ms) and stay off. max|Δ| vs chunked ≈ 4e-4.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention)
            # 1024/1024/2048 blocks measured 12.0 vs 13.3 ms at the
            # (5, 8, 8192, 64) triplane shape (tools_bench_attn2.py r4);
            # 2048-row q blocks fail to compile
            bq = min(1024, L)
            bk = min(1024, L)
            bkM = min(2048, L)
            bs = BlockSizes(
                block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bkM,
                block_q_dkv=bq, block_k_dkv=bk,
                block_q_dq=bq, block_k_dq=bkM, block_k_major_dq=bkM,
            )
            out = flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)
        elif L <= self.q_chunk:
            scores = jnp.einsum(
                "bhlc,bhmc->bhlm", q, k,
                preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhlm,bhmc->bhlc", attn, v)
        else:
            nc = -(-L // self.q_chunk)
            pad = nc * self.q_chunk - L
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            qc = qp.reshape(b, self.heads, nc, self.q_chunk, self.head_dim)
            qc = qc.transpose(2, 0, 1, 3, 4)  # (nc, B, H, qc, C)

            def block(qb):  # (B, H, qc, C)
                s = jnp.einsum(
                    "bhlc,bhmc->bhlm", qb, k,
                    preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
                return jnp.einsum("bhlm,bhmc->bhlc", a, v)

            out = jax.lax.map(block, qc)  # (nc, B, H, qc, C)
            out = out.transpose(1, 2, 0, 3, 4).reshape(
                b, self.heads, nc * self.q_chunk, self.head_dim)[:, :, :L]
        out = out.transpose(0, 2, 1, 3).reshape(b, L, inner)
        return nn.Dense(
            x.shape[-1], dtype=self.dtype, name="to_out"
        )(out).astype(in_dtype)


class GEGLUFeedForward(nn.Module):
    """FeedForward with GEGLU (transformers.py:400-525), mult=4."""

    mult: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(
            dim, dtype=self.dtype, name="out")(h).astype(in_dtype)


class BasicTransformerBlock(nn.Module):
    heads: int = 8
    head_dim: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = x + Attention(
            self.heads, self.head_dim, dtype=self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class Transformer1D(nn.Module):
    """(B, C, L) → (B, C, L) with residual (transformers.py:855-908)."""

    in_channels: int = 128
    num_attention_heads: int = 8
    attention_head_dim: int = 64
    num_layers: int = 4
    norm_num_groups: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # (B, C, L)
        residual = x
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, name="norm"
        )(x.transpose(0, 2, 1)).transpose(0, 2, 1)
        h = h.transpose(0, 2, 1)  # (B, L, C)
        inner = self.num_attention_heads * self.attention_head_dim
        h = nn.Dense(inner, name="proj_in")(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.num_attention_heads, self.attention_head_dim,
                dtype=self.dtype, name=f"block{i}",
            )(h)
        h = nn.Dense(self.in_channels, name="proj_out")(h)
        return h.transpose(0, 2, 1) + residual
