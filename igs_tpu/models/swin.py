"""GMFlow feature transformer: shifted-window (swin) single-head attention.

Reference parity:
  * PositionEmbeddingSine     igs/models/unimatch/position.py:9-46
  * split/merge, shift masks  igs/models/unimatch/utils.py:34-133
  * window attention          igs/models/unimatch/attention.py:8-104
  * TransformerLayer/Block,
    FeatureTransformer(My)    igs/models/unimatch/transformer.py

TPU notes: window partition is pure reshape/transpose; attention is batched
matmul over (B·K², L, C) — MXU-shaped. All masks are built statically at
trace time from (h, w, splits).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0) -> np.ndarray:
    """(C, H, W) sine positional encoding, DETR-style (position.py:26-46)."""
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=2).transpose(2, 0, 1)


def _use_flash_window(window_len: int) -> bool:
    """Flash attention for window attention on real TPUs (see
    transformer1d._use_flash; IGS_TPU_NO_FLASH=1 forces the XLA path)."""
    if os.environ.get("IGS_TPU_NO_FLASH"):
        return False
    return window_len >= 256 and jax.default_backend() == "tpu"


def split_feature(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·K·K, H/K, W/K, C), utils.py:34-59 channel_last."""
    b, h, w, c = x.shape
    k = num_splits
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def merge_splits(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """Inverse of split_feature (utils.py:62-81)."""
    bkk, hk, wk, c = x.shape
    k = num_splits
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * hk, k * wk, c)


@lru_cache(maxsize=16)
def shift_window_region_ids(h: int, w: int, window_h: int, window_w: int,
                            shift_h: int, shift_w: int) -> np.ndarray:
    """(K², L) per-token region id in the ROLLED layout; only same-id
    pairs may attend (the 9-region swin boundary structure,
    utils.py:84-108)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window_h), slice(-window_h, -shift_h), slice(-shift_h, None)):
        for ws in (slice(0, -window_w), slice(-window_w, -shift_w), slice(-shift_w, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    k = w // window_w
    m = img_mask.reshape(1, h // window_h, window_h, k, window_w, 1)
    return m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_h * window_w)


def shift_window_attn_mask(h: int, w: int, window_h: int, window_w: int,
                           shift_h: int, shift_w: int) -> np.ndarray:
    """(K², L, L) additive mask, −100 across region boundaries.

    Parity: generate_shift_window_attn_mask (utils.py:84-108).
    """
    m = shift_window_region_ids(h, w, window_h, window_w, shift_h, shift_w)
    attn = m[:, None, :] - m[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


def window_attention(q, k, v, num_splits: int, h: int, w: int,
                     with_shift: bool = False) -> jnp.ndarray:
    """Single-head split-window attention (attention.py:45-104).

    q,k,v: (B, H·W, C) → (B, H·W, C).
    """
    b, L, c = q.shape
    assert L == h * w
    wh, ww = h // num_splits, w // num_splits
    sh, sw = wh // 2, ww // 2

    def prep(x):
        x = x.reshape(b, h, w, c)
        if with_shift:
            x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
        x = split_feature(x, num_splits)
        return x.reshape(b * num_splits * num_splits, wh * ww, c)

    qs, ks, vs = prep(q), prep(k), prep(v)
    Lw = wh * ww
    if _use_flash_window(Lw):
        # Fused online-softmax kernel: the XLA path materializes
        # (B·K², L, L) f32 scores — ~5 GB of HBM round-trips per
        # attention at the production (320, 1024, 1024) shape, which is
        # the whole cost of the 6-layer feature transformer. The swin
        # shift mask is a segment-equality mask (attend only within the
        # same boundary region), so it maps to flash segment_ids with
        # ZERO extra traffic instead of an additive bias tensor.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)

        bq = min(512, Lw)
        bk = min(512, Lw)
        bkM = min(1024, Lw)
        bs = BlockSizes(
            block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkM,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bkM, block_k_major_dq=bkM,
        )
        seg = None
        if with_shift:
            ids = jnp.tile(
                jnp.asarray(
                    shift_window_region_ids(h, w, wh, ww, sh, sw),
                    jnp.int32,
                ),
                (b, 1),
            )  # (B·K², L)
            seg = SegmentIds(q=ids, kv=ids)
        out = flash_attention(
            qs[:, None], ks[:, None], vs[:, None], segment_ids=seg,
            sm_scale=1.0 / (c ** 0.5), block_sizes=bs)[:, 0]
        out = merge_splits(out.reshape(-1, wh, ww, c), num_splits)
        if with_shift:
            out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
        return out.reshape(b, L, c)
    scores = jnp.einsum("blc,bmc->blm", qs, ks) / (c ** 0.5)
    if with_shift:
        mask = jnp.asarray(
            shift_window_attn_mask(h, w, wh, ww, sh, sw)
        )  # (K², L, L)
        scores = scores + jnp.tile(mask, (b, 1, 1)).astype(scores.dtype)
    # softmax in f32, matmuls in the compute dtype (bf16-safe)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        vs.dtype)
    out = jnp.einsum("blm,bmc->blc", attn, vs)
    out = merge_splits(out.reshape(-1, wh, ww, c), num_splits)
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out.reshape(b, L, c)


def full_attention(q, k, v) -> jnp.ndarray:
    scores = jnp.einsum("blc,bmc->blm", q, k) / (q.shape[-1] ** 0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", attn, v)


class TransformerLayer(nn.Module):
    """q/k/v proj (no bias) → window attention → merge → norm → [FFN].

    Parity: transformer.py:11-146. The FFN input is cat(source, message).

    ``dtype``: compute dtype for the Dense matmuls (params stay f32).
    The f32 default runs every matmul as a 3-pass bf16 MXU split; with
    the frozen backbone and the reference's own fp16 inference, bf16
    single-pass is the production choice (AGMNet.ft_bf16). LayerNorms
    and the residual add stay f32.
    """

    d_model: int = 128
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, source, target, h, w, attn_num_splits=2,
                 with_shift=False):
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="q_proj")(source)
        k = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="k_proj")(target)
        v = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="v_proj")(target)
        if attn_num_splits > 1:
            message = window_attention(q, k, v, attn_num_splits, h, w,
                                       with_shift=with_shift)
        else:
            message = full_attention(q, k, v)
        message = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                           name="merge")(message)
        message = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            message.astype(jnp.float32))
        if not self.no_ffn:
            x = jnp.concatenate([source, message], axis=-1)
            x = nn.Dense(2 * self.d_model * self.ffn_dim_expansion,
                         use_bias=False, dtype=self.dtype, name="mlp0")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         name="mlp2")(x)
            message = nn.LayerNorm(epsilon=1e-5, name="norm2")(
                x.astype(jnp.float32))
        return source + message


class TransformerBlock(nn.Module):
    """self-attn (no FFN) + cross-attn+FFN (transformer.py:149-202)."""

    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, source, target, h, w, attn_num_splits=2,
                 with_shift=False):
        source = TransformerLayer(
            self.d_model, no_ffn=True,
            ffn_dim_expansion=self.ffn_dim_expansion, dtype=self.dtype,
            name="self_attn",
        )(source, source, h, w, attn_num_splits, with_shift)
        source = TransformerLayer(
            self.d_model, no_ffn=False,
            ffn_dim_expansion=self.ffn_dim_expansion, dtype=self.dtype,
            name="cross_attn_ffn",
        )(source, target, h, w, attn_num_splits, with_shift)
        return source


class FeatureTransformer(nn.Module):
    """6-layer joint self/cross transformer over (feature0, feature1).

    Parity: transformer.py:205-301 — features are concatenated along batch
    so self+cross run as one batched attention; feature1 is re-derived by
    swapping halves each layer; shift on odd layers.
    """

    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, feature0, feature1, attn_num_splits=2):
        b, c, h, w = feature0.shape
        f0 = feature0.reshape(b, c, h * w).transpose(0, 2, 1)
        f1 = feature1.reshape(b, c, h * w).transpose(0, 2, 1)
        concat0 = jnp.concatenate([f0, f1], axis=0)
        concat1 = jnp.concatenate([f1, f0], axis=0)
        for i in range(self.num_layers):
            concat0 = TransformerBlock(
                self.d_model, self.ffn_dim_expansion, dtype=self.dtype,
                name=f"layer{i}"
            )(
                concat0, concat1, h, w, attn_num_splits,
                with_shift=attn_num_splits > 1 and i % 2 == 1,
            )
            half0, half1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([half1, half0], axis=0)
        f0, f1 = jnp.split(concat0, 2, axis=0)
        f0 = f0.transpose(0, 2, 1).reshape(b, c, h, w)
        f1 = f1.transpose(0, 2, 1).reshape(b, c, h, w)
        return f0, f1


class FeatureTransformerMy(nn.Module):
    """IGS's trainable motion transformer: cross-attend f0 → f1 only.

    Parity: FeatureTransformerMy (transformer.py:303-400).
    """

    num_layers: int = 1
    d_model: int = 128
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(self, feature0, feature1, attn_num_splits=2):
        b, c, h, w = feature0.shape
        f0 = feature0.reshape(b, c, h * w).transpose(0, 2, 1)
        f1 = feature1.reshape(b, c, h * w).transpose(0, 2, 1)
        for i in range(self.num_layers):
            f0 = TransformerBlock(
                self.d_model, self.ffn_dim_expansion, name=f"layer{i}"
            )(
                f0, f1, h, w, attn_num_splits,
                with_shift=attn_num_splits > 1 and i % 2 == 1,
            )
        return f0.transpose(0, 2, 1).reshape(b, c, h, w)


def feature_add_position(feature0, feature1, attn_splits: int, channels: int):
    """Add sine PE inside each split window (utils.py:111-131)."""
    b, c, h, w = feature0.shape
    if attn_splits > 1:
        pos = jnp.asarray(
            position_embedding_sine(h // attn_splits, w // attn_splits,
                                    channels // 2)
        )[None]

        def add(f):
            fs = split_feature(f.transpose(0, 2, 3, 1), attn_splits)
            fs = fs + pos.transpose(0, 2, 3, 1).astype(f.dtype)
            return merge_splits(fs, attn_splits).transpose(0, 3, 1, 2)

        return add(feature0), add(feature1)
    pos = jnp.asarray(position_embedding_sine(h, w, channels // 2))[None]
    return (feature0 + pos.astype(feature0.dtype),
            feature1 + pos.astype(feature1.dtype))
