"""UniMatch/GMFlow backbone in backbone mode (frozen feature extractor).

Reference parity: UniMatch with as_backbone=True
(igs/models/unimatch/unimatch.py:43-188): ImageNet-normalize → shared
CNNEncoder over the (cur, next) pair stacked along batch →
feature_add_position (sine PE in split windows) → 6-layer FeatureTransformer
→ (feature0, feature1) at 1/8 resolution, C=128.

The flow-estimation tail of GMFlow (correlation softmax, SelfAttnPropagation,
convex upsampling, refinement — unimatch.py:189+) is NOT used by IGS
(as_backbone returns early at unimatch.py:187-188) and is not rebuilt.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from igs_tpu.models.backbone import CNNEncoder
from igs_tpu.models.swin import FeatureTransformer, feature_add_position

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_img(img0, img1):
    """Parity: utils.py:23-31 — inputs in [0, 255].

    Constants follow the input dtype so bf16 mixed-precision inputs stay
    bf16 (an f32 constant would silently re-promote the whole network)."""
    mean = jnp.asarray(IMAGENET_MEAN, img0.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, img0.dtype).reshape(1, 3, 1, 1)
    return (img0 / 255.0 - mean) / std, (img1 / 255.0 - mean) / std


class UniMatch(nn.Module):
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits: int = 2
    cnn_dtype: object = None  # bf16 compute for the CNN encoder (HBM-bound)
    ft_dtype: object = None  # bf16 compute for the transformer Dense mats

    @nn.compact
    def __call__(self, img0, img1, img0_tile: int = 1):
        """img0/img1: (B, 3, H, W) in [0, 255] → two (B, C, H/8, W/8).

        ``img0_tile > 1``: img0 holds only B/img0_tile unique images whose
        CNN features are computed once and tiled back to B — the streaming
        window's candidates all share the key frame as ``cur``
        (infer_data pairs json: one cur_frame per window), so the
        reference recomputes identical CNN features eval_batch_size times
        (IGS.py:123). Numerically identical (per-image InstanceNorm, no
        cross-batch coupling); the transformer still runs per pair.
        """
        img0, img1 = normalize_img(img0, img1)
        concat = jnp.concatenate([img0, img1], axis=0)
        feats = CNNEncoder(self.feature_channels, dtype=self.cnn_dtype,
                           name="backbone")(concat)
        n0 = img0.shape[0]
        feature0, feature1 = feats[:n0], feats[n0:]
        if img0_tile > 1:
            feature0 = jnp.tile(feature0, (img0_tile, 1, 1, 1))
        feature0, feature1 = feature_add_position(
            feature0, feature1, self.attn_splits, self.feature_channels
        )
        feature0, feature1 = FeatureTransformer(
            num_layers=self.num_transformer_layers,
            d_model=self.feature_channels,
            ffn_dim_expansion=self.ffn_dim_expansion,
            dtype=self.ft_dtype,
            name="transformer",
        )(feature0, feature1, attn_num_splits=self.attn_splits)
        return feature0, feature1
