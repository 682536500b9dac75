"""Checkpoint conversion tests: torch key patterns → flax tree paths/shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.models.torch_convert import (
    convert_gmflow_checkpoint, convert_igs_checkpoint, fix_mlp_output_layer,
)
from igs_tpu.models.unimatch import UniMatch
from igs_tpu.models.swin import FeatureTransformerMy
from igs_tpu.models.transformer1d import Transformer1D


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _gmflow_state_dict(c=32, layers=1):
    """A synthetic GMFlow state_dict with the reference's key names/shapes."""
    sd = {}
    rnd = lambda *s: np.random.RandomState(0).normal(size=s).astype(np.float32)
    sd["backbone.conv1.weight"] = rnd(64, 3, 7, 7)
    dims = {1: (64, 64), 2: (96, 64), 3: (128, 96)}
    for l, (dout, din) in dims.items():
        for i in range(2):
            d_in = din if i == 0 else dout
            sd[f"backbone.layer{l}.{i}.conv1.weight"] = rnd(dout, d_in, 3, 3)
            sd[f"backbone.layer{l}.{i}.conv2.weight"] = rnd(dout, dout, 3, 3)
            if i == 0 and (l > 1):
                sd[f"backbone.layer{l}.{i}.downsample.0.weight"] = rnd(dout, d_in, 1, 1)
                sd[f"backbone.layer{l}.{i}.downsample.0.bias"] = rnd(dout)
    sd["backbone.conv2.weight"] = rnd(c, 128, 1, 1)
    sd["backbone.conv2.bias"] = rnd(c)
    for n in range(layers):
        for blk in ("self_attn", "cross_attn_ffn"):
            base = f"transformer.layers.{n}.{blk}"
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                sd[f"{base}.{p}.weight"] = rnd(c, c)
            sd[f"{base}.norm1.weight"] = rnd(c)
            sd[f"{base}.norm1.bias"] = rnd(c)
            if blk == "cross_attn_ffn":
                sd[f"{base}.mlp.0.weight"] = rnd(2 * c * 4, 2 * c)
                sd[f"{base}.mlp.2.weight"] = rnd(c, 2 * c * 4)
                sd[f"{base}.norm2.weight"] = rnd(c)
                sd[f"{base}.norm2.bias"] = rnd(c)
    return sd


def test_gmflow_conversion_covers_unimatch_tree():
    model = UniMatch(feature_channels=32, num_transformer_layers=1)
    img = jnp.ones((1, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(0), img, img)["params"]

    sd = _gmflow_state_dict(c=32, layers=1)
    converted = convert_gmflow_checkpoint(sd)
    assert converted["unmapped"] == []

    want = _flatten(params)
    got = _flatten(converted["params"])
    missing = [k for k in want if k not in got]
    assert missing == [], f"missing {missing[:5]}"
    for k, shape in got.items():
        assert k in want, f"extra {k}"
        assert want[k] == shape, (k, want[k], shape)


def test_igs_conversion_transformer1d():
    m = Transformer1D(in_channels=64, num_attention_heads=4,
                      attention_head_dim=16, num_layers=1)
    x = jnp.ones((1, 64, 16))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    rnd = lambda *s: np.zeros(s, np.float32)
    inner = 64
    sd = {
        "triplane_encoder.conv.norm.weight": rnd(64),
        "triplane_encoder.conv.norm.bias": rnd(64),
        "triplane_encoder.conv.proj_in.weight": rnd(inner, 64),
        "triplane_encoder.conv.proj_in.bias": rnd(inner),
        "triplane_encoder.conv.proj_out.weight": rnd(64, inner),
        "triplane_encoder.conv.proj_out.bias": rnd(64),
    }
    for p in ("to_q", "to_k", "to_v"):
        sd[f"triplane_encoder.conv.transformer_blocks.0.attn1.{p}.weight"] = rnd(inner, inner)
    sd["triplane_encoder.conv.transformer_blocks.0.attn1.to_out.0.weight"] = rnd(inner, inner)
    sd["triplane_encoder.conv.transformer_blocks.0.attn1.to_out.0.bias"] = rnd(inner)
    for n in ("norm1", "norm3"):
        sd[f"triplane_encoder.conv.transformer_blocks.0.{n}.weight"] = rnd(inner)
        sd[f"triplane_encoder.conv.transformer_blocks.0.{n}.bias"] = rnd(inner)
    sd["triplane_encoder.conv.transformer_blocks.0.ff.net.0.proj.weight"] = rnd(inner * 8, inner)
    sd["triplane_encoder.conv.transformer_blocks.0.ff.net.0.proj.bias"] = rnd(inner * 8)
    sd["triplane_encoder.conv.transformer_blocks.0.ff.net.2.weight"] = rnd(inner, inner * 4)
    sd["triplane_encoder.conv.transformer_blocks.0.ff.net.2.bias"] = rnd(inner)

    converted = convert_igs_checkpoint(sd)
    assert converted["unmapped"] == []
    got = _flatten(converted["params"]["triplane_encoder"]["conv"])
    want = _flatten(params)
    missing = [k for k in want if k not in got]
    assert missing == [], missing
    for k in got:
        assert want[k] == got[k], (k, want[k], got[k])


def test_igs_conversion_decoder_heads():
    sd = {
        "render.mlp_net.layers.0.weight": np.zeros((64, 64), np.float32),
        "render.mlp_net.layers.0.bias": np.zeros(64, np.float32),
        "render.mlp_net.layers.2.weight": np.zeros((64, 64), np.float32),
        "render.mlp_net.layers.2.bias": np.zeros(64, np.float32),
        "render.mlp_net.layers.4.weight": np.zeros((64, 64), np.float32),
        "render.mlp_net.layers.4.bias": np.zeros(64, np.float32),
        "render.out_layers.0.weight": np.zeros((3, 64), np.float32),
        "render.out_layers.0.bias": np.zeros(3, np.float32),
        "render.out_layers.1.weight": np.zeros((4, 64), np.float32),
        "render.out_layers.1.bias": np.zeros(4, np.float32),
    }
    converted = convert_igs_checkpoint(sd)
    assert converted["unmapped"] == []
    p = fix_mlp_output_layer(converted["params"])
    mlp = p["render"]["mlp_net"]
    assert set(mlp) == {"layer0", "layer1", "layer_out"}
    assert "head_xyz" in p["render"] and "head_rotation" in p["render"]
