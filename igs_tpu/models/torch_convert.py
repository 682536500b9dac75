"""Torch checkpoint → flax parameter conversion.

Maps the reference checkpoints onto this framework's module tree:
  * GMFlow ``gmflow-scale1-…pth`` (ckpt['model']) → UniMatch params
    (configs/train.yaml system.backbone.pretrained_model_name_or_path,
    loaded at unimatch.py:64-68).
  * IGS ``pytorch_model.bin`` (trained AGM-Net) → AGMNet params
    (infer_batch.py:172-180 shape-checked partial load).

Conventions: torch Linear weight (out,in) → flax Dense kernel (in,out)ᵀ;
torch Conv2d OIHW → flax HWIO; LayerNorm/GroupNorm weight/bias →
scale/bias. Keys that fail to map are reported, mirroring the reference's
lenient shape-checked resume (main.py:131-149).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _t_linear(w):  # (out,in) → (in,out)
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):  # OIHW → HWIO
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value):
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = np.asarray(value)


def _map_cnn_encoder(key: str):
    """CNNEncoder keys (backbone.py): conv1/conv2/layerN.M.(conv1|conv2|
    downsample.0)."""
    m = re.match(r"(conv1|conv2)\.(weight|bias)$", key)
    if m:
        name, kind = m.groups()
        return ((name, "conv", "kernel" if kind == "weight" else "bias"),
                _t_conv if kind == "weight" else np.asarray)
    m = re.match(r"layer(\d)\.(\d)\.(conv1|conv2)\.(weight|bias)$", key)
    if m:
        l, i, c, kind = m.groups()
        return ((f"layer{l}_{i}", c, "conv",
                 "kernel" if kind == "weight" else "bias"),
                _t_conv if kind == "weight" else np.asarray)
    m = re.match(r"layer(\d)\.(\d)\.downsample\.0\.(weight|bias)$", key)
    if m:
        l, i, kind = m.groups()
        return ((f"layer{l}_{i}", "downsample", "conv",
                 "kernel" if kind == "weight" else "bias"),
                _t_conv if kind == "weight" else np.asarray)
    return None


def _map_transformer_layer(rest: str):
    """TransformerLayer keys: q/k/v_proj, merge, norm1/2, mlp.0/2."""
    m = re.match(r"(q_proj|k_proj|v_proj|merge)\.weight$", rest)
    if m:
        return ((m.group(1), "kernel"), _t_linear)
    m = re.match(r"norm(\d)\.(weight|bias)$", rest)
    if m:
        n, kind = m.groups()
        return ((f"norm{n}", "scale" if kind == "weight" else "bias"),
                np.asarray)
    m = re.match(r"mlp\.(0|2)\.weight$", rest)
    if m:
        return ((f"mlp{m.group(1)}", "kernel"), _t_linear)
    return None


def _map_feature_transformer(key: str):
    """FeatureTransformer(My) keys: layers.N.(self_attn|cross_attn_ffn).…"""
    m = re.match(r"layers\.(\d+)\.(self_attn|cross_attn_ffn)\.(.+)$", key)
    if not m:
        return None
    n, which, rest = m.groups()
    inner = _map_transformer_layer(rest)
    if inner is None:
        return None
    path, fn = inner
    return ((f"layer{n}", which) + path, fn)


def convert_gmflow_checkpoint(state_dict: Dict[str, Any]) -> Dict:
    """GMFlow torch state_dict → UniMatch flax params {'backbone','transformer'}."""
    out: Dict = {}
    unmapped = []
    for key, val in state_dict.items():
        if key.startswith("backbone."):
            mapped = _map_cnn_encoder(key[len("backbone."):])
            if mapped:
                path, fn = mapped
                _set(out, ("backbone",) + path, fn(val))
                continue
        if key.startswith("transformer."):
            mapped = _map_feature_transformer(key[len("transformer."):])
            if mapped:
                path, fn = mapped
                _set(out, ("transformer",) + path, fn(val))
                continue
        unmapped.append(key)
    return {"params": out, "unmapped": unmapped}


def _map_transformer1d(key: str):
    """Transformer1D keys (transformers.py:673-908) → transformer1d.py tree."""
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        return (("norm", "scale" if m.group(1) == "weight" else "bias"),
                np.asarray)
    m = re.match(r"proj_(in|out)\.(weight|bias)$", key)
    if m:
        w, kind = m.groups()
        return ((f"proj_{w}", "kernel" if kind == "weight" else "bias"),
                _t_linear if kind == "weight" else np.asarray)
    m = re.match(
        r"transformer_blocks\.(\d+)\.attn1\.(to_q|to_k|to_v)\.weight$", key)
    if m:
        return ((f"block{m.group(1)}", "attn1", m.group(2), "kernel"),
                _t_linear)
    m = re.match(
        r"transformer_blocks\.(\d+)\.attn1\.to_out\.0\.(weight|bias)$", key)
    if m:
        n, kind = m.groups()
        return ((f"block{n}", "attn1", "to_out",
                 "kernel" if kind == "weight" else "bias"),
                _t_linear if kind == "weight" else np.asarray)
    m = re.match(r"transformer_blocks\.(\d+)\.norm([13])\.(weight|bias)$", key)
    if m:
        n, which, kind = m.groups()
        return ((f"block{n}", f"norm{which}",
                 "scale" if kind == "weight" else "bias"), np.asarray)
    m = re.match(
        r"transformer_blocks\.(\d+)\.ff\.net\.0\.proj\.(weight|bias)$", key)
    if m:
        n, kind = m.groups()
        return ((f"block{n}", "ff", "proj",
                 "kernel" if kind == "weight" else "bias"),
                _t_linear if kind == "weight" else np.asarray)
    m = re.match(r"transformer_blocks\.(\d+)\.ff\.net\.2\.(weight|bias)$", key)
    if m:
        n, kind = m.groups()
        return ((f"block{n}", "ff", "out",
                 "kernel" if kind == "weight" else "bias"),
                _t_linear if kind == "weight" else np.asarray)
    return None


def convert_igs_checkpoint(state_dict: Dict[str, Any]) -> Dict:
    """Trained IGS AGM-Net state_dict → AGMNet flax params.

    The reference strips backbone keys from its checkpoints
    (IGS.py:105-111); the GMFlow weights load separately via
    convert_gmflow_checkpoint.
    """
    out: Dict = {}
    unmapped = []
    for key, val in state_dict.items():
        # motion transformer
        if key.startswith("transformer."):
            mapped = _map_feature_transformer(key[len("transformer."):])
            if mapped:
                path, fn = mapped
                _set(out, ("transformer",) + path, fn(val))
                continue
        if key.startswith("upsample."):
            kind = key.split(".")[-1]
            _set(out, ("upsample", "kernel" if kind == "weight" else "bias"),
                 _t_conv(val) if kind == "weight" else np.asarray(val))
            continue
        if key.startswith("ModLN."):
            rest = key[len("ModLN."):]
            m = re.match(r"norm\.(weight|bias)$", rest)
            if m:
                _set(out, ("ModLN", "norm",
                           "scale" if m.group(1) == "weight" else "bias"),
                     np.asarray(val))
                continue
            m = re.match(r"mlp\.(0|2)\.(weight|bias)$", rest)
            if m:
                idx, kind = m.groups()
                _set(out, ("ModLN", f"mlp{idx}",
                           "kernel" if kind == "weight" else "bias"),
                     _t_linear(val) if kind == "weight" else np.asarray(val))
                continue
        if key.startswith("triplane_encoder.conv."):
            mapped = _map_transformer1d(key[len("triplane_encoder.conv."):])
            if mapped:
                path, fn = mapped
                _set(out, ("triplane_encoder", "conv") + path, fn(val))
                continue
        if key.startswith("render.mlp_net.layers."):
            m = re.match(r"render\.mlp_net\.layers\.(\d+)\.(weight|bias)$", key)
            if m:
                idx, kind = m.groups()
                # torch Sequential: 0,2 linear+act pairs, last = output
                torch_idx = int(idx)
                n_layer = torch_idx // 2
                name = f"layer{n_layer}" if torch_idx % 2 == 0 else None
                if name is not None:
                    _set(out, ("render", "mlp_net", name,
                               "kernel" if kind == "weight" else "bias"),
                         _t_linear(val) if kind == "weight" else np.asarray(val))
                    continue
        if key.startswith("render.out_layers."):
            m = re.match(r"render\.out_layers\.(\d)\.(weight|bias)$", key)
            if m:
                idx, kind = m.groups()
                head = ["xyz", "rotation", "shs", "opacity", "scaling"][int(idx)]
                _set(out, ("render", f"head_{head}",
                           "kernel" if kind == "weight" else "bias"),
                     _t_linear(val) if kind == "weight" else np.asarray(val))
                continue
        unmapped.append(key)
    return {"params": out, "unmapped": unmapped}


def fix_mlp_output_layer(params: Dict):
    """Rename the last MLP layer: torch Sequential's final linear is at an
    even index too; our MLP names it layer_out. Call after conversion."""
    try:
        mlp = params["render"]["mlp_net"]
    except KeyError:
        return params
    if mlp:
        last = max(
            int(k[len("layer"):]) for k in mlp if re.match(r"layer\d+$", k)
        )
        mlp["layer_out"] = mlp.pop(f"layer{last}")
    return params


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a torch .pth/.bin on CPU → dict of numpy arrays."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in blob.items()}
