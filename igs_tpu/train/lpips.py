"""LPIPS perceptual metric (VGG16 backbone) in flax.

Reference parity: lpipsPyTorch/ (modules/lpips.py, modules/networks.py) and
the kiui.lpips VGG LPIPS used in training (main.py:216-219): ImageNet-
normalized inputs, 5 VGG feature stages, unit-normalize channels, 1×1
linear heads, spatial mean, sum over stages.

Weights: converted from a torch LPIPS checkpoint when available
(``load_torch_lpips``); without pretrained weights the metric is
initialized randomly and ``available`` is False — training configs default
to lambda_lpips=0 (configs/train.yaml) so this only gates the optional
loss/metric, matching the reference's optional usage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_STAGE_ENDS = (1, 3, 6, 9, 12)  # conv indices after which features are taken
_STAGE_CH = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, 3, H, W) normalized
        x = x.transpose(0, 2, 3, 1)
        feats = []
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if conv_i in _STAGE_ENDS:
                    feats.append(x.transpose(0, 3, 1, 2))
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, x, y):  # (B, 3, H, W) in [-1, 1]
        mean = jnp.asarray([-0.030, -0.088, -0.188]).reshape(1, 3, 1, 1)
        std = jnp.asarray([0.458, 0.448, 0.450]).reshape(1, 3, 1, 1)
        x = (x - mean) / std
        y = (y - mean) / std
        vgg = VGG16Features(name="vgg")
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # normalize_activation (lpipsPyTorch/modules/utils.py:6-8):
            # eps added to the norm, not under the sqrt
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2  # (B, C, H, W)
            lin = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}",
                kernel_init=nn.initializers.ones,
            )
            w = lin(d.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def load_torch_lpips(params, torch_state: dict):
    """Overlay a torch lpips state_dict (net.slice* / lin*) onto params."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    loaded = 0
    conv_i = 0
    # torch lpips keys: richzhang net.sliceN.M.weight, or lpipsPyTorch
    # net.layers.N.weight (torchvision features indexing)
    torch_convs = sorted(
        (k for k in torch_state if k.endswith(".weight") and "slice" in k),
        key=lambda k: (int(k.split("slice")[1].split(".")[0]),
                       int(k.split(".")[2])),
    )
    if not torch_convs:
        torch_convs = sorted(
            (k for k in torch_state
             if k.endswith(".weight") and ".layers." in k
             and np.asarray(torch_state[k]).ndim == 4),
            key=lambda k: int(k.split(".layers.")[1].split(".")[0]),
        )
    for k in torch_convs:
        w = np.asarray(torch_state[k])
        if w.ndim != 4:
            continue
        path = ("params", "vgg", f"conv{conv_i}", "kernel")
        if path in flat and flat[path].shape == w.transpose(2, 3, 1, 0).shape:
            flat[path] = jnp.asarray(w.transpose(2, 3, 1, 0))
            bk = k[:-len("weight")] + "bias"
            bpath = ("params", "vgg", f"conv{conv_i}", "bias")
            if bk in torch_state and bpath in flat:
                flat[bpath] = jnp.asarray(np.asarray(torch_state[bk]))
            loaded += 1
            conv_i += 1
    for i in range(5):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight",
                    f"lin.{i}.1.weight"):
            if key in torch_state:
                w = np.asarray(torch_state[key])  # (1, C, 1, 1)
                path = ("params", f"lin{i}", "kernel")
                if path in flat:
                    flat[path] = jnp.asarray(w.transpose(2, 3, 1, 0))
                    loaded += 1
                break
    return flax.traverse_util.unflatten_dict(flat), loaded


def make_lpips(weights_path: Optional[str] = None):
    """Returns (fn(x, y) → (B,) lpips, available: bool)."""
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    available = False
    if weights_path:
        import os

        if os.path.exists(weights_path):
            from igs_tpu.models.torch_convert import load_torch_file

            params, loaded = load_torch_lpips(
                params, load_torch_file(weights_path))
            available = loaded > 10
    fn = jax.jit(lambda x, y: model.apply(params, x, y))
    return fn, available
