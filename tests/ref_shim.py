"""Shim to import the mounted reference's torch modules for parity tests.

The reference (/root/reference) depends on packages not installed here
(omegaconf, diffusers, icecream, kiui, plyfile, open3d, torch_cluster,
fpsample, and its CUDA rasterizer extensions). This module installs
minimal functional stand-ins into sys.modules BEFORE putting the
reference on sys.path, so the reference's *math* (the thing we test
against) runs unmodified on CPU torch.

Stub fidelity notes:
  * omegaconf.OmegaConf.structured is only used by the reference as
    ``OmegaConf.structured(fields(**cfg))`` (igs/utils/config.py:74) —
    returning the dataclass instance verbatim preserves attribute access.
  * diffusers Attention is re-implemented to the documented default
    AttnProcessor math (to_q/to_k/to_v Linear(bias=False), to_out =
    [Linear(bias=True), Dropout], softmax(QKᵀ/√d)V per head) so
    Transformer1D (igs/models/transformers.py:673-908) runs exactly.
  * torch_cluster.knn / fpsample are exact CPU equivalents (cdist top-k /
    greedy FPS) — used only where anchor parity is being tested.
  * The CUDA rasterizer bindings are import-only stubs that raise if
    called; parity tests stop before rasterization (the rasterizer has
    its own oracle-based parity suite).
"""

from __future__ import annotations

import sys
import types


REF_PATH = "/root/reference"
_installed = False


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install():
    global _installed
    if _installed:
        if REF_PATH not in sys.path:
            sys.path.insert(0, REF_PATH)
        return
    import numpy as np
    import torch
    import torch.nn as nn

    # ---------------- omegaconf ----------------
    if "omegaconf" not in sys.modules:
        om = _mod("omegaconf")

        class DictConfig(dict):
            """dict with attribute access, recursively (OmegaConf-style)."""

            def __init__(self, d=None):
                super().__init__()
                for k, v in (d or {}).items():
                    self[k] = DictConfig(v) if isinstance(v, dict) and \
                        not isinstance(v, DictConfig) else v

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        class _OmegaConf:
            @staticmethod
            def structured(x):
                # wrap dict-valued dataclass fields for attribute access
                import dataclasses
                if dataclasses.is_dataclass(x):
                    for f in dataclasses.fields(x):
                        v = getattr(x, f.name)
                        if isinstance(v, dict) and not isinstance(v, DictConfig):
                            object.__setattr__(x, f.name, DictConfig(v))
                return x

            @staticmethod
            def register_new_resolver(*a, **k):
                pass

            @staticmethod
            def create(x=None):
                return DictConfig(x or {})

            @staticmethod
            def merge(*cfgs, **kw):
                out = DictConfig()
                for c in cfgs:
                    out.update(dict(c))
                out.update(kw)
                return out

            @staticmethod
            def to_container(cfg, resolve=True):
                return dict(cfg) if isinstance(cfg, dict) else cfg

        om.OmegaConf = _OmegaConf
        om.DictConfig = DictConfig

    # ---------------- icecream ----------------
    if "icecream" not in sys.modules:
        ice = _mod("icecream")

        class _IC:
            def __call__(self, *a, **k):
                return a[0] if len(a) == 1 else a

            def disable(self):
                pass

            def enable(self):
                pass

            def configureOutput(self, *a, **k):
                pass

        ice.ic = _IC()
        ice.install = lambda: None

    # ---------------- kiui.lpips ----------------
    if "kiui" not in sys.modules:
        kiui = _mod("kiui")
        lpips_mod = _mod("kiui.lpips")

        class LPIPS(nn.Module):
            def __init__(self, net="vgg", **kw):
                super().__init__()

            def forward(self, a, b):
                return torch.zeros(())

        lpips_mod.LPIPS = LPIPS
        kiui.lpips = lpips_mod

    # ---------------- plyfile ----------------
    if "plyfile" not in sys.modules:
        ply = _mod("plyfile")

        class PlyData:
            @staticmethod
            def read(path):
                raise NotImplementedError("plyfile stub: no file IO in tests")

        class PlyElement:
            @staticmethod
            def describe(*a, **k):
                raise NotImplementedError

        ply.PlyData = PlyData
        ply.PlyElement = PlyElement

    # ---------------- open3d ----------------
    if "open3d" not in sys.modules:
        _mod("open3d")

    # ---------------- torch_cluster ----------------
    if "torch_cluster" not in sys.modules:
        tc = _mod("torch_cluster")

        def knn(x, y, k, batch_x=None, batch_y=None):
            """For each row of y, k nearest rows of x (same batch only).

            Returns (2, len(y)*k): row = y indices, col = x indices —
            torch_cluster.knn edge-index convention used at
            igs/models/gs.py:1004.
            """
            if batch_x is None:
                batch_x = torch.zeros(x.shape[0], dtype=torch.long)
            if batch_y is None:
                batch_y = torch.zeros(y.shape[0], dtype=torch.long)
            rows, cols = [], []
            for b in torch.unique(batch_y):
                xi = torch.nonzero(batch_x == b).flatten()
                yi = torch.nonzero(batch_y == b).flatten()
                d = torch.cdist(y[yi], x[xi])
                idx = d.topk(k, dim=1, largest=False).indices  # (len(yi), k)
                rows.append(yi.repeat_interleave(k))
                cols.append(xi[idx.reshape(-1)])
            return torch.stack([torch.cat(rows), torch.cat(cols)], dim=0)

        def fps(x, batch=None, ratio=0.5, random_start=False):
            raise NotImplementedError("torch_cluster.fps stub (unused path)")

        tc.knn = knn
        tc.fps = fps

    # ---------------- fpsample ----------------
    if "fpsample" not in sys.modules:
        fp = _mod("fpsample")

        def bucket_fps_kdline_sampling(pc, n_samples, h=5):
            """Greedy farthest-point sampling (exact, O(N·n))."""
            pc = np.asarray(pc, np.float64)
            n = pc.shape[0]
            n_samples = min(n_samples, n)
            sel = np.empty(n_samples, np.int64)
            sel[0] = 0
            dist = np.linalg.norm(pc - pc[0], axis=1)
            for i in range(1, n_samples):
                sel[i] = int(np.argmax(dist))
                dist = np.minimum(dist, np.linalg.norm(pc - pc[sel[i]], axis=1))
            return sel

        fp.bucket_fps_kdline_sampling = bucket_fps_kdline_sampling

    # ---------------- diffusers ----------------
    if "diffusers" not in sys.modules:
        dif = _mod("diffusers")
        utils = _mod("diffusers.utils")
        torch_utils = _mod("diffusers.utils.torch_utils")
        models = _mod("diffusers.models")
        activations = _mod("diffusers.models.activations")
        attn_proc = _mod("diffusers.models.attention_processor")
        embeds = _mod("diffusers.models.embeddings")
        dif.utils = utils
        dif.models = models
        utils.torch_utils = torch_utils
        models.activations = activations
        models.attention_processor = attn_proc
        models.embeddings = embeds

        torch_utils.maybe_allow_in_graph = lambda cls: cls

        def get_activation(name):
            return {
                "silu": nn.SiLU(), "swish": nn.SiLU(), "relu": nn.ReLU(),
                "gelu": nn.GELU(), "mish": nn.Mish(),
            }[name]

        activations.get_activation = get_activation

        class Attention(nn.Module):
            """diffusers Attention, default-processor math only."""

            def __init__(self, query_dim, heads=8, dim_head=64, dropout=0.0,
                         bias=False, cross_attention_dim=None,
                         upcast_attention=False, out_bias=True, **kw):
                super().__init__()
                inner = heads * dim_head
                self.heads = heads
                self.scale = dim_head ** -0.5
                kv = cross_attention_dim if cross_attention_dim is not None \
                    else query_dim
                self.to_q = nn.Linear(query_dim, inner, bias=bias)
                self.to_k = nn.Linear(kv, inner, bias=bias)
                self.to_v = nn.Linear(kv, inner, bias=bias)
                self.to_out = nn.ModuleList(
                    [nn.Linear(inner, query_dim, bias=out_bias),
                     nn.Dropout(dropout)]
                )

            def forward(self, hidden_states, encoder_hidden_states=None,
                        attention_mask=None, **kw):
                ctx = (encoder_hidden_states
                       if encoder_hidden_states is not None else hidden_states)
                q = self.to_q(hidden_states)
                k = self.to_k(ctx)
                v = self.to_v(ctx)
                b, n, _ = q.shape
                hd = q.shape[-1] // self.heads

                def split(t):
                    return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

                q, k, v = split(q), split(k), split(v)
                scores = q @ k.transpose(-1, -2) * self.scale
                if attention_mask is not None:
                    scores = scores + attention_mask
                attn = scores.softmax(dim=-1)
                out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
                return self.to_out[1](self.to_out[0](out))

        attn_proc.Attention = Attention

        class CombinedTimestepLabelEmbeddings(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
                raise NotImplementedError(
                    "ada_norm_zero path unused by IGS configs")

        embeds.CombinedTimestepLabelEmbeddings = CombinedTimestepLabelEmbeddings

    # ---------------- torchvision (vgg16 features only) ----------------
    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        tvm = _mod("torchvision.models")
        tv.models = tvm

        _VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                      512, 512, 512, "M", 512, 512, 512, "M"]

        class _VGG(nn.Module):
            def __init__(self):
                super().__init__()
                layers = []
                in_c = 3
                for v in _VGG16_CFG:
                    if v == "M":
                        layers.append(nn.MaxPool2d(2, 2))
                    else:
                        layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                        layers.append(nn.ReLU(inplace=True))
                        in_c = v
                self.features = nn.Sequential(*layers)

        class _W:  # weights enum stand-in
            IMAGENET1K_V1 = None

        tvm.vgg16 = lambda weights=None, **k: _VGG()
        tvm.VGG16_Weights = _W

        def _unavailable(*a, **k):
            raise NotImplementedError(
                "torchvision stub provides vgg16 only")

        tvm.alexnet = _unavailable
        tvm.squeezenet1_1 = _unavailable

    # ---------------- CUDA rasterizer extensions ----------------
    for ext in ("diff_gaussian_rasterization_rade",
                "diff_gaussian_rasterization_rade_clamp",
                "diff_gaussian_rasterization_compress"):
        if ext in sys.modules:
            continue
        m = _mod(ext)

        class GaussianRasterizationSettings:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        class GaussianRasterizer(nn.Module):
            def __init__(self, raster_settings=None):
                super().__init__()
                self.raster_settings = raster_settings

            def forward(self, *a, **k):
                raise NotImplementedError(
                    "CUDA rasterizer unavailable; parity tests stop "
                    "before rasterization")

        m.GaussianRasterizationSettings = GaussianRasterizationSettings
        m.GaussianRasterizer = GaussianRasterizer

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _installed = True
