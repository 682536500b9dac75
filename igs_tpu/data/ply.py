"""3DGS PLY reading/writing — pure numpy, no plyfile dependency.

Reference parity: load_ply (igs/models/gs.py:400-462) including the RaDe-GS
``filter_3D`` fusion into scale/opacity, and save_ply (gs.py:317-342) with
the same attribute layout (x,y,z,nx,ny,nz,f_dc_*,f_rest_45,opacity,scale_*,
rot_*).

Binary little-endian PLY only (what RaDe-GS writes). The parse is a single
numpy structured-array view over the payload — no per-element Python loop
(this replaces the reference's plyfile dependency and is the hot path of
stream startup; a C++ mmap loader can slot in behind the same API later).
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from igs_tpu.core.gaussians import Gaussians, fuse_3d_filter, inverse_sigmoid

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def read_ply_vertices(path_or_bytes) -> np.ndarray:
    """Parse a binary_little_endian PLY's vertex element → structured array."""
    if isinstance(path_or_bytes, (str, bytes)) and not isinstance(
        path_or_bytes, bytes
    ):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    else:
        data = path_or_bytes
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii")
    lines = [l.strip() for l in header.splitlines()]
    assert lines[0] == "ply"
    fmt = [l for l in lines if l.startswith("format")][0].split()[1]
    if fmt != "binary_little_endian":
        raise ValueError(f"unsupported PLY format {fmt}")

    count = None
    props = []
    in_vertex = False
    for l in lines:
        if l.startswith("element"):
            _, name, n = l.split()
            in_vertex = name == "vertex"
            if in_vertex:
                count = int(n)
        elif l.startswith("property") and in_vertex:
            _, typ, name = l.split()
            props.append((name, _PLY_DTYPES[typ]))
    if count is None:
        raise ValueError("no vertex element")
    dtype = np.dtype(props)
    return np.frombuffer(data, dtype=dtype, count=count, offset=header_end)


def load_gaussian_ply(
    path, max_sh_degree: int = 3, fuse_filter_3d: bool = True
) -> Gaussians:
    """Load a RaDe-GS/3DGS PLY into a Gaussians pytree.

    Matches igs/models/gs.py:400-462: SH layout [dc | rest] reshaped to
    (N, 16, 3); if the file carries ``filter_3D`` it is fused into
    scale/opacity so the stream model never needs it again (SURVEY.md §3.5).
    """
    v = read_ply_vertices(path)
    names = v.dtype.names
    n = len(v)
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    opacity = np.asarray(v["opacity"], np.float32)[:, None]

    f_dc = np.stack(
        [v["f_dc_0"], v["f_dc_1"], v["f_dc_2"]], axis=1
    ).astype(np.float32)[:, None, :]  # (N, 1, 3)

    n_rest = 3 * (max_sh_degree + 1) ** 2 - 3
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    assert len(rest_names) == n_rest, (len(rest_names), n_rest)
    rest = np.stack([v[nm] for nm in rest_names], axis=1).astype(np.float32)
    # stored channel-major (3, K) flattened; → (N, K, 3)
    rest = rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    shs = np.concatenate([f_dc, rest], axis=1)  # (N, 16, 3)

    scale_names = sorted(
        (nm for nm in names if nm.startswith("scale_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    scaling = np.stack([v[nm] for nm in scale_names], axis=1).astype(np.float32)
    rot_names = sorted(
        (nm for nm in names if nm.startswith("rot")),
        key=lambda s: int(s.split("_")[-1]),
    )
    rotation = np.stack([v[nm] for nm in rot_names], axis=1).astype(np.float32)

    if fuse_filter_3d and "filter_3D" in names:
        filt = np.asarray(v["filter_3D"], np.float32)[:, None]
        scales_act, opacity_act = fuse_3d_filter(scaling, opacity, filt)
        scaling = np.log(np.asarray(scales_act))
        opacity = np.asarray(inverse_sigmoid(np.clip(opacity_act, 1e-7, 1 - 1e-7)))

    return Gaussians.create(xyz, opacity, rotation, scaling, shs)


def save_gaussian_ply(path, gaussians: Gaussians, only_valid: bool = True):
    """Write the reference PLY layout (gs.py:297-342)."""
    valid = np.asarray(gaussians.valid)
    sel = valid if only_valid else np.ones_like(valid, dtype=bool)
    xyz = np.asarray(gaussians.xyz)[sel]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    shs = np.asarray(gaussians.shs)[sel]  # (N, 16, 3)
    f_dc = shs[:, 0:1, :].transpose(0, 2, 1).reshape(n, -1)
    f_rest = shs[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    opac = np.asarray(gaussians.opacity)[sel]
    scale = np.asarray(gaussians.scaling)[sel]
    rot = np.asarray(gaussians.rotation)[sel]

    cols = ["x", "y", "z", "nx", "ny", "nz"]
    cols += [f"f_dc_{i}" for i in range(3)]
    cols += [f"f_rest_{i}" for i in range(45)]
    cols += ["opacity"] + [f"scale_{i}" for i in range(scale.shape[1])]
    cols += [f"rot_{i}" for i in range(rot.shape[1])]
    attrs = np.concatenate(
        [xyz, normals, f_dc, f_rest, opac, scale, rot], axis=1
    ).astype("<f4")

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {c}\n" for c in cols)
        + "end_header\n"
    )
    buf = io.BytesIO()
    buf.write(header.encode("ascii"))
    rec = np.rec.fromarrays(list(attrs.T), names=cols)
    buf.write(rec.tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
