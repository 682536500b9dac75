"""ctypes bindings for the native data-plane (native/igsio.cpp).

Provides threaded batch PNG decoding into NCHW float32 and a fast PLY
vertex reader. Falls back to PIL/numpy transparently when the shared
library hasn't been built (``make -C native``), so the pure-Python path
always works; callers use ``load_images_nchw`` / ``read_ply_fast`` and get
the native speedup when available.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native", "libigsio.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.igsio_load_png_batch_f32.restype = ctypes.c_int
        lib.igsio_load_png_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        lib.igsio_ply_info.restype = ctypes.c_int
        lib.igsio_ply_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.igsio_ply_read.restype = ctypes.c_int
        lib.igsio_ply_read.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def load_images_nchw(
    paths: Sequence[str], height: int, width: int, channels: int = 3,
    scale: float = 1.0 / 255.0, threads: int = 0,
) -> np.ndarray:
    """(N, C, H, W) float32 batch decode; native threads when available."""
    lib = _lib()
    n = len(paths)
    out = np.empty((n, channels, height, width), np.float32)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failed = lib.igsio_load_png_batch_f32(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            height, width, channels, ctypes.c_float(scale), threads,
        )
        if failed == 0:
            return out
    # PIL fallback (also covers non-PNG formats)
    from PIL import Image

    for i, p in enumerate(paths):
        img = np.asarray(Image.open(p))
        if img.ndim == 2:
            img = img[:, :, None]
        img = img[:, :, :channels]
        if img.shape[2] < channels:
            img = np.repeat(img, channels, axis=2)
        out[i] = img.astype(np.float32).transpose(2, 0, 1) * scale
    return out


def read_ply_fast(path: str) -> Optional[np.ndarray]:
    """Structured vertex array via the native reader; None → use fallback."""
    lib = _lib()
    if lib is None:
        return None
    count = ctypes.c_long()
    stride = ctypes.c_int()
    props = ctypes.create_string_buffer(16384)
    offset = ctypes.c_long()
    rc = lib.igsio_ply_info(
        path.encode(), ctypes.byref(count), ctypes.byref(stride),
        props, len(props), ctypes.byref(offset),
    )
    if rc != 0:
        return None
    fields = [
        tuple(p.split(":"))
        for p in props.value.decode().split(";") if p
    ]
    dtype = np.dtype([(name, "<" + dt) for name, dt in fields])
    assert dtype.itemsize == stride.value
    buf = np.empty(count.value, dtype=dtype)
    rc = lib.igsio_ply_read(
        path.encode(), offset,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count.value * stride.value,
    )
    return buf if rc == 0 else None
