"""Image / grid / video / source-snapshot export utilities.

Reference parity: SaverMixin (igs/utils/saving.py:17-315) image and video
exporters, and saveRuntimeCode (main.py:36-59) which snapshots the source
tree into the workspace for reproducibility.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterable, List, Optional

import numpy as np


def to_uint8_image(img: np.ndarray) -> np.ndarray:
    """(3,H,W)/(H,W,3)/(H,W) float [0,1] — or uint8 passthrough — →
    (H,W,3) uint8."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_image(path: str, img: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(to_uint8_image(img)).save(path)


def save_image_grid(path: str, images: Iterable[np.ndarray], cols: int = 4):
    """Tile images into a grid (SaverMixin.save_image_grid)."""
    imgs = [to_uint8_image(i) for i in images]
    h, w = imgs[0].shape[:2]
    cols = min(cols, len(imgs))
    rows = (len(imgs) + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    save_image(path, grid / 255.0)


def save_depth_mm(path: str, depth: np.ndarray):
    """uint16 millimeter PNG (compress.py depth_expected_mm convention)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    dmm = np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)
    Image.fromarray(dmm, mode="I;16").save(path)


def save_video(path: str, frames: List[np.ndarray], fps: int = 30):
    """Video export (SaverMixin.save_img_sequence / video.ipynb).

    mp4 goes through imageio when an ffmpeg backend exists; without one
    (this image ships none) the writer falls back to a dependency-free
    MJPEG-in-AVI container (``save_video_avi``) next to the requested
    path — still a playable file — or to gif for .gif requests.
    """
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames8 = [to_uint8_image(f) for f in frames]
    if path.endswith(".gif"):
        imageio.mimsave(path, frames8, fps=fps)
        return path
    if path.endswith(".avi"):
        return save_video_avi(path, frames8, fps=fps)
    try:
        imageio.mimsave(path, frames8, fps=fps, macro_block_size=1)
        return path
    except Exception:
        return save_video_avi(
            os.path.splitext(path)[0] + ".avi", frames8, fps=fps)


def save_video_avi(path: str, frames: List[np.ndarray], fps: int = 30,
                   quality: int = 92) -> str:
    """Minimal MJPEG-in-AVI writer — no codec dependencies.

    Writes the public AVI RIFF layout (hdrl/movi/idx1) with one 'vids'
    stream of JPEG frames ('MJPG' fourcc); every mainstream player
    decodes it. Used as the video path in environments without ffmpeg.
    """
    import io
    import struct

    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames8 = [to_uint8_image(f) for f in frames]
    h, w = frames8[0].shape[:2]
    jpegs = []
    for f in frames8:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        # unpadded: chunk() adds the RIFF word-align pad OUTSIDE ckSize
        # (pre-padding here made every 00dc ckSize nonconforming)
        jpegs.append(buf.getvalue())
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes/sec
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I4h", 0, 0, 0, 1, fps, 0, len(jpegs),
                      max_size, 0xFFFFFFFF, 0, 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H4s5I", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b""
    index = b""
    for j in jpegs:
        # idx1 offsets are relative to the first byte of 'movi' (the kind
        # fourcc inside the LIST payload)
        offset = 4 + len(movi_payload)
        movi_payload += chunk(b"00dc", j)
        index += b"00dc" + struct.pack("<3I", 0x10, offset, len(j))
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return path


def save_runtime_code(workspace: str, src_root: Optional[str] = None):
    """Snapshot the framework source into the workspace (main.py:36-59)."""
    src_root = src_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    dst = os.path.join(workspace, "code_snapshot")
    os.makedirs(dst, exist_ok=True)
    for rel in ("igs_tpu", "bench.py", "train_agm.py", "infer_stream.py"):
        src = os.path.join(src_root, rel)
        target = os.path.join(dst, rel)
        if os.path.isdir(src):
            shutil.copytree(
                src, target, dirs_exist_ok=True,
                ignore=shutil.ignore_patterns("__pycache__"))
        elif os.path.exists(src):
            os.makedirs(os.path.dirname(target) or dst, exist_ok=True)
            shutil.copy2(src, target)


def dump_json(path: str, obj):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)
