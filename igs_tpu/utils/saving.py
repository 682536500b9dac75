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
    """(3,H,W) or (H,W,3) or (H,W) float [0,1] → (H,W,3) uint8."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = img.transpose(1, 2, 0)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
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
    """mp4/gif via imageio (SaverMixin.save_img_sequence / video.ipynb)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames8 = [to_uint8_image(f) for f in frames]
    if path.endswith(".gif"):
        imageio.mimsave(path, frames8, fps=fps)
    else:
        try:
            imageio.mimsave(path, frames8, fps=fps, macro_block_size=1)
        except Exception:
            # ffmpeg may be unavailable; fall back to gif next to it
            imageio.mimsave(os.path.splitext(path)[0] + ".gif", frames8,
                            fps=fps)


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
