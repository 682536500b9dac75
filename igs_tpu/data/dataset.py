"""Training dataset for AGM-Net (N3DV pair data built by RaDe-GS).

Reference parity: N3dDataset (igs/data/data.py:26-268). Reads, per item
(scene, cur_frame, next_frame): GT renders + expected-depth PNGs (uint16 mm
/ 1000) from ``<frame>/<gs_mode>/train/ours_<iter>/{gt,depth_expected_mm}``,
camera poses from cameras.json, bbox.json, optional group.json random view
picking, local/world rays at input_res/8 (×2 when up_sample), and the
cur-frame Gaussians PLY at collate time.

Pure numpy — batches are dicts of numpy arrays ready for jnp.asarray.
The reference keeps images in [0,1] (data.py:155) even though the GMFlow
normalizer expects [0,255] (utils.py:23-31); we reproduce that exactly.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from igs_tpu.data.ply import load_gaussian_ply


def focal2fov(focal, pixels):
    return 2 * np.arctan(pixels / (2 * focal))


def fov2focal(fov, pixels):
    return pixels / (2 * np.tan(fov / 2))


def get_nerfpp_norm(cam_centers: np.ndarray) -> Dict[str, Any]:
    """Scene radius/translate (igs/utils/general_utils.py:161-175)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=1)
    diagonal = dist.max()
    radius = diagonal * 1.1
    return {"translate": -center[0], "radius": float(radius)}


def load_image(path: str) -> np.ndarray:
    """RGB float32 [0,1], (3, H, W)."""
    img = np.array(Image.open(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return (img[..., :3] / 255.0).astype(np.float32).transpose(2, 0, 1)


def load_depth_mm(path: str) -> np.ndarray:
    """uint16 millimeter PNG → float32 meters (data.py:157)."""
    return (np.array(Image.open(path)) / 1000.0).astype(np.float32)


def local_ray_directions(h: int, w: int, fovx: float, fovy: float) -> np.ndarray:
    """(H, W, 3) normalized +z-forward local rays (data.py:218-234)."""
    fx, fy = fov2focal(fovx, w), fov2focal(fovy, h)
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float32) + 0.5,
        np.arange(h, dtype=np.float32) + 0.5,
        indexing="xy",
    )
    d = np.stack([(i - w / 2) / fx, (j - h / 2) / fy, np.ones_like(i)], -1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def world_rays(directions: np.ndarray, c2ws: np.ndarray) -> np.ndarray:
    """(V, H, W, 6) [origin | dir] world rays (data.py:236-242)."""
    h, w = directions.shape[:2]
    dirs = np.einsum("vij,hwj->vhwi", c2ws[:, :3, :3], directions)
    ori = np.broadcast_to(c2ws[:, None, None, :3, 3], dirs.shape)
    return np.concatenate([ori, dirs], axis=-1).astype(np.float32)


def camera_from_json(cam: Dict) -> Tuple[np.ndarray, float, float]:
    c2w = np.zeros((4, 4), np.float32)
    c2w[:3, :3] = np.array(cam["rotation"])
    c2w[:3, 3] = np.array(cam["position"])
    c2w[3, 3] = 1
    fovx = focal2fov(cam["fx"], cam["width"])
    fovy = focal2fov(cam["fy"], cam["height"])
    return c2w, float(fovx), float(fovy)


@dataclass
class N3dDatasetConfig:
    """Parity: N3dDatasetConfig (data.py:26-56)."""

    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    data_path: str = ""
    bbox_path: str = "bbox.json"
    root_dir: str = ""
    num_input_views: int = 4
    num_output_views: int = 8
    output_height: int = 1014
    output_width: int = 1352
    input_height: int = 512
    input_width: int = 512
    gs_mode: str = "3dgs_rade"
    iter: str = "10000_compress"
    need_rays: bool = True
    need_flow: bool = True
    up_sample: bool = False
    use_group: bool = False
    use_gstream: bool = False
    max_sh_degree: int = 3
    # extra keys accepted for reference-config compatibility
    scene_type: Optional[str] = None
    start_gs_path: Optional[str] = None
    start_frame: int = 0


class N3dDataset:
    def __init__(self, cfg: Dict[str, Any], training: bool = True):
        known = {k: v for k, v in cfg.items()
                 if k in N3dDatasetConfig.__dataclass_fields__}
        self.cfg = N3dDatasetConfig(**known)
        self.training = training
        with open(os.path.join(self.cfg.root_dir, self.cfg.data_path)) as f:
            paths = json.load(f)
        self.items = paths["train" if training else "val"]
        with open(os.path.join(self.cfg.root_dir, self.cfg.bbox_path)) as f:
            self.bboxs = json.load(f)
        self.background_color = np.asarray(self.cfg.background_color, np.float32)

    def __len__(self):
        return len(self.items)

    def _frame_dir(self, scene, frame):
        return os.path.join(self.cfg.root_dir, scene, frame)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = self.items[idx]
        scene, cur, nxt = item["scene_name"], item["cur_frame"], item["next_frame"]
        cur_dir, next_dir = self._frame_dir(scene, cur), self._frame_dir(scene, nxt)

        with open(os.path.join(cur_dir, self.cfg.gs_mode, "cameras.json")) as f:
            cameras = json.load(f)
        centers = np.array([c["position"] for c in cameras])
        scene_info = get_nerfpp_norm(centers)
        bbox = np.asarray(self.bboxs[scene], np.float32)

        if self.training and self.cfg.use_group:
            with open(os.path.join(self.cfg.root_dir, scene, "group.json")) as f:
                groups = json.load(f)
            selected = [random.choice(g) for g in groups]
            rest = [v for g in groups for v in g if v not in selected]
            vids = selected + random.sample(
                rest, self.cfg.num_output_views - len(selected)
            )
        elif self.training:
            vids = list(range(self.cfg.num_output_views))
        else:
            vids = [3, 7, 1, 4, 8, 0]

        cur_images, next_images, depths, c2ws = [], [], [], []
        fovx = fovy = None
        for vid in vids:
            vid_id = str(vid).zfill(5)
            base = os.path.join(self.cfg.gs_mode, "train", f"ours_{self.cfg.iter}")
            cur_images.append(load_image(os.path.join(cur_dir, base, "gt", vid_id + ".png")))
            next_images.append(load_image(os.path.join(next_dir, base, "gt", vid_id + ".png")))
            depths.append(load_depth_mm(
                os.path.join(cur_dir, base, "depth_expected_mm", vid_id + ".png")))
            c2w, fovx, fovy = camera_from_json(cameras[vid])
            c2ws.append(c2w)

        cur_images = np.stack(cur_images)
        next_images = np.stack(next_images)
        depths = np.stack(depths)
        c2ws = np.stack(c2ws)
        vin = self.cfg.num_input_views

        res: Dict[str, Any] = {
            "gs_path": os.path.join(
                cur_dir, self.cfg.gs_mode, "point_cloud",
                f"iteration_{self.cfg.iter}", "point_cloud.ply"),
            "cur_images_input": cur_images[:vin],
            "next_images_input": next_images[:vin],
            "images_output": next_images,
            "depth": depths[:vin],
            "c2w_output": c2ws,
            "c2w_input": c2ws[:vin],
            "FOV": np.asarray([fovx, fovy], np.float32),
            "background_color": self.background_color,
            "resolution": np.asarray(next_images.shape[-2:], np.int32),
            "idx": idx,
            "radius": np.float32(scene_info["radius"]),
            "translate": scene_info["translate"].astype(np.float32),
            "bounding_box": bbox,
        }
        if self.cfg.need_rays:
            h = self.cfg.input_height // 8
            w = self.cfg.input_width // 8
            if self.cfg.up_sample:
                h, w = 2 * h, 2 * w
            dirs = local_ray_directions(h, w, fovx, fovy)
            res["local_rays"] = dirs
            res["rays"] = world_rays(dirs, c2ws[:vin])
        return res

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Stack numpy batches + load per-item Gaussians (data.py:249-268)."""
        batch: Dict[str, Any] = {}
        for k in items[0]:
            if k == "gs_path":
                batch[k] = [it[k] for it in items]
            else:
                batch[k] = np.stack([np.asarray(it[k]) for it in items])
        gs_list = [
            load_gaussian_ply(p, max_sh_degree=self.cfg.max_sh_degree)
            for p in batch["gs_path"]
        ]
        batch["gs"] = gs_list
        return batch
