"""Synthetic scene builder — fabricates an on-disk N3DV-layout dataset.

Writes the exact directory structure the reference pipeline consumes
(SURVEY.md §3.5): per-frame ``images_r2``/``images_512`` renders,
``<gs_mode>/cameras.json``, frame-0 ``point_cloud.ply`` +
``train/ours_<iter>/{gt,depth_expected_mm}`` renders, ``bbox.json`` and a
key/candidate pair json (generate_test_pair.ipynb schema). Used by the
integration tests and as a smoke scene for bench warmup — no real capture
data is required anywhere in the test suite.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp
from PIL import Image

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.data.ply import save_gaussian_ply
from igs_tpu.ops.rasterize import RasterSettings, rasterize


def _make_cameras(n_cams: int, radius: float = 4.0, fov: float = 0.8,
                  height: int = 64, width: int = 64):
    """Ring of inward-looking cameras in the z<0 half space (3DGS frame)."""
    cams = []
    for i in range(n_cams):
        theta = (i / n_cams - 0.5) * 1.6  # partial arc like N3DV rigs
        pos = np.array(
            [radius * np.sin(theta), 0.15 * np.sin(3 * theta),
             -radius * np.cos(theta)], np.float32)
        z = -pos / np.linalg.norm(pos)  # look at origin (+z forward)
        up = np.array([0.0, -1.0, 0.0], np.float32)  # 3DGS y-down
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([x, y, z], 1)
        c2w[:3, 3] = pos
        fx = width / (2 * np.tan(fov / 2))
        fy = height / (2 * np.tan(fov / 2))
        cams.append({
            "id": i, "img_name": f"cam{i:02d}", "width": width,
            "height": height, "position": pos.tolist(),
            "rotation": c2w[:3, :3].tolist(), "fx": float(fx), "fy": float(fy),
        })
    return cams


def _scene_gaussians(n: int, seed: int, t: float,
                     motion_scale: float = 1.0,
                     static_frac: float = 0.5,
                     opacity_range=(1.0, 4.0),
                     scale_range=(-2.8, -1.8)) -> Gaussians:
    """A moving blob of Gaussians: static shell + dynamic core drifting.

    The defaults suit the 64² toy scene; at higher resolution / gaussian
    count pass a sparser, smaller, more transparent population
    (static_frac≈0.3, opacity_range≈(-0.5, 2.0), scale_range≈(-3.8,
    -2.6)) or the shell saturates alpha and fully occludes the moving
    core (no visible motion to learn)."""
    rng = np.random.RandomState(seed)
    n_static = int(n * static_frac)
    static = rng.uniform(-1.5, 1.5, (n_static, 3)).astype(np.float32)
    core = rng.uniform(-0.5, 0.5, (n - n_static, 3)).astype(np.float32)
    core = core + motion_scale * np.array(
        [0.6 * np.sin(t), 0.3 * np.cos(t), 0.0], np.float32)
    xyz = np.concatenate([static, core])
    opacity = rng.uniform(*opacity_range, (n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    scaling = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1.0, 2.0, (n, 3))
    return Gaussians.create(xyz, opacity, rot, scaling, shs)


def build_synthetic_scene(
    root: str,
    scene_name: str = "toy_scene",
    n_frames: int = 11,
    n_cams: int = 14,
    n_gaussians: int = 512,
    height: int = 64,
    width: int = 64,
    interval: int = 5,
    gs_mode: str = "3dgs_rade",
    iteration: str = "6000_compress",
    settings: Optional[RasterSettings] = None,
    motion_scale: float = 1.0,
    static_frac: float = 0.5,
    opacity_range=(1.0, 4.0),
    scale_range=(-2.8, -1.8),
    out_height: Optional[int] = None,
    out_width: Optional[int] = None,
) -> dict:
    """Build the scene tree; returns paths/info for the datasets.

    ``motion_scale`` scales the dynamic core's drift (1.0 ≈ 18 px/frame
    at 256²; use ~0.3 for an N3DV-like few-px/frame training scene).

    ``out_height``/``out_width``: resolution of the EVAL/refine renders
    (images_r2 + train gt/depth), when different from the input
    (images_512) resolution — the reference's real geometry is 512²
    inputs with 1014×1352 outputs (infer_data.py defaults). Default:
    same as height/width.
    """
    import math

    out_h = out_height or height
    out_w = out_width or width

    def default_settings(h, w):
        return RasterSettings(
            image_height=h, image_width=w, impl="tiles",
            max_pairs=1 << min(
                21, max(15, math.ceil(math.log2(h * w * 2)))),
            max_per_tile=512, chunk=64,
        )

    if settings is None:
        settings = default_settings(height, width)
    out_settings = (settings if (out_h, out_w) == (height, width)
                    else default_settings(out_h, out_w))
    cams = _make_cameras(n_cams, height=height, width=width)
    fov = 2 * np.arctan(width / (2 * cams[0]["fx"]))

    import jax
    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def _render_jit(g, c2w, out_res: bool):
        s = out_settings if out_res else settings
        cam = Camera.from_c2w(
            c2w, (fov, fov), (s.image_height, s.image_width))
        out = rasterize(
            means3d=g.get_xyz, opacity=g.get_opacity, scaling=g.get_scaling,
            rotation=g.get_rotation, camera=cam, shs=g.shs, valid=g.valid,
            settings=s,
        )
        return jnp.clip(out["color"], 0, 1), out["depth"]

    two_res = (out_h, out_w) != (height, width)

    def render(g, cam_json, out_res=False):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array(cam_json["rotation"])
        c2w[:3, 3] = np.array(cam_json["position"])
        img, depth = _render_jit(g, jnp.asarray(c2w), out_res)
        return np.asarray(img), np.asarray(depth)

    scene_dir = os.path.join(root, scene_name)
    for f in range(n_frames):
        t = 0.4 * f
        g = _scene_gaussians(n_gaussians, seed=0, t=t,
                             motion_scale=motion_scale,
                             static_frac=static_frac,
                             opacity_range=opacity_range,
                             scale_range=scale_range)
        frame_dir = os.path.join(scene_dir, f"colmap_{f}")
        for sub in ("images_r2", "images_512"):
            os.makedirs(os.path.join(frame_dir, sub), exist_ok=True)
        mode_dir = os.path.join(frame_dir, gs_mode)
        os.makedirs(mode_dir, exist_ok=True)
        with open(os.path.join(mode_dir, "cameras.json"), "w") as fj:
            json.dump(cams, fj)
        write_train = True  # train pairs read gt renders of every frame
        if write_train:
            train_dir = os.path.join(mode_dir, "train", f"ours_{iteration}")
            os.makedirs(os.path.join(train_dir, "gt"), exist_ok=True)
            os.makedirs(os.path.join(train_dir, "depth_expected_mm"), exist_ok=True)
        # every frame gets its PLY: the reference training set carries a
        # trained 3DGS per frame (build_3dgs_dataset.py) that the train
        # loader reads per item (data.py:249-268); streaming reads only
        # frame 0's
        ply_dir = os.path.join(mode_dir, "point_cloud", f"iteration_{iteration}")
        os.makedirs(ply_dir, exist_ok=True)
        save_gaussian_ply(os.path.join(ply_dir, "point_cloud.ply"), g)
        for i, cam in enumerate(cams):
            img, depth = render(g, cam)
            u8 = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(u8).save(
                os.path.join(frame_dir, "images_512", cam["img_name"] + ".png"))
            if two_res:
                # eval/refine views live at the OUTPUT resolution
                # (reference: images_r2 is 1014×1352, images_512 is 512²)
                img_o, depth_o = render(g, cam, out_res=True)
                u8_o = (img_o.transpose(1, 2, 0) * 255).astype(np.uint8)
            else:
                u8_o, depth_o = u8, depth
            Image.fromarray(u8_o).save(
                os.path.join(frame_dir, "images_r2", cam["img_name"] + ".png"))
            if write_train:
                Image.fromarray(u8_o).save(
                    os.path.join(train_dir, "gt", f"{i:05d}.png"))
                dmm = np.clip(depth_o * 1000.0, 0, 65535).astype(np.uint16)
                # depth file i = camera i; consumers set
                # data.depth_id_offset: 0 (the reference's vid+1 n3d
                # quirk reflects ITS datasets' render enumeration; the
                # old write-both-names hack self-overwrote, handing the
                # loader the NEXT camera's depth)
                Image.fromarray(dmm, mode="I;16").save(
                    os.path.join(
                        train_dir, "depth_expected_mm", f"{i:05d}.png"))

    # bbox over the dynamic region (generous)
    with open(os.path.join(root, "bbox.json"), "w") as fj:
        json.dump({scene_name: [[-1.4, -1.0, -0.6], [1.4, 1.0, 0.6]]}, fj)

    # key/candidate pairs (generate_test_pair.ipynb: every interval-th frame
    # is a key frame; each item pairs the key frame with the next candidate)
    items = []
    for f in range(n_frames - 1):
        key = (f // interval) * interval
        items.append({
            "scene_name": scene_name,
            "cur_frame": f"colmap_{key}",
            "next_frame": f"colmap_{f + 1}",
            "keyframe": 1 if f % interval == 0 else 0,
        })
    pair_path = os.path.join(root, f"{scene_name}_pairs.json")
    with open(pair_path, "w") as fj:
        json.dump({"train": items, "val": items}, fj)

    start_gs = os.path.join(
        scene_dir, "colmap_0", gs_mode, "point_cloud",
        f"iteration_{iteration}", "point_cloud.ply")
    return {
        "root": root,
        "scene_name": scene_name,
        "pairs": os.path.basename(pair_path),
        "start_gs_path": start_gs,
        "fov": float(fov),
        "height": height,
        "width": width,
    }
