"""Frame-0 pipeline driver: 3DGS train → LightGaussian compress → render.

Reference parity: submodules/RaDe-GS/train.sh (train.py → compress.py →
render.py, SURVEY.md §3.5) and build_3dgs_dataset.py's per-frame sweep —
produces for each frame the artifacts the AGM datasets consume:
  <frame>/<gs_mode>/point_cloud/iteration_<it>/point_cloud.ply
  <frame>/<gs_mode>/train/ours_<it>/{gt,depth_expected_mm}/*.png
  <frame>/<gs_mode>/cameras.json

Usage:
    python build_frame0.py --scene <dir> --images images_512 \
        --iterations 6000 --prune-percent 0.45 [--frames 0 1 2 ...]

Input: per-frame dirs with images + a cameras.json (colmap-converted) and
an initial sparse point cloud (points3D npz/ply) or random init.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def train_one_frame(
    frame_dir: str,
    images_dir: str,
    out_mode: str,
    iterations: int,
    prune_percent: float,
    capacity: int,
    seed: int = 0,
):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from igs_tpu.core.camera import Camera
    from igs_tpu.data.dataset import camera_from_json
    from igs_tpu.data.native import load_images_nchw
    from igs_tpu.data.ply import save_gaussian_ply, load_gaussian_ply
    from igs_tpu.ops.rasterize import RasterSettings, rasterize
    from igs_tpu.stream.refine import init_refine_state
    from igs_tpu.train.frame0 import (
        Frame0Config, compute_3d_filter, create_from_points,
        frame0_densify_and_prune, frame0_step, fused_render_args,
        lightgaussian_importance, position_lr, prune_by_importance,
        reset_opacity,
    )
    from igs_tpu.utils.saving import save_depth_mm, save_image

    with open(os.path.join(frame_dir, "cameras.json")) as f:
        cameras_json = json.load(f)
    h = cameras_json[0]["height"]
    w = cameras_json[0]["width"]

    img_paths = [
        os.path.join(frame_dir, images_dir, c["img_name"] + ".png")
        for c in cameras_json
    ]
    images = load_images_nchw(img_paths, h, w)
    cams = []
    for c in cameras_json:
        c2w, fovx, fovy = camera_from_json(c)
        cams.append(Camera.from_c2w(c2w, (fovx, fovy), (h, w)))

    # init: sparse points if available, else random in the camera hull
    pts_path = os.path.join(frame_dir, "points3D.npz")
    rng = np.random.RandomState(seed)
    if os.path.exists(pts_path):
        blob = np.load(pts_path)
        pts, cols = blob["xyz"], blob.get("rgb", None)
        if cols is None:
            cols = rng.uniform(0, 1, (len(pts), 3))
        elif cols.max() > 1.5:
            cols = cols / 255.0
    else:
        centers = np.array([c["position"] for c in cameras_json])
        lo, hi = centers.min(0) - 1, centers.max(0) + 1
        pts = rng.uniform(lo, hi, (20000, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (20000, 3)).astype(np.float32)

    g = create_from_points(pts, cols, capacity)
    state = init_refine_state(g, capacity)
    cfg = Frame0Config(iterations=iterations)
    settings = RasterSettings(
        image_height=h, image_width=w, impl="tiles",
        max_pairs=1 << 21, max_per_tile=2048,
    )
    bg = jnp.zeros(3)
    spatial = float(np.linalg.norm(
        np.array([c["position"] for c in cameras_json]).std(0)) + 1.0)

    filt = compute_3d_filter(
        state.gaussians.xyz, state.gaussians.valid, cams)
    step = jax.jit(
        lambda s, cam, gt, lr, reg: frame0_step(
            s, cam, gt, bg, filt, cfg, settings, lr, reg_on=False,
        ),
        static_argnames=("reg",),
    )

    order = []
    t0 = time.time()
    for it in range(1, iterations + 1):
        if not order:
            order = list(rng.permutation(len(cams)))
        vi = int(order.pop())
        lr = position_lr(it, cfg, spatial)
        state, loss = step(state, cams[vi], jnp.asarray(images[vi]), lr, False)
        if it < cfg.densify_until_iter and it > cfg.densify_from_iter \
                and it % cfg.densification_interval == 0:
            size_thr = 20.0 if it > cfg.opacity_reset_interval else None
            state = frame0_densify_and_prune(
                state, cfg, spatial, size_thr)
            filt = compute_3d_filter(
                state.gaussians.xyz, state.gaussians.valid, cams)
        if it % cfg.opacity_reset_interval == 0:
            state = reset_opacity(state)
        if it % 500 == 0:
            print(f"  iter {it}: loss {float(loss):.4f} "
                  f"n {int(state.gaussians.num_valid)} "
                  f"({time.time()-t0:.0f}s)")

    # LightGaussian prune + short finetune (compress.py:66-100)
    g = state.gaussians
    scores = lightgaussian_importance(g, filt, cams, settings)
    g = prune_by_importance(g, scores, prune_percent)
    state = init_refine_state(g, capacity)
    for it in range(1, 1001):
        if not order:
            order = list(rng.permutation(len(cams)))
        vi = int(order.pop())
        state, loss = step(
            state, cams[vi], jnp.asarray(images[vi]),
            position_lr(iterations + it, cfg, spatial), False)
    g = state.gaussians

    # export artifacts
    it_name = f"{iterations}_compress"
    mode_dir = os.path.join(frame_dir, out_mode)
    ply_dir = os.path.join(mode_dir, "point_cloud", f"iteration_{it_name}")
    os.makedirs(ply_dir, exist_ok=True)
    save_gaussian_ply(os.path.join(ply_dir, "point_cloud.ply"), g)
    with open(os.path.join(mode_dir, "cameras.json"), "w") as f:
        json.dump(cameras_json, f)
    train_dir = os.path.join(mode_dir, "train", f"ours_{it_name}")
    os.makedirs(os.path.join(train_dir, "gt"), exist_ok=True)
    os.makedirs(os.path.join(train_dir, "depth_expected_mm"), exist_ok=True)
    scales, opacity = fused_render_args(g, filt)
    for i, cam in enumerate(cams):
        out = rasterize(
            means3d=g.xyz, opacity=opacity, scaling=scales,
            rotation=g.get_rotation, camera=cam, shs=g.shs, bg=bg,
            valid=g.valid, settings=settings)
        save_image(os.path.join(train_dir, "gt", f"{i:05d}.png"),
                   np.asarray(out["color"]))
        for did in (i, i + 1):  # n3d loader reads vid+1 (infer_data.py:224)
            save_depth_mm(
                os.path.join(train_dir, "depth_expected_mm",
                             f"{did:05d}.png"),
                np.asarray(out["depth"]))
    print(f"frame done: {int(g.num_valid)} gaussians → {mode_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True, help="scene dir with colmap_<f>")
    ap.add_argument("--images", default="images_512")
    ap.add_argument("--gs-mode", default="3dgs_rade")
    ap.add_argument("--iterations", type=int, default=6000)
    ap.add_argument("--prune-percent", type=float, default=0.45)
    ap.add_argument("--capacity", type=int, default=200_000)
    ap.add_argument("--frames", type=int, nargs="*", default=None)
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel frame jobs (one per chip); the TPU "
                         "equivalent of build_3dgs_dataset.py's GPU-id "
                         "pool (ref :43-56)")
    ap.add_argument("--devices", default=None,
                    help="comma-separated chip ids for the worker pool "
                         "(default 0..workers-1), set per-process via "
                         "TPU_VISIBLE_DEVICES")
    args = ap.parse_args()

    frames = args.frames
    if frames is None:
        frames = sorted(
            int(d.split("_")[1]) for d in os.listdir(args.scene)
            if d.startswith("colmap_"))

    if args.workers <= 1:
        for f in frames:
            frame_dir = os.path.join(args.scene, f"colmap_{f}")
            print(f"=== frame {f} ===")
            train_one_frame(
                frame_dir, args.images, args.gs_mode, args.iterations,
                args.prune_percent, args.capacity)
        return

    # multi-chip job pool: a chip-id queue feeds per-frame subprocesses —
    # the embarrassing job parallelism of build_3dgs_dataset.py:43-56
    # (CUDA_VISIBLE_DEVICES → TPU_VISIBLE_DEVICES).
    import multiprocessing as mp
    import subprocess
    import sys

    devices = (args.devices.split(",") if args.devices
               else [str(i) for i in range(args.workers)])
    manager = mp.Manager()
    queue = manager.Queue()
    for d in devices:
        queue.put(d)

    def run_frame(f):
        dev = queue.get()
        try:
            env = dict(os.environ, TPU_VISIBLE_DEVICES=dev)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--scene", args.scene, "--images", args.images,
                "--gs-mode", args.gs_mode,
                "--iterations", str(args.iterations),
                "--prune-percent", str(args.prune_percent),
                "--capacity", str(args.capacity),
                "--frames", str(f),
            ]
            print(f"[chip {dev}] frame {f}")
            subprocess.run(cmd, env=env, check=False)
        finally:
            queue.put(dev)

    with mp.pool.ThreadPool(len(devices)) as pool:
        pool.map(run_frame, frames)


if __name__ == "__main__":
    main()
