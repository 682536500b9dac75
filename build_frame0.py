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


def _load_frame(frame_dir: str, images_dir: str, seed: int = 0):
    """(cameras_json, stacked cams, images (V,3,H,W), init points+colors)."""
    import numpy as np

    from igs_tpu.core.camera import Camera
    from igs_tpu.data.dataset import camera_from_json
    from igs_tpu.data.native import load_images_nchw

    cam_path = os.path.join(frame_dir, "cameras.json")
    if not os.path.exists(cam_path):
        # colmap-converted scenes keep cameras.json at the frame root; a
        # re-build over an existing gs_mode export finds it one level down
        import glob as _glob

        hits = sorted(_glob.glob(os.path.join(frame_dir, "*", "cameras.json")))
        if not hits:
            raise FileNotFoundError(
                f"no cameras.json under {frame_dir} (or its gs_mode dirs)")
        cam_path = hits[0]
    with open(cam_path) as f:
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
    return cameras_json, cams, images, pts, cols


def export_frame_artifacts(
    frame_dir, out_mode, iterations, g, filt, cams, cameras_json, settings,
):
    """Write the RaDe-GS artifact layout the AGM datasets consume
    (train.sh / compress.py:34-64 outputs)."""
    import numpy as np
    import jax.numpy as jnp

    from igs_tpu.data.ply import save_gaussian_ply
    from igs_tpu.ops.rasterize import rasterize
    from igs_tpu.train.frame0 import fused_render_args
    from igs_tpu.utils.saving import save_depth_mm, save_image

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
    bg = jnp.zeros(3)
    for i, cam in enumerate(cams):
        out = rasterize(
            means3d=g.xyz, opacity=opacity, scaling=scales,
            rotation=g.get_rotation, camera=cam, shs=g.shs, bg=bg,
            valid=g.valid, settings=settings)
        save_image(os.path.join(train_dir, "gt", f"{i:05d}.png"),
                   np.asarray(out["color"]))
        # depth file i = camera i. The old write-both-(i, i+1) hack
        # self-overwrote: iteration i+1's own-name write clobbered the
        # i+1 alias, so the n3d loader (vid+1 quirk) read the NEXT
        # camera's depth. Generated scenes set data.depth_id_offset: 0.
        save_depth_mm(
            os.path.join(train_dir, "depth_expected_mm", f"{i:05d}.png"),
            np.asarray(out["depth"]))
    print(f"frame done: {int(g.num_valid)} gaussians → {mode_dir}")


def train_frames_spmd(
    frame_dirs, images_dir, out_mode, iterations, prune_percent, capacity,
    n_devices: int = 0, seed: int = 0, finetune_iters: int = 1000,
):
    """Train F frames in lockstep, frame axis sharded over the mesh.

    TPU-native counterpart of the reference's GPU-queue sweep
    (build_3dgs_dataset.py:43-56): one jitted program, F frames on the
    ``data`` axis, no inter-frame communication. F must be divisible by
    the device count.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from igs_tpu.ops.rasterize import RasterSettings
    from igs_tpu.parallel.mesh import make_mesh
    from igs_tpu.stream.refine import init_refine_state
    from igs_tpu.train.frame0 import Frame0Config, create_from_points
    from igs_tpu.train.frame0_sweep import (
        compute_3d_filter_stacked, sweep_compress, sweep_run,
    )

    f_count = len(frame_dirs)
    devices = jax.devices()
    nsh = n_devices or len(devices)
    nsh = min(nsh, f_count)
    while f_count % nsh:
        nsh -= 1
    mesh = make_mesh(data=nsh, tile=1, devices=devices[:nsh])
    shard = NamedSharding(mesh, P("data"))

    loaded = [_load_frame(d, images_dir, seed) for d in frame_dirs]
    h, w = loaded[0][2].shape[-2:]
    cfg = Frame0Config(iterations=iterations)
    settings = RasterSettings(
        image_height=h, image_width=w, impl="tiles",
        max_pairs=1 << 21, max_per_tile=2048,
        # count_gaussians always runs the Pallas counting kernel
        pallas_interpret=jax.default_backend() != "tpu",
    )

    states, cams_l, imgs_l, spatials, jsons = [], [], [], [], []
    for cameras_json, cams, images, pts, cols in loaded:
        g = create_from_points(pts, cols, capacity)
        states.append(init_refine_state(g, capacity))
        cams_l.append(jax.tree.map(lambda *x: jnp.stack(x), *cams))
        imgs_l.append(jnp.asarray(images))
        spatials.append(float(np.linalg.norm(
            np.array([c["position"] for c in cameras_json]).std(0)) + 1.0))
        jsons.append(cameras_json)
    stack = lambda xs: jax.tree.map(lambda *x: jnp.stack(x), *xs)
    states = jax.device_put(stack(states), shard)
    cams_s = jax.device_put(stack(cams_l), shard)
    images_s = jax.device_put(jnp.stack(imgs_l), shard)
    spatial = jnp.asarray(spatials)

    filts = jax.jit(jax.vmap(compute_3d_filter_stacked),
                    out_shardings=shard)(
        states.gaussians.xyz, states.gaussians.valid, cams_s)

    rng = np.random.RandomState(seed)
    nviews = images_s.shape[1]

    def orders(iters_n):
        per = []
        for _ in range(f_count):
            o = []
            while len(o) < iters_n:
                o.extend(rng.permutation(nviews).tolist())
            per.append(o[:iters_n])
        return jnp.asarray(per, jnp.int32)

    run = jax.jit(
        lambda st, fl, vo: sweep_run(
            st, cams_s, images_s, fl, vo, cfg, settings, spatial,
            iterations),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    states, filts = run(states, filts, orders(iterations))
    jax.block_until_ready(states.gaussians.xyz)
    print(f"sweep: {f_count} frames × {iterations} iters on {nsh} "
          f"device(s) in {time.time()-t0:.0f}s")

    # LightGaussian prune + short finetune (compress.py:66-100). Fresh
    # optimizer state like the sequential driver's init_refine_state —
    # carrying the sweep's Adam moments/step into the finetune would
    # suppress its updates (round-4 review finding)
    gs = jax.jit(
        lambda st, fl: sweep_compress(st, cams_s, fl, settings,
                                      prune_percent))(states, filts)
    states = jax.jit(
        jax.vmap(lambda gg: init_refine_state(gg, capacity)),
        out_shardings=shard)(gs)
    ft = jax.jit(
        lambda st, fl, vo: sweep_run(
            st, cams_s, images_s, fl, vo, cfg, settings, spatial,
            finetune_iters, start_iter=iterations, densify=False),
        donate_argnums=(0, 1),
    )
    states, filts = ft(states, filts, orders(finetune_iters))
    jax.block_until_ready(states.gaussians.xyz)

    for i, frame_dir in enumerate(frame_dirs):
        g_i = jax.tree.map(
            lambda x: x[i] if x is not None else None, states.gaussians)
        cams = loaded[i][1]
        export_frame_artifacts(
            frame_dir, out_mode, iterations, g_i, filts[i], cams,
            jsons[i], settings)


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

    cameras_json, cams, images, pts, cols = _load_frame(
        frame_dir, images_dir, seed)
    h, w = images.shape[-2:]
    rng = np.random.RandomState(seed)

    g = create_from_points(pts, cols, capacity)
    state = init_refine_state(g, capacity)
    cfg = Frame0Config(iterations=iterations)
    settings = RasterSettings(
        image_height=h, image_width=w, impl="tiles",
        max_pairs=1 << 21, max_per_tile=2048,
        # count_gaussians always runs the Pallas counting kernel
        pallas_interpret=jax.default_backend() != "tpu",
    )
    bg = jnp.zeros(3)
    spatial = float(np.linalg.norm(
        np.array([c["position"] for c in cameras_json]).std(0)) + 1.0)

    filt = compute_3d_filter(
        state.gaussians.xyz, state.gaussians.valid, cams)
    # filt is a STEP ARGUMENT, not a closure: a jit-captured closure bakes
    # the trace-time filter in as a constant, silently ignoring every
    # post-densify recompute (round-4 review finding)
    step = jax.jit(
        lambda s, cam, gt, fl, lr: frame0_step(
            s, cam, gt, bg, fl, cfg, settings, lr, reg_on=False,
        ),
    )

    order = []
    t0 = time.time()
    for it in range(1, iterations + 1):
        if not order:
            order = list(rng.permutation(len(cams)))
        vi = int(order.pop())
        lr = position_lr(it, cfg, spatial)
        state, loss = step(state, cams[vi], jnp.asarray(images[vi]), filt, lr)
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
            state, cams[vi], jnp.asarray(images[vi]), filt,
            position_lr(iterations + it, cfg, spatial))
    g = state.gaussians

    export_frame_artifacts(
        frame_dir, out_mode, iterations, g, filt, cams, cameras_json,
        settings)


def main():
    from igs_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True, help="scene dir with colmap_<f>")
    ap.add_argument("--images", default="images_512")
    ap.add_argument("--gs-mode", default="3dgs_rade")
    ap.add_argument("--iterations", type=int, default=6000)
    ap.add_argument("--prune-percent", type=float, default=0.45)
    ap.add_argument("--finetune-iters", type=int, default=1000,
                    help="post-prune finetune iterations "
                         "(compress.py:66-100 runs 1000-5000)")
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
    ap.add_argument("--spmd", action="store_true",
                    help="train all frames in LOCKSTEP as one jitted "
                         "program with the frame axis sharded over the "
                         "local mesh (igs_tpu/train/frame0_sweep.py) — "
                         "the TPU-native sweep; --workers uses the "
                         "process pool instead")
    ap.add_argument("--manifest", default=None,
                    help="json list of scene dirs (multi-scene sweep); "
                         "overrides --scene. Each entry is swept over its "
                         "colmap_<f> frames (or --frames)")
    args = ap.parse_args()

    scenes = [args.scene]
    if args.manifest:
        with open(args.manifest) as f:
            scenes = json.load(f)
        assert isinstance(scenes, list) and scenes, "manifest: json list"

    def frames_of(scene):
        if args.frames is not None:
            return args.frames
        return sorted(
            int(d.split("_")[1]) for d in os.listdir(scene)
            if d.startswith("colmap_"))

    if args.spmd:
        frame_dirs = [
            os.path.join(scene, f"colmap_{f}")
            for scene in scenes for f in frames_of(scene)
        ]
        train_frames_spmd(
            frame_dirs, args.images, args.gs_mode, args.iterations,
            args.prune_percent, args.capacity,
            n_devices=args.workers if args.workers > 1 else 0,
            finetune_iters=args.finetune_iters)
        return

    frames = [(scene, f) for scene in scenes for f in frames_of(scene)]

    if args.workers <= 1:
        for scene, f in frames:
            frame_dir = os.path.join(scene, f"colmap_{f}")
            print(f"=== {scene} frame {f} ===")
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

    def run_frame(job):
        scene, f = job
        dev = queue.get()
        try:
            env = dict(os.environ, TPU_VISIBLE_DEVICES=dev)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--scene", scene, "--images", args.images,
                "--gs-mode", args.gs_mode,
                "--iterations", str(args.iterations),
                "--prune-percent", str(args.prune_percent),
                "--capacity", str(args.capacity),
                "--frames", str(f),
            ]
            print(f"[chip {dev}] {scene} frame {f}")
            subprocess.run(cmd, env=env, check=False)
        finally:
            queue.put(dev)

    with mp.pool.ThreadPool(len(devices)) as pool:
        pool.map(run_frame, frames)


if __name__ == "__main__":
    main()
