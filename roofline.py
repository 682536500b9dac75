"""Roofline / streaming-rate harness — per-stage timings at N3DV scale.

Measures on the attached accelerator (BASELINE.md targets):
  * anchor precompute (FPS 8192 + KNN8 at 150k points)
  * AGM-Net forward (B candidate frames, 4×512² inputs, render eval view)
  * refine step (rasterize fwd+bwd + Adam) — the key-frame inner loop
  * rasterizer fwd / fwd+bwd Mpix/s
and derives the streaming sec/frame:
  per 5-frame window ≈ AGM_batch + refine_iters·refine_step (+ anchors).

Writes roofline.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, iters=5, K=1):
    # salted + host-fetch timing (the axon tunnel caches identical calls
    # and block_until_ready does not block — igs_tpu/utils/devtime.py)
    from igs_tpu.utils.devtime import timeit_device

    return timeit_device(fn, *args, K=max(K, 1), iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gaussians", type=int, default=150_000)
    ap.add_argument("--anchors", type=int, default=8192)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--refine-iters", type=int, default=50)
    ap.add_argument("--impl", default="pallas_packed")
    ap.add_argument("--depth-res", type=int, default=128)
    ap.add_argument("--out", default="roofline.json")
    # production default: per-module bf16 ON (tools_bench_agm_bf16.py:
    # AGM 309 → 268 ms); --f32 measures the exact path
    ap.add_argument("--f32", action="store_true",
                    help="disable the per-module bf16 compute flags")
    ap.add_argument("--rebin-every", type=int, default=1,
                    help="refine-loop tile-pair rebuild interval "
                         "(RefineConfig.rebin_every; pallas_packed only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.models.agm import AGMNet
    from igs_tpu.ops.anchors import select_anchors
    from igs_tpu.ops.rasterize import RasterSettings, rasterize
    from igs_tpu.stream.refine import (
        RefineConfig, init_refine_state, refine_step,
    )

    n, a, res, b = args.n_gaussians, args.anchors, args.res, args.batch
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    g = Gaussians.create(
        xyz,
        rng.uniform(-2, 4, (n, 1)).astype(np.float32),
        (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
            rng.normal(size=(n, 4)).astype(np.float32)),
        rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32),
        np.concatenate([
            rng.uniform(-1, 2, (n, 1, 3)),
            0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32),
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 5.0
    cam = Camera.from_w2c(w2c, 0.9, 0.9, height=res, width=res)
    bbox = jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]])
    settings = RasterSettings(
        image_height=res, image_width=res, impl=args.impl,
        max_pairs=1 << 19, max_per_tile=1024, chunk=128,
    )
    results = {}

    # 1. anchors
    sel = jax.jit(lambda x, v: select_anchors(x, bbox, valid=v,
                                              anchor_size=a, k=8,
                                              exact_knn=False))
    results["anchors_s"] = timeit(sel, g.xyz, g.valid, K=8)

    # 2. rasterize fwd / fwd+bwd
    fwd = jax.jit(lambda x: rasterize(
        means3d=x, opacity=g.get_opacity, scaling=g.get_scaling,
        rotation=g.get_rotation, camera=cam, shs=g.shs,
        settings=settings)["color"])
    results["raster_fwd_s"] = timeit(fwd, g.xyz, K=16)

    def loss(x):
        out = rasterize(
            means3d=x, opacity=g.get_opacity, scaling=g.get_scaling,
            rotation=g.get_rotation, camera=cam, shs=g.shs,
            settings=settings)
        return jnp.mean(jnp.abs(out["color"]))

    fb = jax.jit(jax.grad(loss))
    results["raster_fwd_bwd_s"] = timeit(fb, g.xyz, K=16)
    results["raster_fwd_bwd_mpix_s"] = res * res / results[
        "raster_fwd_bwd_s"] / 1e6

    # 3. refine: one fused refine_iterations program (stream/refine.py)
    from igs_tpu.stream.refine import refine_run

    state = init_refine_state(g, capacity=n)
    rcfg = RefineConfig(rebin_every=args.rebin_every)
    nviews = 18  # sear_steak training views
    gts = jnp.zeros((nviews, 3, res, res))
    cams = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[cam for _ in range(nviews)])
    order = jnp.asarray(
        np.arange(args.refine_iters) % nviews, jnp.int32)
    rloop = jax.jit(lambda s: refine_run(
        s, cams, gts, order, jnp.zeros(3), rcfg,
        settings._replace(clamp_grads=False, outputs="color"),
        jnp.float32(3.0),
        args.refine_iters))
    results["refine_loop_s"] = timeit(rloop, state, iters=3)
    results["refine_step_s"] = results["refine_loop_s"] / args.refine_iters

    # 4. AGM forward at production dims
    model = AGMNet(cnn_bf16=not args.f32, encoder_bf16=not args.f32,
                   ft_bf16=not args.f32)
    state1 = sel(g.xyz, g.valid)
    astate = jax.tree.map(lambda x: jnp.stack([x] * b), state1)
    gb = jax.tree.map(lambda x: jnp.stack([x] * b), g)
    hw = 512
    h8 = hw // 8 * 2
    c2w = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1))
    c2w[:, :, 2, 3] = -5.0
    batch = {
        "cur_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
        "next_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(2, 6, (b, 4, hw, hw)), jnp.float32),
        "local_rays": jnp.asarray(
            rng.normal(size=(b, h8, h8, 3)), jnp.float32),
        "FOV": jnp.full((b, 2), 0.9),
        "c2w_input": jnp.asarray(c2w),
        # streaming renders 1 eval view + 4 depth-carry views per frame
        "c2w_output": jnp.asarray(
            np.concatenate([c2w[:, :1], c2w], axis=1)),
        "background_color": jnp.zeros((b, 3)),
    }
    agm_settings = settings._replace(clamp_grads=True, outputs="color")
    depth_settings = agm_settings._replace(
        image_height=args.depth_res, image_width=args.depth_res,
        # ~4 contributions/pixel (matches stream/pipeline.py sizing)
        max_pairs=1 << min(18, max(14, (args.depth_res ** 2 * 4 - 1)
                                   .bit_length())),
        max_per_tile=512, outputs="color_depth")
    params = jax.jit(
        lambda r: model.init(r, batch, astate, gb, agm_settings,
                             depth_settings=depth_settings)
    )(jax.random.PRNGKey(0))
    # shared_cur matches the streaming pipeline (every candidate in a
    # window shares the key frame; pipeline.py shared_cur_cnn)
    # headline = the production streaming path (shared_cur +
    # shared_window_pairs, both pipeline defaults); the exact
    # per-candidate-binning variant is reported alongside
    napply = jax.jit(lambda p, bt: model.apply(
        p, bt, astate, gb, agm_settings,
        depth_settings=depth_settings,
        shared_cur=True, shared_window_pairs=True)["images_pred"])
    results["agm_forward_s"] = timeit(napply, params, batch, iters=3, K=4)
    napply_exact = jax.jit(lambda p, bt: model.apply(
        p, bt, astate, gb, agm_settings,
        depth_settings=depth_settings,
        shared_cur=True)["images_pred"])
    results["agm_forward_exact_pairs_s"] = timeit(
        napply_exact, params, batch, iters=3, K=4)

    # derived: streaming sec/frame for a 5-frame key window
    window = (
        results["anchors_s"]
        + results["agm_forward_s"]
        + results["refine_loop_s"]
    )
    results["stream_s_per_frame"] = window / b
    results["stream_fps"] = b / window
    results["config"] = vars(args)

    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
