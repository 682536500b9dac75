"""Stage-level timing of the packed rasterize pipeline at production shape.

Splits the 512²/150k color-mode fwd and fwd+bwd cost into: projection,
aligned binning, pair gather+transpose, the packed blend kernels (fwd and
bwd pallas_call alone), raw→outputs, and the gather's AD transpose
(segment scatter-add). Timings are scan-amortized like tools_bench_blend.

Usage: python tools_profile_raster.py [--n 150000] [--res 512] [--mode color]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mode", default="color", choices=["color", "full"])
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--max-pairs", type=int, default=1 << 19)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.ops import pallas_blend as pb
    from igs_tpu.ops.binning import build_tile_pairs
    from igs_tpu.ops.projection import TILE_X, TILE_Y, project

    n, res, mode = args.n, args.res, args.mode
    rng = np.random.RandomState(0)
    g = Gaussians.create(
        rng.uniform(-2, 2, (n, 3)).astype(np.float32),
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
    grid_x = (res + TILE_X - 1) // TILE_X
    grid_y = (res + TILE_Y - 1) // TILE_Y

    def timeit(fn, *xs, K=args.K, iters=3):
        def repeated(*xs):
            def body(c, i):
                def pert(a):
                    if jnp.issubdtype(a.dtype, jnp.floating):
                        return a + jnp.asarray(1e-6 * i, a.dtype)
                    return a
                perturbed = [jax.tree.map(pert, x) for x in xs]
                out = fn(*perturbed)
                return c + jax.tree.reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))) * 1e-12, out, jnp.float32(0.0)), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))
            return c
        rj = jax.jit(repeated)
        jax.block_until_ready(rj(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.time()
            jax.block_until_ready(rj(*xs))
            ts.append(time.time() - t0)
        return float(np.median(ts)) / K * 1e3  # ms

    color_only = mode == "color"

    def f_project(xyz):
        return project(
            means3d=xyz, opacity=g.get_opacity[:, 0],
            scaling=g.get_scaling, rotation=g.get_rotation, shs=g.shs,
            valid=g.valid, camera=cam, kernel_size=0.0,
            geometry=not color_only)

    proj = jax.jit(f_project)(g.xyz)
    jax.block_until_ready(proj)

    def f_binning(proj):
        return build_tile_pairs(
            proj, grid_x, grid_y, max_pairs=args.max_pairs)

    pairs = jax.jit(f_binning)(proj)
    jax.block_until_ready(pairs)

    lanes = 16 if color_only else 32

    def f_gather(proj, gauss_id):
        feats = pb.pack_features(proj)[:, :lanes]
        pf = feats[jnp.maximum(gauss_id, 0)]
        return jnp.pad(pf, ((0, 128), (0, 0))).T  # (lanes, MP+128)

    feats_t = jax.jit(f_gather)(proj, pairs.gauss_id)
    jax.block_until_ready(feats_t)

    scalars = jnp.concatenate(
        [jnp.asarray([grid_x], jnp.float32),
         pairs.num_pairs.astype(jnp.float32)[None],
         jnp.zeros(6, jnp.float32)])
    counts = pairs.tile_count.astype(jnp.int32)
    starts = pairs.tile_start.astype(jnp.int32)

    def f_blend_fwd(feats_t):
        return pb.blend_raw_packed(
            feats_t, counts, starts, scalars, grid_x, grid_y, False, mode)

    raw = jax.jit(f_blend_fwd)(feats_t)
    jax.block_until_ready(raw)

    def f_outputs(raw):
        if mode == "color":
            return pb._raw_to_outputs_color(
                raw, grid_x, grid_y, res, res, jnp.zeros(3))
        return pb._raw_to_outputs(
            raw, grid_x, grid_y, res, res, cam.focal_x, cam.focal_y,
            jnp.zeros(3))

    cot = jnp.asarray(
        rng.normal(size=raw.shape).astype(np.float32)) * 1e-3

    def f_blend_bwd(feats_t, cot):
        _, vjp = jax.vjp(
            lambda ft: pb.blend_raw_packed(
                ft, counts, starts, scalars, grid_x, grid_y, False, mode),
            feats_t)
        return vjp(cot)

    def f_scatter(dfeats_t, gauss_id):
        # the gather's AD transpose: per-pair grads → per-gaussian rows
        _, vjp = jax.vjp(
            lambda f: jnp.pad(f[jnp.maximum(gauss_id, 0)],
                              ((0, 128), (0, 0))).T,
            jnp.zeros((n, lanes), jnp.float32))
        return vjp(dfeats_t)

    def f_proj_bwd(xyz, dproj):
        _, vjp = jax.vjp(f_project, xyz)
        return vjp(dproj)

    dproj = jax.tree.map(lambda a: a * 1e-3 if jnp.issubdtype(
        a.dtype, jnp.floating) else a, proj)

    stats = {
        "project_fwd": timeit(f_project, g.xyz),
        "binning_aligned": timeit(f_binning, proj),
        "pair_gather_T": timeit(f_gather, proj, pairs.gauss_id),
        "blend_fwd_kernel": timeit(f_blend_fwd, feats_t),
        "raw_to_outputs": timeit(f_outputs, raw),
        "blend_fwd+bwd_kernel": timeit(f_blend_bwd, feats_t, cot),
        "scatter_add_T": timeit(f_scatter, feats_t, pairs.gauss_id),
        "project_bwd": timeit(f_proj_bwd, g.xyz, dproj),
    }
    stats["blend_bwd_kernel(approx)"] = (
        stats["blend_fwd+bwd_kernel"] - stats["blend_fwd_kernel"])
    mp = int(np.asarray(jnp.sum(pairs.tile_count)))
    print(f"mode={mode} n={n} res={res} live_pairs={mp} "
          f"budget={args.max_pairs}")
    for k, v in stats.items():
        print(f"  {k:28s} {v:7.2f} ms")


if __name__ == "__main__":
    main()
