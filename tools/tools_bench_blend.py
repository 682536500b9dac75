"""Sweep pallas blend kernel knobs: chunk size, tiles-per-block cap,
max_per_tile, for fwd and fwd+bwd at the production shape (512², 150k).

The per-tile while_loop pays chunk²·P triangular matmuls per chunk step
regardless of how full the tile is (avg pairs/tile ≈ 128 at N3DV scale),
and the backward's tiles_per_block cap of 2 quadruples its grid steps vs
forward — both knobs have never been swept at production scale.

Usage: python tools_bench_blend.py [--maxpt 1024 512] [--chunks 64 128 256]
"""

from __future__ import annotations

import argparse
import itertools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--chunks", type=int, nargs="*", default=[64, 128, 256])
    ap.add_argument("--maxpt", type=int, nargs="*", default=[512, 1024])
    ap.add_argument("--mode", default="color", choices=["color", "full"])
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--bwd-tpb", type=int, nargs="*", default=None,
                    help="also sweep the backward tiles-per-block cap")
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "pallas_packed"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.ops.rasterize import RasterSettings, rasterize

    n, res = args.n, args.res
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

    def timeit(fn, x, K=args.K, iters=3):
        def repeated(x):
            def body(c, i):
                out = fn(x + 1e-6 * i)
                return c + jax.tree.reduce(
                    lambda a, b: a + jnp.sum(b) * 0.0, out, 0.0), None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c
        rj = jax.jit(repeated)
        jax.block_until_ready(rj(x))
        ts = []
        for _ in range(iters):
            t0 = time.time()
            jax.block_until_ready(rj(x))
            ts.append(time.time() - t0)
        return float(np.median(ts)) / K

    print(f"mode={args.mode} n={n} res={res}")
    for chunk, maxpt in itertools.product(args.chunks, args.maxpt):
        settings = RasterSettings(
            image_height=res, image_width=res, impl=args.impl,
            max_pairs=1 << 19, max_per_tile=maxpt, chunk=chunk,
            outputs=args.mode, clamp_grads=False,
        )

        def fwd(x):
            return rasterize(
                means3d=x, opacity=g.get_opacity, scaling=g.get_scaling,
                rotation=g.get_rotation, camera=cam, shs=g.shs,
                valid=g.valid, settings=settings)["color"]

        def fb(x):
            def loss(x, op, sc, ro, sh):
                out = rasterize(
                    means3d=x, opacity=op, scaling=sc, rotation=ro,
                    camera=cam, shs=sh, valid=g.valid, settings=settings)
                return jnp.mean(jnp.abs(out["color"]))
            gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                x, g.get_opacity, g.get_scaling, g.get_rotation, g.shs)
            return gr

        from igs_tpu.ops import pallas_blend as pb
        for btpb in (args.bwd_tpb or [pb._BWD_MAX_TPB]):
            pb._BWD_MAX_TPB = btpb
            try:
                t_f = timeit(fwd, g.xyz)
                t_fb = timeit(fb, g.xyz)
                print(f"chunk={chunk:4d} maxpt={maxpt:5d} btpb={btpb}  "
                      f"fwd={t_f*1e3:7.2f} ms  fwd+bwd={t_fb*1e3:7.2f} ms")
            except Exception as e:
                print(f"chunk={chunk:4d} maxpt={maxpt:5d} btpb={btpb}  "
                      f"FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
