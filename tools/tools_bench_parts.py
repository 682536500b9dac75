"""Component-level probe: where do the 53-60 ms of refine fwd+bwd go?

Times the pallas blend kernels in isolation (fwd kernel, bwd kernel),
the window gather and its transpose (pair scatter + segment reduction),
and the projection VJP — plus flash vs chunked attention at the AGM
triplane shape (B=5, H=8, L=8192, C=64) with a numerics check.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit_scan(fn, args, K=8, iters=3):
    import jax
    import jax.numpy as jnp

    def repeated(*a):
        def body(c, i):
            a2 = list(a)
            a2[0] = a2[0] + 1e-6 * i
            out = fn(*a2)
            return c + jax.tree.reduce(
                lambda x, y: x + jnp.sum(y) * 0.0, out, 0.0), None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return c

    rj = jax.jit(repeated)
    jax.block_until_ready(rj(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(rj(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--maxpt", type=int, default=512)
    ap.add_argument("--what", default="all", choices=["blend", "attn", "all"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    if args.what in ("blend", "all"):
        from igs_tpu.core.camera import Camera
        from igs_tpu.core.gaussians import Gaussians
        from igs_tpu.ops.binning import build_tile_pairs, image_tile_grid
        from igs_tpu.ops.pallas_blend import (
            blend_raw, gather_tile_windows, pack_features)
        from igs_tpu.ops.projection import project

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
        grid_x, grid_y = image_tile_grid(res, res)
        T = grid_x * grid_y

        proj = jax.jit(lambda x: project(
            x, g.get_scaling, g.get_rotation, g.get_opacity, cam,
            shs=g.shs, sh_degree=3, kernel_size=0.0, valid=g.valid))(g.xyz)
        pairs = jax.jit(lambda p: build_tile_pairs(
            p, grid_x, grid_y, 1 << 19))(proj)
        counts = jnp.minimum(pairs.tile_count, args.maxpt).astype(jnp.int32)
        print("tile counts: max", int(pairs.tile_count.max()),
              "mean", float(pairs.tile_count.mean()),
              f"overflow@{args.maxpt}:",
              int((pairs.tile_count > args.maxpt).sum()))

        feats = jax.jit(pack_features)(proj)
        gathered = jax.jit(
            lambda f: gather_tile_windows(
                f, pairs.gauss_id, pairs.tile_start, args.maxpt)
        )(feats)
        scalars = jnp.concatenate(
            [jnp.asarray([grid_x], jnp.float32), jnp.zeros(7, jnp.float32)])

        # fwd kernel alone
        t = timeit_scan(
            lambda gth: blend_raw(gth, counts, scalars, grid_x, grid_y,
                                  args.chunk, False, "color"),
            (gathered,))
        print(f"blend fwd kernel: {t*1e3:7.2f} ms")

        # fwd+bwd kernels (vjp through blend_raw only)
        def fb(gth):
            out, vjp = jax.vjp(
                lambda z: blend_raw(z, counts, scalars, grid_x, grid_y,
                                    args.chunk, False, "color"), gth)
            return vjp(jnp.ones_like(out))[0]
        t = timeit_scan(fb, (gathered,))
        print(f"blend fwd+bwd kernels: {t*1e3:7.2f} ms")

        # gather fwd alone
        t = timeit_scan(
            lambda f: gather_tile_windows(
                f, pairs.gauss_id, pairs.tile_start, args.maxpt),
            (feats,))
        print(f"window gather fwd: {t*1e3:7.2f} ms")

        # gather fwd+transpose (scatter-add back to feats)
        def gfb(f):
            out, vjp = jax.vjp(
                lambda z: gather_tile_windows(
                    z, pairs.gauss_id, pairs.tile_start, args.maxpt), f)
            return vjp(jnp.ones_like(out))[0]
        t = timeit_scan(gfb, (feats,))
        print(f"window gather fwd+bwd: {t*1e3:7.2f} ms")

        # projection (+pack) fwd+bwd
        def pfb(x):
            def f(x, op, sc, ro, sh):
                p = project(x, sc, ro, op, cam, shs=sh, sh_degree=3,
                            kernel_size=0.0, valid=g.valid)
                return jnp.sum(pack_features(p))
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
                x, g.get_opacity, g.get_scaling, g.get_rotation, g.shs)
        t = timeit_scan(pfb, (g.xyz,))
        print(f"projection+pack fwd+bwd: {t*1e3:7.2f} ms")

    if args.what in ("attn", "all"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        B, H, L, C = 5, 8, 8192, 64
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
        scale = C ** -0.5

        def chunked(q, k, v):
            qc = q.reshape(B, H, 8, 1024, C).transpose(2, 0, 1, 3, 4)

            def block(qb):
                s = jnp.einsum("bhlc,bhmc->bhlm", qb, k,
                               preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
                return jnp.einsum("bhlm,bhmc->bhlc", a, v)

            out = jax.lax.map(block, qc)
            return out.transpose(1, 2, 0, 3, 4).reshape(B, H, L, C)

        ref = jax.jit(chunked)(q, k, v)
        fl = jax.jit(
            lambda q, k, v: flash_attention(q, k, v, sm_scale=scale))(q, k, v)
        err = float(jnp.max(jnp.abs(ref - fl)))
        print(f"attn flash vs chunked max abs err: {err:.3e}")

        t = timeit_scan(lambda q: chunked(q, k, v), (q,), K=4)
        print(f"attn chunked: {t*1e3:7.2f} ms")
        t = timeit_scan(
            lambda q: flash_attention(q, k, v, sm_scale=scale), (q,), K=4)
        print(f"attn flash:   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
