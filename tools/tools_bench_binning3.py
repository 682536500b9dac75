"""Micro-bench the aligned-binning internals and the bwd scatter-add.

Stages: depth argsort (150k), repeat expansion (524k), tile histogram,
the fused-key pair sort (655k incl. pad lanes), and — for the backward —
the (16, MPT) transpose vs the 428k-row scatter-add into 150k gaussians,
plus a sorted-segment alternative.

Usage: python tools_bench_binning3.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.ops import binning as bi
    from igs_tpu.ops.projection import TILE_X, project

    n, res, mp = 150_000, 512, 1 << 19
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
    gx = gy = res // TILE_X
    num_tiles = gx * gy

    proj = jax.jit(lambda x: project(
        means3d=x, opacity=g.get_opacity[:, 0], scaling=g.get_scaling,
        rotation=g.get_rotation, shs=g.shs, valid=g.valid, camera=cam,
        kernel_size=0.0, geometry=False))(g.xyz)
    jax.block_until_ready(proj)

    def timeit(fn, *xs, K=8, iters=3):
        def repeated(*xs):
            def body(c, i):
                def pert(a):
                    if jnp.issubdtype(a.dtype, jnp.floating):
                        return a + jnp.asarray(1e-6 * i, a.dtype)
                    return a
                out = fn(*[jax.tree.map(pert, x) for x in xs])
                return c + jax.tree.reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))) * 1e-12,
                    out, jnp.float32(0.0)), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(K, dtype=jnp.float32))
            return c
        rj = jax.jit(repeated)
        jax.block_until_ready(rj(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.time()
            jax.block_until_ready(rj(*xs))
            ts.append(time.time() - t0)
        return float(np.median(ts)) / K * 1e3

    # --- binning stage splits -------------------------------------------
    def f_argsort(proj):
        depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
        return jnp.argsort(depth_key)

    order = jax.jit(f_argsort)(proj)

    def f_expand(proj, order):
        rect_min = proj.rect_min[order]
        rect_max = proj.rect_max[order]
        tiles_touched = proj.tiles_touched[order]
        offsets = jnp.cumsum(tiles_touched)
        total = offsets[-1]
        slots = jnp.arange(mp, dtype=jnp.int32)
        base = jnp.concatenate([jnp.zeros(1, offsets.dtype), offsets[:-1]])
        packed = jnp.stack([
            rect_min[:, 0], rect_min[:, 1],
            jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1),
            base.astype(jnp.int32), order.astype(jnp.int32)], axis=1)
        exp = jnp.repeat(packed, tiles_touched, axis=0,
                         total_repeat_length=mp)
        local = slots - exp[:, 3]
        rw_f = exp[:, 2].astype(jnp.float32)
        q = jnp.floor(local.astype(jnp.float32) / rw_f).astype(jnp.int32)
        tile_x = exp[:, 0] + (local - q * exp[:, 2])
        tile_y = exp[:, 1] + q
        pair_valid = slots < total
        tile_id = jnp.where(pair_valid, tile_y * gx + tile_x,
                            num_tiles).astype(jnp.int32)
        gauss_id = jnp.where(pair_valid, exp[:, 4], -1)
        return tile_id, gauss_id

    tile_id, gauss_id = jax.jit(f_expand)(proj, order)

    def f_hist(tile_id):
        return bi._tile_histogram(tile_id, num_tiles + 1)

    counts = jax.jit(f_hist)(tile_id)[:num_tiles]

    def f_sort_aligned(tile_id, gauss_id, counts):
        pad_t = (-counts) % bi.PAIR_ALIGN
        j = jnp.arange(bi.PAIR_ALIGN, dtype=jnp.int32)
        pad_tile_id = jnp.where(
            j[None, :] < pad_t[:, None],
            jnp.arange(num_tiles, dtype=jnp.int32)[:, None],
            num_tiles).reshape(-1)
        pad_gauss_id = jnp.full(num_tiles * bi.PAIR_ALIGN, -1, jnp.int32)
        return bi._sort_pairs(
            jnp.concatenate([tile_id, pad_tile_id]),
            jnp.concatenate([gauss_id, pad_gauss_id]), num_tiles)

    def f_sort_plain(tile_id, gauss_id):
        return bi._sort_pairs(tile_id, gauss_id, num_tiles)

    print(f"binning internals at {res}²/{n}, budget {mp}:")
    print(f"  argsort_depth        {timeit(f_argsort, proj):7.2f} ms")
    print(f"  repeat_expand        {timeit(f_expand, proj, order):7.2f} ms")
    print(f"  histogram            {timeit(f_hist, tile_id):7.2f} ms")
    print(f"  sort 524k (plain)    "
          f"{timeit(f_sort_plain, tile_id, gauss_id):7.2f} ms")
    print(f"  sort 655k (aligned)  "
          f"{timeit(f_sort_aligned, tile_id, gauss_id, counts):7.2f} ms")

    # --- backward scatter alternatives ----------------------------------
    mpt = mp + num_tiles * bi.PAIR_ALIGN
    lanes = 16
    dft = jnp.asarray(rng.normal(size=(lanes, mpt)).astype(np.float32))
    gid = jnp.asarray(
        rng.randint(0, n, size=(mpt,)).astype(np.int32))

    def f_transpose(dft):
        return dft.T + 0.0

    def f_scatter(dft, gid):
        d = dft.T
        return jnp.zeros((n, lanes), jnp.float32).at[
            jnp.maximum(gid, 0)].add(d)

    def f_scatter_notr(dfe, gid):
        return jnp.zeros((n, lanes), jnp.float32).at[
            jnp.maximum(gid, 0)].add(dfe)

    dfe = jnp.asarray(dft.T)

    # sorted-segment alternative: pairs sorted by gaussian id
    perm = jnp.asarray(np.argsort(np.asarray(gid), kind="stable")
                       .astype(np.int32))
    gid_sorted = gid[perm]

    def f_sorted_seg(dfe, perm, gid_sorted):
        d = dfe[perm]  # wide row gather into gaussian order
        return jax.ops.segment_sum(
            d, gid_sorted, num_segments=n, indices_are_sorted=True)

    print("backward scatter alternatives (655k pairs, 16 lanes → 150k):")
    print(f"  transpose only       {timeit(f_transpose, dft):7.2f} ms")
    print(f"  transpose+scatter    {timeit(f_scatter, dft, gid):7.2f} ms")
    print(f"  scatter (pre-T)      {timeit(f_scatter_notr, dfe, gid):7.2f} ms")
    print(f"  perm-gather+seg_sum  "
          f"{timeit(f_sorted_seg, dfe, perm, gid_sorted):7.2f} ms")


if __name__ == "__main__":
    main()
