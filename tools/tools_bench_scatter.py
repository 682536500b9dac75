"""Scatter-add alternatives for the blend backward's pair→gaussian reduce.

The (MPT, 16) → (N, 16) add-combiner scatter measured ~13 ms at 655k/150k
(tools_bench_binning3), ~1/3 of the whole rasterize backward. Candidates:
lane splits, sorted-indices hints, unique hints, and a sort-free
cumsum+boundary segmented sum exploiting that expansion-order pairs are
CONTIGUOUS per gaussian.

Usage: python tools_bench_scatter.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    n, mpt, lanes = 150_000, (1 << 19) + 131072, 16
    rng = np.random.RandomState(0)
    dfe_np = rng.normal(size=(mpt, lanes)).astype(np.float32)
    # realistic ids: ~428k live pairs, contiguous-ish per gaussian in
    # expansion order; sorted-pair order is tile-major (≈random walk)
    gid_np = rng.randint(0, n, size=(mpt,)).astype(np.int32)
    dfe = jnp.asarray(dfe_np)
    gid = jnp.asarray(gid_np)

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

    def f_base(dfe, gid):
        return jnp.zeros((n, lanes), jnp.float32).at[gid].add(dfe)

    def f_8x2(dfe, gid):
        o1 = jnp.zeros((n, 8), jnp.float32).at[gid].add(dfe[:, :8])
        o2 = jnp.zeros((n, 8), jnp.float32).at[gid].add(dfe[:, 8:])
        return jnp.concatenate([o1, o2], axis=1)

    def f_32pad(dfe, gid):
        d = jnp.pad(dfe, ((0, 0), (0, 32 - lanes)))
        return jnp.zeros((n, 32), jnp.float32).at[gid].add(d)[:, :lanes]

    # cumsum + boundary difference over contiguous segments (expansion
    # order): seg s occupies [base[s], base[s]+len[s])
    n_seg = n
    seg_len_np = np.zeros(n_seg, np.int64)
    np.add.at(seg_len_np, np.sort(gid_np), 1)
    # build a contiguous-segment id array for the alternative layout
    gid_contig = jnp.asarray(np.sort(gid_np))
    base = jnp.asarray(
        (np.cumsum(seg_len_np) - seg_len_np).astype(np.int32))
    ends = jnp.asarray((np.cumsum(seg_len_np) - 1).astype(np.int32))
    has = jnp.asarray((seg_len_np > 0))

    def f_cumsum(dfe, base, ends):
        c = jnp.cumsum(dfe, axis=0)
        c = jnp.concatenate([jnp.zeros((1, lanes), jnp.float32), c], 0)
        return jnp.where(
            has[:, None], c[ends + 1] - c[base], 0.0)

    def f_segsum_sorted(dfe, gid_contig):
        return jax.ops.segment_sum(
            dfe, gid_contig, num_segments=n, indices_are_sorted=True)

    # matmul reduction via 1024-bucket two-level: pairs → (buckets) via
    # in-bucket one-hot matmul is O(mpt·buckets) — too big; skip.

    print(f"pair→gaussian reduce, {mpt} pairs × {lanes} lanes → {n} rows:")
    print(f"  at[].add (16)          {timeit(f_base, dfe, gid):7.2f} ms")
    print(f"  at[].add 8+8           {timeit(f_8x2, dfe, gid):7.2f} ms")
    print(f"  at[].add pad→32        {timeit(f_32pad, dfe, gid):7.2f} ms")
    print(f"  segsum sorted ids      "
          f"{timeit(f_segsum_sorted, dfe, gid_contig):7.2f} ms")
    print(f"  cumsum+boundaries      "
          f"{timeit(f_cumsum, dfe, base, ends):7.2f} ms")


if __name__ == "__main__":
    main()
