"""Isolated segscan kernel + full segred bwd chain timings."""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.ops.segred import segment_sum_sorted, segmented_scan
    from igs_tpu.utils.devtime import timeit_device

    n, mp = 150_000, 1 << 19
    rng = np.random.RandomState(0)
    counts = rng.randint(0, 6, size=n)
    total = min(int(counts.sum()), mp)
    exp_gauss = np.full(mp, -1, np.int32)
    exp_gauss[:total] = np.repeat(
        np.arange(n), counts).astype(np.int32)[:total]
    ends = np.cumsum(counts) - 1
    last_row = np.where(counts > 0, np.minimum(ends, mp - 1), -1)
    base = np.cumsum(counts) - counts
    last_row = np.where(base < mp, last_row, -1).astype(np.int32)
    ids = jnp.asarray(exp_gauss)
    lr = jnp.asarray(last_row)
    perm = jnp.asarray(rng.permutation(mp).astype(np.int32))

    for lanes in (16, 32):
        x = jnp.asarray(rng.normal(size=(mp, lanes)).astype(np.float32))
        t = timeit_device(lambda a: segmented_scan(a, ids), x, K=16)
        print(f"segscan kernel (MP,{lanes}): {t*1e3:.2f} ms", flush=True)
        t = timeit_device(
            lambda a: segment_sum_sorted(a[perm], ids, lr), x, K=16)
        print(f"full segred chain (MP,{lanes}): {t*1e3:.2f} ms", flush=True)
        t = timeit_device(
            lambda a: jnp.zeros((n, lanes), jnp.float32).at[
                jnp.maximum(ids, 0)].add(a),
            x, K=16)
        print(f"scatter-add (MP,{lanes}): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
