"""Cost model for replacing the pair->gaussian grad scatter-add.

Pieces: (a) the current (MP,16) -> (N,16) scatter-add, (b) a 524k-row
16-lane inverse-permutation gather, (c) a 524k i32 argsort (inverse perm
build, amortizable into binning), (d) a 150k boundary row gather.

NOTE on timing through the axon tunnel: block_until_ready does NOT block
(async submission); every measurement must fetch a scalar derived from
the output (float(...)) to force completion, and the op must be salted
per call (identical program+args returns a cached result).

Usage: python tools_bench_segred.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    print("devices:", jax.devices(), flush=True)

    n, mp, lanes = 150_000, 1 << 19, 16
    rng = np.random.RandomState(0)
    dpair = jnp.asarray(rng.normal(size=(mp, lanes)).astype(np.float32))
    gid = jnp.asarray(rng.randint(0, n, size=(mp,)).astype(np.int32))
    perm = jnp.asarray(rng.permutation(mp).astype(np.int32))
    brow = jnp.asarray(
        np.sort(rng.choice(mp, size=n, replace=False)).astype(np.int32))

    def timeit(name, fn, *xs, K=16, iters=3):
        def repeated(salt, *xs):
            out0 = fn(salt, *xs)

            def body(c, i):
                out = fn(salt + i, *xs)
                # carry full output so XLA cannot simplify the op away
                return out.astype(jnp.float32) + c * jnp.float32(1e-6), None

            c, _ = jax.lax.scan(body, out0.astype(jnp.float32),
                                jnp.arange(K, dtype=jnp.float32))
            return jnp.sum(c)

        rj = jax.jit(repeated)
        print(f"[compile] {name}", flush=True)
        float(rj(jnp.float32(0.0), *xs))
        ts = []
        for it in range(iters):
            t0 = time.perf_counter()
            float(rj(jnp.float32(it + 1.0), *xs))
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)

    timeit("noop-ish (scalar)", lambda s: s * 2.0)
    timeit("scatter-add (MP,16)->(N,16)",
           lambda s, d, g: jnp.zeros((n, lanes), jnp.float32).at[g].add(d + s),
           dpair, gid)
    timeit("row gather (MP,16) perm", lambda s, d, p: (d + s)[p], dpair, perm)
    timeit("argsort i32 (MP,)",
           lambda s, g: jnp.argsort(g + (s.astype(jnp.int32) % 2)), gid)
    timeit("boundary gather (N of MP,16)",
           lambda s, d, b: (d + s)[b], dpair, brow)


if __name__ == "__main__":
    main()
