"""Device timing that stays honest through the axon TPU tunnel.

Two tunnel behaviors (PERF.md round 3, re-verified round 3b) make naive
timing silently wrong:

  1. **Result caching** — submitting the exact same jitted program with
     the exact same argument buffers returns a cached result (~0.01 ms
     for a 13 ms scatter). Every timed call must be *salted*.
  2. **Async submission** — ``jax.block_until_ready`` returns before the
     device finishes (round 3b: an 8192³ matmul "completed" in 1.5 ms).
     Completion must be forced by fetching a scalar that data-depends on
     the output (``float(...)`` / device-to-host).

``timeit_device`` handles both: it wraps ``fn`` in a jitted program that
runs K+1 salted repetitions under one dispatch (amortizing the ~1.6 ms
fetch round-trip), reduces every output leaf into a carried f32 scalar
(so no part of the computation is dead), and times ``float(...)`` of the
result.
"""

from __future__ import annotations

import time


def _sum_out(out):
    import jax
    import jax.numpy as jnp

    def red(acc, x):
        x = jnp.asarray(x)
        if not jnp.issubdtype(x.dtype, jnp.number):
            return acc
        return acc + jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-12)

    return jax.tree.reduce(red, out, jnp.float32(0.0))


def _salt_args(args, salt, scale):
    """Perturb the first floating leaf by ``salt * scale``."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(args)
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            leaves[i] = leaf + (salt * scale).astype(leaf.dtype)
            return jax.tree.unflatten(treedef, leaves)
    raise ValueError("timeit_device needs at least one floating-point arg "
                     "to salt")


def timeit_device(fn, *args, K=8, iters=3, salt_scale=1e-9, reducer="median"):
    """Median (or min) per-call seconds of ``fn(*args)`` on the device.

    K+1 salted repetitions run inside one jitted ``lax.scan`` dispatch;
    the returned scalar is fetched to host to force completion. The salt
    perturbs the first floating-point argument leaf by ``salt_scale``
    per repetition (keep it small enough not to change control flow /
    work size, large enough to defeat value caching).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    scale = jnp.float32(salt_scale)

    def repeated(salt, *a):
        out0 = _sum_out(fn(*_salt_args(a, salt, scale)))

        def body(c, i):
            out = _sum_out(fn(*_salt_args(a, salt + i + 1.0, scale)))
            return c + out, None

        c, _ = jax.lax.scan(body, out0, jnp.arange(K, dtype=jnp.float32))
        return c

    rj = jax.jit(repeated)
    float(rj(jnp.float32(0.0), *args))  # compile + warm
    ts = []
    for it in range(iters):
        t0 = time.perf_counter()
        float(rj(jnp.float32((it + 1) * (K + 1)), *args))
        ts.append((time.perf_counter() - t0) / (K + 1))
    return float(np.median(ts) if reducer == "median" else np.min(ts))
