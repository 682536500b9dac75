"""Pair-expansion construction A/B at 150k->524k (the 6.1 ms/step
binning hotspot): jnp.repeat vs scatter+cummax vs scatter-add+cumsum."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from igs_tpu.utils.devtime import timeit_device

n, max_pairs = 150_000, 1 << 19
rng = np.random.RandomState(0)
# realistic tiles_touched distribution (~428k total)
tt = rng.poisson(2.85, n).astype(np.int32)
tt = np.clip(tt, 0, 40)
packed = rng.randint(0, 1 << 20, (n, 5)).astype(np.int32)
tt_j = jnp.asarray(tt)
packed_j = jnp.asarray(packed)

def via_repeat(s, p, t):
    t = t + (s.astype(jnp.int32) % 2) * 0  # salt carrier (int args only)
    p = p + s.astype(jnp.int32)
    return jnp.repeat(p, t, axis=0, total_repeat_length=max_pairs)

def via_scatter_cummax(s, p, t):
    p = p + s.astype(jnp.int32)
    off = jnp.cumsum(t)
    base = jnp.concatenate([jnp.zeros(1, off.dtype), off[:-1]])
    start = jnp.full(max_pairs, -1, jnp.int32)
    # only gaussians with t>0 mark a start (clip base of empty rows)
    marks = jnp.where(t > 0, jnp.arange(n, dtype=jnp.int32), -1)
    start = start.at[jnp.clip(base, 0, max_pairs - 1)].max(marks,
                                                          mode="drop")
    gid = jax.lax.associative_scan(jnp.maximum, start)
    return p[jnp.clip(gid, 0, n - 1)]

def via_scatter_cumsum(s, p, t):
    p = p + s.astype(jnp.int32)
    off = jnp.cumsum(t)
    base = jnp.concatenate([jnp.zeros(1, off.dtype), off[:-1]])
    ones = jnp.where(t > 0, 1, 0).astype(jnp.float32)
    # f32 add-combiner scatter (vectorized path per PERF r3 item 13a)
    flags = jnp.zeros(max_pairs, jnp.float32).at[
        jnp.clip(base, 0, max_pairs - 1)].add(ones, mode="drop")
    gid = jnp.cumsum(flags).astype(jnp.int32) - 1
    return p[jnp.clip(gid, 0, n - 1)]

salt0 = jnp.float32(0.0)
r = jax.jit(via_repeat)(salt0, packed_j, tt_j)
a = jax.jit(via_scatter_cummax)(salt0, packed_j, tt_j)
total = int(np.minimum(np.cumsum(tt)[-1], max_pairs))
print("cummax matches:", bool(jnp.all(r[:total] == a[:total])))
b = jax.jit(via_scatter_cumsum)(salt0, packed_j, tt_j)
# cumsum variant differs where consecutive empty rows collapse; check on
# the same prefix
print("cumsum matches:", bool(jnp.all(r[:total] == b[:total])))
for name, fn in [("jnp.repeat", via_repeat),
                 ("scatter+cummax", via_scatter_cummax),
                 ("scatteradd+cumsum", via_scatter_cumsum)]:
    t = timeit_device(jax.jit(fn), jnp.float32(0.0), packed_j, tt_j,
                      K=16, iters=3, salt_scale=1.0)
    print(f"{name:18s}: {t*1e3:6.2f} ms", flush=True)
