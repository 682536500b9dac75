"""Cost of the pair-gather and its AD transpose (scatter-add) at scale."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np

N, MP, L = 150_000, 1 << 19, 32
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(N, L), jnp.float32)
ids = jnp.asarray(rng.randint(0, N, MP), jnp.int32)
w = jnp.asarray(rng.randn(MP, L), jnp.float32)


def timeit(fn, *args, K=10):
    def rep(*a):
        def body(c, i):
            return c + fn(a[0] + 1e-9 * i, *a[1:]), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(K))[0]
    f = jax.jit(rep)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / K


fwd = lambda f: jnp.sum(f[ids] * w)
print(f"gather fwd      : {timeit(fwd, feats) * 1e3:.2f} ms")
g = lambda f: jnp.sum(jax.grad(fwd)(f))
print(f"gather fwd+AD   : {timeit(lambda f: jnp.sum(jax.grad(fwd)(f)), feats) * 1e3:.2f} ms")
# sorted-segment alternative for the transpose
sids = jnp.sort(ids)


def seg(f):
    d = w  # pretend cotangent
    return jnp.sum(jax.ops.segment_sum(d, sids, num_segments=N))


print(f"sorted segsum   : {timeit(lambda f: seg(f) + f[0,0], feats) * 1e3:.2f} ms")
