"""Swin feature-transformer: flash (segment-id masks) vs XLA scores path.

Production shape: 40 images (B=5 candidates x 4 views x fwd/bwd pair
concat handled inside), 64x64 tokens, 128 channels, 6 layers.
"""
import os, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
from igs_tpu.models.swin import FeatureTransformer

b, c, h, w = 40, 128, 64, 64
rng = np.random.RandomState(0)
f0 = jnp.asarray(rng.randn(b, c, h, w), jnp.float32)
f1 = jnp.asarray(rng.randn(b, c, h, w), jnp.float32)
ft = FeatureTransformer(num_layers=6, d_model=c)
params = ft.init(jax.random.PRNGKey(0), f0[:1], f1[:1], attn_num_splits=2)
apply = jax.jit(lambda a, b2: ft.apply(params, a, b2, attn_num_splits=2))


def timeit(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


o_flash = apply(f0, f1)
t_flash = timeit(apply, f0, f1)
print(f"flash : {t_flash * 1e3:.1f} ms")

os.environ["IGS_TPU_NO_FLASH"] = "1"
apply2 = jax.jit(lambda a, b2: ft.apply(params, a, b2, attn_num_splits=2))
o_xla = apply2(f0, f1)
t_xla = timeit(apply2, f0, f1)
print(f"xla   : {t_xla * 1e3:.1f} ms")
d0 = float(jnp.abs(o_flash[0] - o_xla[0]).max())
s0 = float(jnp.abs(o_xla[0]).max())
print(f"max|d|/max|x| = {d0 / s0:.2e}")
assert d0 / s0 < 2e-3
print("swin flash check OK")
