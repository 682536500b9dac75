"""Round-4 flash-attention probe at the triplane shape (honest-tunnel
harness; the round-2 bf16 numbers predate the tunnel/compiler change)."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention)
from igs_tpu.utils.devtime import timeit_device

B, H, L, C = 5, 8, 8192, 64
rng = np.random.RandomState(0)
q = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
k = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
v = jnp.asarray(rng.normal(size=(B, H, L, C)), jnp.float32)
scale = C ** -0.5

def bs(bq, bk, bkM):
    return BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
                      block_q_major_dkv=bq, block_k_major_dkv=bkM,
                      block_q_dkv=bq, block_k_dkv=bk,
                      block_q_dq=bq, block_k_dq=bkM, block_k_major_dq=bkM)

ref = None
for name, fn in [
    ("f32 512/512/1024", lambda q,k,v: flash_attention(q,k,v,sm_scale=scale,block_sizes=bs(512,512,1024))),
    ("f32 1024/1024/2048", lambda q,k,v: flash_attention(q,k,v,sm_scale=scale,block_sizes=bs(1024,1024,2048))),
    ("f32 2048/1024/2048", lambda q,k,v: flash_attention(q,k,v,sm_scale=scale,block_sizes=bs(2048,1024,2048))),
    ("bf16 512/512/1024", lambda q,k,v: flash_attention(
        q.astype(jnp.bfloat16),k.astype(jnp.bfloat16),v.astype(jnp.bfloat16),
        sm_scale=scale,block_sizes=bs(512,512,1024)).astype(jnp.float32)),
    ("bf16 1024/1024/2048", lambda q,k,v: flash_attention(
        q.astype(jnp.bfloat16),k.astype(jnp.bfloat16),v.astype(jnp.bfloat16),
        sm_scale=scale,block_sizes=bs(1024,1024,2048)).astype(jnp.float32)),
]:
    try:
        jfn = jax.jit(fn)
        out = jfn(q, k, v)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
        t = timeit_device(jfn, q, k, v, K=16, iters=3)
        print(f"{name:22s}: {t*1e3:7.2f} ms  maxerr={err:.2e}", flush=True)
    except Exception as e:
        print(f"{name:22s}: FAILED {type(e).__name__} {str(e)[:80]}", flush=True)
