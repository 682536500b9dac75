"""Tune the triplane attention (B=5, H=8, L=8192, C=64): flash BlockSizes
sweep, bf16-input flash, and head-merged chunked variants."""

from __future__ import annotations

import time

import numpy as np


def timeit_scan(fn, args, K=4, iters=3):
    import jax
    import jax.numpy as jnp

    def repeated(*a):
        def body(c, i):
            a2 = list(a)
            a2[0] = a2[0] + (1e-6 * i).astype(a2[0].dtype)
            out = fn(*a2)
            return c + jnp.sum(out.astype(jnp.float32)) * 0.0, None
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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

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
    t = timeit_scan(lambda q: chunked(q, k, v), (q,))
    print(f"chunked f32 baseline: {t*1e3:7.2f} ms")

    for bq, bkM, bk in [(512, 1024, 512), (1024, 1024, 512),
                        (2048, 2048, 1024), (1024, 2048, 2048),
                        (2048, 1024, 1024)]:
        bs = BlockSizes(
            block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkM,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bkM, block_k_major_dq=bkM,
        )
        try:
            fl = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, sm_scale=scale, block_sizes=bs))(q, k, v)
            err = float(jnp.max(jnp.abs(ref - fl)))
            t = timeit_scan(
                lambda q: flash_attention(q, k, v, sm_scale=scale,
                                          block_sizes=bs), (q,))
            print(f"flash f32 bq={bq} bkM={bkM} bk={bk}: {t*1e3:7.2f} ms"
                  f"  err={err:.1e}")
        except Exception as e:
            print(f"flash f32 bq={bq} bkM={bkM} bk={bk}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    try:
        fl = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, sm_scale=scale))(qb, kb, vb)
        err = float(jnp.max(jnp.abs(ref - fl.astype(jnp.float32))))
        t = timeit_scan(
            lambda q: flash_attention(q, kb, vb, sm_scale=scale), (qb,))
        print(f"flash bf16 default blocks: {t*1e3:7.2f} ms  err={err:.1e}")
    except Exception as e:
        print(f"flash bf16: FAILED {type(e).__name__}: {str(e)[:100]}")

    # chunked with k/v in bf16, scores f32 (bandwidth halved, f32 softmax)
    def chunked_kvbf16(q, kb, vb):
        qc = q.reshape(B, H, 8, 1024, C).transpose(2, 0, 1, 3, 4)

        def block(qb_):
            s = jnp.einsum("bhlc,bhmc->bhlm", qb_.astype(jnp.bfloat16), kb,
                           preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            return jnp.einsum("bhlm,bhmc->bhlc", a, vb,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(block, qc)
        return out.transpose(1, 2, 0, 3, 4).reshape(B, H, L, C)

    out = jax.jit(chunked_kvbf16)(q, kb, vb)
    err = float(jnp.max(jnp.abs(ref - out)))
    t = timeit_scan(lambda q: chunked_kvbf16(q, kb, vb), (q,))
    print(f"chunked kv-bf16 f32-softmax: {t*1e3:7.2f} ms  err={err:.1e}")


if __name__ == "__main__":
    main()
