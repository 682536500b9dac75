"""Probe: does an in-kernel (R,128)->(8R,16) reshape lower in Mosaic, and
does folded DMA fix the segscan kernel's 8x lane-padding waste?"""

from __future__ import annotations

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    from igs_tpu.utils.devtime import timeit_device

    mp, lanes = 1 << 19, 16
    mpf = mp // 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(mp, lanes)).astype(np.float32))

    # kernel A: pure copy through folded layout (DMA ceiling probe)
    def copy_kernel(xref, oref):
        oref[...] = xref[...] * 2.0

    def run_copy_folded(xx):
        y = xx.reshape(mpf, 128)
        out = pl.pallas_call(
            copy_kernel,
            grid=(mpf // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((mpf, 128), jnp.float32),
        )(y)
        return out.reshape(mp, lanes)

    t = timeit_device(run_copy_folded, x, K=16)
    print(f"copy folded (DMA ceiling): {t*1e3:.2f} ms", flush=True)

    # kernel B: same but through padded (R,16) blocks
    def run_copy_padded(xx):
        return pl.pallas_call(
            copy_kernel,
            grid=(mp // 4096,),
            in_specs=[pl.BlockSpec((4096, lanes), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((4096, lanes), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((mp, lanes), jnp.float32),
        )(xx)

    t = timeit_device(run_copy_padded, x, K=16)
    print(f"copy padded (MP,16): {t*1e3:.2f} ms", flush=True)

    # kernel C: folded DMA + in-kernel unfold reshape + refold
    def reshape_kernel(xref, oref):
        y = xref[...]  # (512, 128)
        z = y.reshape(512 * 8, 16) * 2.0
        oref[...] = z.reshape(512, 128)

    def run_reshape(xx):
        y = xx.reshape(mpf, 128)
        out = pl.pallas_call(
            reshape_kernel,
            grid=(mpf // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((mpf, 128), jnp.float32),
        )(y)
        return out.reshape(mp, lanes)

    try:
        t = timeit_device(run_reshape, x, K=16)
        print(f"folded + in-kernel unfold reshape: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"in-kernel reshape FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
