"""Persistent XLA compilation cache for the CLI drivers.

The reference's CUDA extensions are precompiled, so every process start
is cheap; our jit-compiled programs pay a 1-2 minute first-compile per
process unless the persistent cache is on. The test suite already enables
it (tests/conftest.py); this helper brings the CLI drivers (train_agm,
infer_stream, build_frame0, roofline) to the same footing so repeated
runs — sweeps, quality-gate ladders, resumed training — reuse compiled
executables across processes.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Enable JAX's on-disk compilation cache (idempotent, best-effort).

    ``IGS_TPU_CACHE_DIR`` overrides the location; set it to an empty
    string to disable entirely (e.g. for clean-compile benchmarking).
    """
    env = os.environ.get("IGS_TPU_CACHE_DIR")
    if env == "":
        return
    cache_dir = path or env or "/tmp/jax_cache"
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
