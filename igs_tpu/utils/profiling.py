"""Tracing, timing, memory stats, and debug snapshots.

TPU-native replacements for the reference's aux subsystems (SURVEY.md §5):
  * wall-clock step timers (infer_batch.py AGM_times/per_frame_times) →
    ``StepTimer`` with device synchronization;
  * nvidia-smi VRAM polling (monitor_vram_pro.sh) → ``device_memory_stats``
    from the JAX runtime;
  * CUDA snapshot_fw.dump on kernel failure (…_rade/__init__.py:86-93) →
    ``debug_dump_on_nonfinite`` saving offending inputs as .npz;
  * torch profiler absence → ``trace`` context manager around
    jax.profiler for TensorBoard-viewable traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax


class StepTimer:
    """Accumulates device-synchronized step durations."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.time() - self._t0
        self.durations.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        self.start()
        out = {}
        yield out
        self.stop(out.get("result"))

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {"count": 0}
        d = np.asarray(self.durations)
        return {
            "count": len(d),
            "mean_s": float(d.mean()),
            "median_s": float(np.median(d)),
            "p90_s": float(np.percentile(d, 90)),
            "total_s": float(d.sum()),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device live-bytes stats (replaces torch.cuda.mem_get_info polls,
    main.py:312-319)."""
    out = {}
    for d in jax.local_devices():
        try:
            st = d.memory_stats()
        except Exception:
            st = None
        if st:
            out[str(d)] = {
                "bytes_in_use_mb": st.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": st.get("peak_bytes_in_use", 0) / 2**20,
                "bytes_limit_mb": st.get("bytes_limit", 0) / 2**20,
            }
    return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard-compatible)."""
    os.makedirs(logdir, exist_ok=True)
    try:
        jax.profiler.start_trace(logdir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def debug_dump_on_nonfinite(workspace: str, tag: str, **arrays) -> bool:
    """If any array is non-finite, dump ALL of them and return True.

    The streaming/training drivers call this around rasterizer outputs when
    debug mode is on — the TPU analog of the CUDA snapshot_fw.dump flow.
    """
    bad = False
    for v in arrays.values():
        a = np.asarray(v)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad = True
            break
    if bad:
        os.makedirs(workspace, exist_ok=True)
        path = os.path.join(workspace, f"snapshot_{tag}.npz")
        np.savez_compressed(
            path, **{k: np.asarray(v) for k, v in arrays.items()}
        )
    return bad


class JsonlLogger:
    """Append-only scalar logging (replaces TensorBoard scalars)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, step: int, **scalars):
        rec = {"step": step}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
