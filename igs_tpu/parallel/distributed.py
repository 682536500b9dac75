"""Multi-host (pod) initialization and hybrid DCN×ICI mesh construction.

TPU-native replacement for the reference's multi-process story (SURVEY
§2.3: HF Accelerate → torch DDP → NCCL over 4 GPUs on one machine;
acc_cfg/default_config.yaml). On TPU pods:

  * process bootstrap = ``jax.distributed.initialize()`` — reads the
    TPU coordinator from the environment on Cloud TPU; explicit
    coordinator/process args for manual clusters (replacing torchrun's
    rendezvous + NCCL env knobs, main.py:6-7).
  * the ``data`` axis spans HOSTS over DCN (gradient all-reduce between
    hosts) and chips over ICI within a host; collectives are compiler-
    placed so DCN traffic only carries the inter-host segment.
  * per-host input pipelines feed only the local shard
    (``local_batch_slice``), metric gather = ``process_allgather``.

A single-process run degrades gracefully: ``init_distributed`` is a no-op
when no cluster environment is present, and the mesh falls back to the
local-device mesh — so the same driver binary serves one chip, one host,
and N hosts (BASELINE ≥80% multi-host scaling target).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if a multi-process runtime was initialized. Safe to call
    unconditionally: with no arguments and no cluster env (Cloud TPU
    metadata, SLURM, or JAX_COORDINATOR_ADDRESS), it stays single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # NOTE: do NOT key off TPU_WORKER_HOSTNAMES — single-chip tunnel
    # environments (axon) set it spuriously; require an explicit
    # coordinator or process count to go multi-process.
    in_cluster = (
        coordinator_address is not None
        or int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1
    )
    if not in_cluster and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_global_mesh(tile: int = 1) -> Mesh:
    """(data, tile) mesh over ALL processes' devices.

    The device array is laid out host-major so the ``data`` axis's
    inter-host segment maps to DCN and the intra-host segment plus the
    ``tile`` axis ride ICI — the layout `mesh_utils.create_hybrid_device_mesh`
    would produce for (num_hosts·local/tile, tile).
    """
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    assert n % tile == 0, f"{n} devices not divisible by tile={tile}"
    arr = np.asarray(devices).reshape(n // tile, tile)
    return Mesh(arr, ("data", "tile"))


def local_batch_slice(global_batch: int) -> slice:
    """The [start, end) range of the global batch this process feeds.

    Per-host data loading (each host reads only its shard — the
    reference's DDP sampler equivalent).
    """
    per = global_batch // jax.process_count()
    r = jax.process_index()
    return slice(r * per, (r + 1) * per)


def all_processes_mean(x) -> float:
    """Scalar metric mean across hosts (gather_for_metrics parity,
    main.py:353-354)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray(x))
    return float(np.mean(vals))
