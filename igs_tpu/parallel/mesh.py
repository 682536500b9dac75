"""Device mesh and sharding layout for IGS-TPU.

TPU-native replacement for the reference's distribution stack (SURVEY.md
§2.3): HF Accelerate → torch DDP → NCCL becomes a `jax.sharding.Mesh` with
named axes and jit-placed XLA collectives over ICI/DCN — no process groups,
no NCCL env knobs (main.py:6-7), gradient all-reduce emitted by the
compiler and overlapped with backward automatically.

Axes:
  * ``data``  — scenes / frame-pairs (the reference's only parallelism,
    DDP over 4 GPUs, acc_cfg/default_config.yaml). Maps to hosts via DCN
    and chips via ICI.
  * ``tile``  — intra-frame parallelism over image tiles/pixels and
    Gaussian chunks, the axis the CUDA grid used to occupy one GPU;
    across chips it rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    tile: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, tile) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // tile
    assert data * tile == n, f"{data}×{tile} != {n} devices"
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over ``data``; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batched arrays with batch-axis sharding."""
    s = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, s)

    return jax.tree.map(place, batch)
