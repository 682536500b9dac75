"""Real multi-process jax.distributed integration test.

Spawns TWO OS processes, each with 2 virtual CPU devices, bootstraps them
into one cluster via ``igs_tpu.parallel.distributed`` (the TPU-pod
replacement for the reference's Accelerate/DDP/NCCL rendezvous, SURVEY
§2.3), builds the global (data, tile) mesh over all 4 devices, and runs a
cross-process psum plus the per-host batch-slice and metric-gather
helpers. This exercises the actual jax.distributed wire protocol — the
rest of the suite only covers single-process virtual meshes.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from igs_tpu.parallel.distributed import (
        all_processes_mean, init_distributed, local_batch_slice,
        make_global_mesh)

    ok = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert ok, "init_distributed did not go multi-process"
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 2
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = make_global_mesh(tile=1)
    assert dict(mesh.shape) == {"data": 2 * nproc, "tile": 1}

    # per-host input pipeline: each process feeds only its batch slice
    g = np.arange(8, dtype=np.float32).reshape(4, 2)
    sl = local_batch_slice(4)
    assert sl == slice(pid * 2, pid * 2 + 2)
    arr = multihost_utils.host_local_array_to_global_array(
        g[sl], mesh, P("data"))

    # gradient-allreduce-shaped collective across the 4 devices (2 procs)
    f = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "data"),
        mesh=mesh, in_specs=P("data", None), out_specs=P()))
    total = f(arr)  # fully replicated global array
    got = float(np.asarray(total.addressable_data(0)))
    assert got == float(g.sum()), (got, float(g.sum()))

    # metric gather (gather_for_metrics parity)
    m = all_processes_mean(float(pid))
    assert m == (nproc - 1) / 2.0, m

    print("MULTIHOST_OK", pid, flush=True)
""")


def test_two_process_distributed(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-3000:]
