"""refine_parallel device-count sweep on the virtual CPU mesh.

Round-5 verdict item 5b: the "~18 ms/step at 4 chips" refine_parallel
prediction needs an artifact behind its CORRECTNESS half. This sweeps the
strip-sharded refine loop over 1/2/4/8 virtual devices x {10, 50} Adam
steps (densify ON, firing) and records the max parameter deviation vs the
single-device refine_run — committed as REFINE_PARALLEL_SWEEP.json.

Timing on the virtual mesh is meaningless (one physical CPU); the scaling
half of the prediction remains a cost model until multi-chip hardware is
reachable (BASELINE.md).

Run: python tools/tools_refine_parallel_sweep.py
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.parallel.mesh import make_mesh
from igs_tpu.stream.refine import (
    RefineConfig, init_refine_state, refine_run, refine_run_sharded,
)


def random_gaussians(n, seed):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    opacity = rng.normal(size=(n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    scaling = rng.uniform(-4, -2, (n, 3)).astype(np.float32)
    shs = 0.3 * rng.normal(size=(n, 16, 3)).astype(np.float32)
    return Gaussians.create(xyz, opacity, rot, scaling, shs)


def setup(res, n=384, cap=768, nviews=4, iters=10):
    rng = np.random.RandomState(0)
    g = random_gaussians(n=n, seed=5)
    cams = []
    for i in range(nviews):
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 4.0
        w2c[0, 3] = 0.2 * i
        cams.append(Camera.from_w2c(w2c, 0.9, 0.9, height=res, width=res))
    cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    gts = jnp.asarray(rng.uniform(0, 1, (nviews, 3, res, res)), jnp.float32)
    order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
    cfg = RefineConfig(
        use_densify=True, densification_interval=4,
        densify_grad_threshold=1e-6,
    )
    settings = RasterSettings(
        image_height=res, image_width=res, impl="pallas_packed",
        max_pairs=1 << 15, outputs="color", clamp_grads=False,
        pallas_interpret=True,
    )
    return init_refine_state(g, capacity=cap), cams, gts, order, cfg, settings


def main():
    results = []
    # 128² gives 8 tile rows -> up to 8 strips; densify fires in every run
    for iters in (10, 50):
        base = setup(res=128, iters=iters)
        state, cams, gts, order, cfg, settings = base
        ref = refine_run(state, cams, gts, order, jnp.zeros(3), cfg,
                         settings, jnp.float32(3.0), iters)
        ref_valid = int(jnp.sum(ref.gaussians.valid))
        for nsh in (1, 2, 4, 8):
            mesh = make_mesh(data=8 // nsh, tile=nsh)
            shd = refine_run_sharded(
                state, cams, gts, order, jnp.zeros(3), cfg, settings,
                jnp.float32(3.0), iters, mesh, axis="tile")
            dev = {}
            for name in ("xyz", "opacity", "scaling", "rotation", "shs"):
                a = np.asarray(getattr(ref.gaussians, name))
                b = np.asarray(getattr(shd.gaussians, name))
                dev[name] = float(np.abs(a - b).max())
            rec = {
                "iters": iters,
                "n_strips": nsh,
                "ref_valid": ref_valid,
                "shd_valid": int(jnp.sum(shd.gaussians.valid)),
                "densify_fired": ref_valid > 384,
                "max_abs_dev": dev,
                "equivalent": all(v < 5e-4 for v in dev.values())
                and ref_valid == int(jnp.sum(shd.gaussians.valid)),
            }
            print(rec)
            results.append(rec)

    out = {
        "what": "refine_run_sharded equivalence sweep on the 8-device "
                "virtual CPU mesh (128^2, densify on)",
        "all_equivalent": all(r["equivalent"] for r in results),
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "REFINE_PARALLEL_SWEEP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, "all_equivalent:", out["all_equivalent"])


if __name__ == "__main__":
    main()
