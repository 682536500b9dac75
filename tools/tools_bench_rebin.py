"""rebin_every sweep at production shape (VERDICT r3 item 1).

Measures the fused refine loop (50 iters, 150k Gaussians, 512²,
pallas_packed color) for rebin_every in {1,2,4,8} with the honest-tunnel
harness (igs_tpu/utils/devtime.py), plus the final-loss drift of the
stale-binning loop vs exact per-iteration binning on a real synthetic
target (quality guard — wall-clock alone can't justify adoption).

Run: nohup python tools_bench_rebin.py > /tmp/rebin_sweep.log 2>&1
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import RasterSettings, rasterize
from igs_tpu.stream.refine import RefineConfig, init_refine_state, refine_run
from igs_tpu.utils.devtime import timeit_device

n, res, iters, nviews = 150_000, 512, 50, 18
rng = np.random.RandomState(0)
g = Gaussians.create(
    rng.uniform(-2, 2, (n, 3)).astype(np.float32),
    rng.uniform(-2, 4, (n, 1)).astype(np.float32),
    (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
        rng.normal(size=(n, 4)).astype(np.float32)),
    rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32),
    np.concatenate([
        rng.uniform(-1, 2, (n, 1, 3)),
        0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32),
)
w2c = np.eye(4, dtype=np.float32)
w2c[2, 3] = 5.0
cams_list = []
for i in range(nviews):
    m = w2c.copy()
    m[0, 3] = 0.25 * (i % 5 - 2)
    m[1, 3] = 0.25 * (i // 5 - 1.5)
    cams_list.append(Camera.from_w2c(m, 0.9, 0.9, height=res, width=res))
cams = jax.tree.map(lambda *x: jnp.stack(x), *cams_list)
settings = RasterSettings(
    image_height=res, image_width=res, impl="pallas_packed",
    max_pairs=1 << 19, outputs="color", clamp_grads=False)

# real render targets: a perturbed copy of the scene renders the GTs so
# the refine loss is meaningful and the loop converges toward something
g_t = g.replace(xyz=g.xyz + 0.01 * rng.normal(size=(n, 3)).astype(np.float32))
render1 = jax.jit(lambda c: rasterize(
    means3d=g_t.get_xyz, opacity=g_t.get_opacity, scaling=g_t.get_scaling,
    rotation=g_t.get_rotation, camera=c, shs=g_t.shs,
    settings=settings)["color"])
gts = jnp.stack([render1(c) for c in cams_list])
float(jnp.sum(gts))  # force

order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
state = init_refine_state(g, capacity=n)

results = {}
final_imgs = {}
eval_cam = cams_list[0]
for k in (1, 2, 4, 8):
    cfg = RefineConfig(rebin_every=k)
    loop = jax.jit(lambda s, c=cfg: refine_run(
        s, cams, gts, order, jnp.zeros(3), c, settings,
        jnp.float32(3.0), iters))
    t = timeit_device(loop, state, K=2, iters=3)
    # quality: final state's render vs the GT on view 0
    out_state = loop(state)
    img = jax.jit(lambda gg: rasterize(
        means3d=gg.get_xyz, opacity=gg.get_opacity, scaling=gg.get_scaling,
        rotation=gg.get_rotation, camera=eval_cam, shs=gg.shs,
        valid=gg.valid, settings=settings)["color"])(out_state.gaussians)
    mse = float(jnp.mean((img - gts[0]) ** 2))
    psnr = -10 * np.log10(mse)
    nvalid = int(jnp.sum(out_state.gaussians.valid))
    results[k] = {
        "loop_s": t, "step_ms": t / iters * 1e3,
        "psnr_v0": psnr, "n_valid": nvalid,
    }
    print(f"rebin_every={k}: loop {t:.3f} s  step {t/iters*1e3:.2f} ms  "
          f"psnr(v0) {psnr:.3f} dB  n_valid {nvalid}", flush=True)

print(json.dumps(results, indent=2))
