"""In-context segred-vs-scatter A/B for the COLOR backward, measured in
the fused 50-iter refine loop (r3b measured only the standalone fwd+bwd
program, where the scatter fuses with its preceding transpose; the
histogram-scatter removal showed in-loop serialization effects are ~6x
the isolated delta, so re-measure where it matters)."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
import importlib
R = importlib.import_module('igs_tpu.ops.rasterize')
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
    np.concatenate([rng.uniform(-1, 2, (n, 1, 3)),
        0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32))
w2c = np.eye(4, dtype=np.float32); w2c[2, 3] = 5.0
cams_list = []
for i in range(nviews):
    m = w2c.copy(); m[0, 3] = 0.25 * (i % 5 - 2)
    cams_list.append(Camera.from_w2c(m, 0.9, 0.9, height=res, width=res))
cams = jax.tree.map(lambda *x: jnp.stack(x), *cams_list)
settings = R.RasterSettings(
    image_height=res, image_width=res, impl="pallas_packed",
    max_pairs=1 << 19, outputs="color", clamp_grads=False)
gts = jnp.zeros((nviews, 3, res, res))
order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
state = init_refine_state(g, capacity=n)
cfg = RefineConfig(use_densify=False)

orig = R.build_tile_pairs
for mode in ("scatter", "segred"):
    if mode == "segred":
        R.build_tile_pairs = lambda p, gx, gy, mp, segred_aux=False: orig(
            p, gx, gy, mp, segred_aux=True)
    else:
        R.build_tile_pairs = orig
    loop = jax.jit(lambda s, m=mode: refine_run(
        s, cams, gts, order, jnp.zeros(3), cfg, settings,
        jnp.float32(3.0), iters))
    t = timeit_device(loop, state, K=2, iters=3)
    print(f"{mode:8s}: loop {t:.3f} s  step {t/iters*1e3:.2f} ms", flush=True)
R.build_tile_pairs = orig
