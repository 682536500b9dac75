"""Isolate refine_run overhead: loop with/without densify, vs bare steps."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.stream.refine import RefineConfig, init_refine_state, refine_run

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
w2c = np.eye(4, dtype=np.float32); w2c[2, 3] = 5.0
cam = Camera.from_w2c(w2c, 0.9, 0.9, height=res, width=res)
settings = RasterSettings(
    image_height=res, image_width=res, impl="pallas_packed",
    max_pairs=1 << 19, outputs="color", clamp_grads=False)
gts = jnp.zeros((nviews, 3, res, res))
cams = jax.tree.map(lambda *x: jnp.stack(x), *[cam for _ in range(nviews)])
order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
state = init_refine_state(g, capacity=n)


def timeit(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


for dens in (True, False):
    cfg = RefineConfig(use_densify=dens)
    loop = jax.jit(lambda s, c=cfg: refine_run(
        s, cams, gts, order, jnp.zeros(3), c, settings,
        jnp.float32(3.0), iters))
    t = timeit(loop, state)
    print(f"densify={dens}: loop {t * 1e3:.1f} ms "
          f"({t / iters * 1e3:.2f} ms/iter)")
