import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import RasterSettings, rasterize

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
what = sys.argv[3] if len(sys.argv) > 3 else "fwd"
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

def fwd(x):
    return rasterize(means3d=x, opacity=g.get_opacity, scaling=g.get_scaling,
                     rotation=g.get_rotation, camera=cam, shs=g.shs,
                     valid=g.valid, settings=settings)["color"]

if what == "fwd":
    out = jax.jit(fwd)(g.xyz)
    jax.block_until_ready(out)
    print("fwd OK", float(jnp.sum(out)))
else:
    def loss(x):
        return jnp.mean(jnp.abs(fwd(x)))
    gr = jax.jit(jax.grad(loss))(g.xyz)
    jax.block_until_ready(gr)
    print("bwd OK", float(jnp.sum(gr)))
