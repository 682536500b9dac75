"""Numerics check: packed kernels (TRI-precision tril dots) vs the
windowed pallas path (all-HIGHEST) on the production-scale scene, on TPU.

The CPU parity tests can't see MXU precision (interpret mode dots are
f32-exact), so this is the on-device check that the 3-pass tril scans
stay inside the 2e-4 parity envelope."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import RasterSettings, rasterize

n, res = 150_000, 512
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
base = RasterSettings(image_height=res, image_width=res,
                      max_pairs=1 << 19, max_per_tile=1024, chunk=128)


def run(impl, outputs):
    s = base._replace(impl=impl, outputs=outputs)

    def fwd(x):
        return rasterize(means3d=x, opacity=g.get_opacity,
                         scaling=g.get_scaling, rotation=g.get_rotation,
                         camera=cam, shs=g.shs, valid=g.valid,
                         settings=s)["color"]

    img = jax.jit(fwd)(g.xyz)
    gr = jax.jit(jax.grad(lambda x: jnp.mean(jnp.abs(fwd(x)))))(g.xyz)
    return np.asarray(img), np.asarray(gr)


for outputs in ("color", "full"):
    a_img, a_gr = run("pallas", outputs)
    b_img, b_gr = run("pallas_packed", outputs)
    di = np.abs(a_img - b_img)
    dg = np.abs(a_gr - b_gr)
    gs = np.abs(a_gr).max() + 1e-12
    print(f"{outputs}: img max|d| {di.max():.2e} mean {di.mean():.2e} | "
          f"grad max|d|/scale {dg.max() / gs:.2e}")
    assert di.max() < 2e-3, "image mismatch beyond envelope"
    assert dg.max() / gs < 2e-3, "grad mismatch beyond envelope"
print("precision check OK")
