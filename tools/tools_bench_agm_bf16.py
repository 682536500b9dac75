"""A/B the per-module bf16 flags on the full AGM forward (r4; the r2
'wholesale bf16 7x slower' predates both the per-module dtype plumbing
and the tunnel/compiler change)."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.models.agm import AGMNet
from igs_tpu.ops.anchors import select_anchors
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.utils.devtime import timeit_device

n, a, res, b, hw = 150_000, 8192, 512, 5, 512
rng = np.random.RandomState(0)
g = Gaussians.create(
    rng.uniform(-2, 2, (n, 3)).astype(np.float32),
    rng.uniform(-2, 4, (n, 1)).astype(np.float32),
    (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
        rng.normal(size=(n, 4)).astype(np.float32)),
    rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32),
    np.concatenate([rng.uniform(-1, 2, (n, 1, 3)),
        0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32))
bbox = jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]])
settings = RasterSettings(
    image_height=res, image_width=res, impl="pallas_packed",
    max_pairs=1 << 19, max_per_tile=1024, chunk=128,
    clamp_grads=True, outputs="color")
depth_settings = settings._replace(
    image_height=128, image_width=128, max_pairs=1 << 16,
    max_per_tile=512, outputs="color_depth")
state1 = select_anchors(g.xyz, bbox, valid=g.valid, anchor_size=a, k=8,
                        exact_knn=False)
astate = jax.tree.map(lambda x: jnp.stack([x] * b), state1)
gb = jax.tree.map(lambda x: jnp.stack([x] * b), g)
h8 = hw // 8 * 2
c2w = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1)); c2w[:, :, 2, 3] = -5.0
batch = {
    "cur_images_input": jnp.asarray(rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
    "next_images_input": jnp.asarray(rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
    "depth": jnp.asarray(rng.uniform(2, 6, (b, 4, hw, hw)), jnp.float32),
    "local_rays": jnp.asarray(rng.normal(size=(b, h8, h8, 3)), jnp.float32),
    "FOV": jnp.full((b, 2), 0.9),
    "c2w_input": jnp.asarray(c2w),
    "c2w_output": jnp.asarray(np.concatenate([c2w[:, :1], c2w], axis=1)),
    "background_color": jnp.zeros((b, 3)),
}
ref_img = None
for name, kw in [
    ("f32 baseline", {}),
    ("ft_bf16", dict(ft_bf16=True)),
    ("encoder_bf16", dict(encoder_bf16=True)),
    ("cnn_bf16", dict(cnn_bf16=True)),
    ("all three", dict(ft_bf16=True, encoder_bf16=True, cnn_bf16=True)),
]:
    model = AGMNet(**kw)
    params = jax.jit(lambda r, m=model: m.init(
        r, batch, astate, gb, settings, depth_settings=depth_settings))(
        jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, bt, m=model: m.apply(
        p, bt, astate, gb, settings, depth_settings=depth_settings,
        shared_cur=True)["images_pred"])
    img = fn(params, batch)
    if ref_img is None:
        ref_img = img
        err = 0.0
    else:
        err = float(jnp.max(jnp.abs(img - ref_img)))
    t = timeit_device(fn, params, batch, K=4, iters=3)
    print(f"{name:14s}: {t*1e3:7.1f} ms  max|dimg|={err:.2e}", flush=True)
