"""Differential AGM stage costs: time the WHOLE forward vs truncated
forwards (motion-only, +triplane, +decode) — the standalone stage timings
don't add up to the in-context total (renders measured 565 ms standalone
vs a 310 ms whole forward)."""
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
    image_height=128, image_width=128, max_pairs=1 << 18,
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
model = AGMNet()
params = jax.jit(lambda r: model.init(
    r, batch, astate, gb, settings, depth_settings=depth_settings))(
    jax.random.PRNGKey(0))

def motion_only(p, bt):
    def m(mod, bt):
        bsz, v, c, hh, ww = bt["cur_images_input"].shape
        nxt = bt["next_images_input"].reshape(-1, c, hh, ww)
        cur = bt["cur_images_input"][0]
        mo = mod.motion_features(cur, nxt, cur_tile=bsz)
        mo = mod.condition3d(mo, bt["local_rays"], bt["depth"])
        return mo
    return model.apply(p, bt, method=m)

def to_triplane(p, bt):
    def m(mod, bt):
        mo = motion_m(mod, bt)
        return mod.triplane_encoder(
            mo, astate.anchor_points, bt["FOV"], bt["c2w_input"])
    def motion_m(mod, bt):
        bsz, v, c, hh, ww = bt["cur_images_input"].shape
        nxt = bt["next_images_input"].reshape(-1, c, hh, ww)
        cur = bt["cur_images_input"][0]
        mo = mod.motion_features(cur, nxt, cur_tile=bsz)
        return mod.condition3d(mo, bt["local_rays"], bt["depth"])
    return model.apply(p, bt, method=m)

def to_decode(p, bt):
    def m(mod, bt):
        bsz, v, c, hh, ww = bt["cur_images_input"].shape
        nxt = bt["next_images_input"].reshape(-1, c, hh, ww)
        cur = bt["cur_images_input"][0]
        mo = mod.motion_features(cur, nxt, cur_tile=bsz)
        mo = mod.condition3d(mo, bt["local_rays"], bt["depth"])
        tri = mod.triplane_encoder(
            mo, astate.anchor_points, bt["FOV"], bt["c2w_input"])
        from igs_tpu.models.renderer import interpolate_residuals
        feats = jax.vmap(interpolate_residuals)(tri, astate)
        return mod.decoder(feats)
    return model.apply(p, bt, method=m)

def full(p, bt):
    return model.apply(p, bt, astate, gb, settings,
                       depth_settings=depth_settings,
                       shared_cur=True)["images_pred"]

for name, fn in [("motion+cond", motion_only), ("..+triplane", to_triplane),
                 ("..+interp_decode", to_decode), ("full fwd", full)]:
    t = timeit_device(jax.jit(fn), params, batch, K=4, iters=3)
    print(f"{name:18s}: {t*1e3:7.1f} ms", flush=True)
