"""A/B the condition3D ray paths: local_ray=True (4-ch) vs the shipped
local_ray=False Plücker+rsh_cart_3 (33-ch) at the production AGM shape.

The Plücker path adds: normalize+cross over (B·V, h, w) rays, two
rsh_cart_3 evaluations (32 channels), and a 33-ch ModLN MLP instead of
4-ch — all elementwise/VPU work at the 128² feature resolution, expected
to fuse into noise next to the backbone. This probe confirms that on the
real chip.

Run: python tools/tools_bench_agm_plucker.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.models.agm import AGMNet
from igs_tpu.ops.anchors import select_anchors
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.utils.devtime import timeit_device


def production_batch(b=5, v=4, hw=512, n=150_000, a=8192, seed=0):
    from igs_tpu.core.gaussians import Gaussians

    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    opacity = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    scaling = rng.uniform(-4.5, -3.0, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1, 1, (n, 3))
    g = Gaussians.create(xyz, opacity, rot, scaling, shs)
    state1 = select_anchors(
        g.xyz, jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]),
        valid=g.valid, anchor_size=a, k=8)
    state = jax.tree.map(lambda x: jnp.stack([x] * b), state1)
    gaussians = jax.tree.map(lambda x: jnp.stack([x] * b), g)
    c2w = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    c2w[:, :, 2, 3] = -4.0
    h8 = hw // 8 * 2
    batch = {
        "cur_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, v, 3, hw, hw)), jnp.float32),
        "next_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, v, 3, hw, hw)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(2, 6, (b, v, hw, hw)), jnp.float32),
        "local_rays": jnp.asarray(
            rng.normal(size=(b, h8, h8, 3)), jnp.float32),
        "rays": jnp.asarray(
            rng.normal(size=(b, v, h8, h8, 6)), jnp.float32),
        "FOV": jnp.full((b, 2), 0.8),
        "c2w_input": jnp.asarray(c2w),
        "c2w_output": jnp.asarray(c2w[:, :1]),
        "background_color": jnp.zeros((b, 3)),
    }
    return batch, state, gaussians


def main():
    batch, state, gaussians = production_batch()
    settings = RasterSettings(
        image_height=512, image_width=512, impl="pallas_packed",
        max_pairs=1 << 19, outputs="color", clamp_grads=True)
    dsettings = settings._replace(
        image_height=128, image_width=128, max_pairs=1 << 16,
        max_per_tile=512, outputs="color_depth")

    for local_ray in (True, False):
        model = AGMNet(local_ray=local_ray, encoder_bf16=True,
                       cnn_bf16=True, ft_bf16=True)
        params = jax.jit(lambda r: model.init(
            r, batch, state, gaussians, settings,
            depth_settings=dsettings, shared_cur=True,
            shared_window_pairs=True))(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, b_, s, g: model.apply(
            p, b_, s, g, settings, depth_settings=dsettings,
            shared_cur=True, shared_window_pairs=True)["images_pred"])
        t0 = time.time()
        fn(params, batch, state, gaussians).block_until_ready()
        compile_s = time.time() - t0
        sec = timeit_device(fn, params, batch, state, gaussians, K=8)
        print(f"local_ray={local_ray}: AGM forward {sec * 1e3:.1f} ms "
              f"(compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
