"""IN-CONTEXT refine-loop stage costs via ablation (round 4).

The isolated stage timings (binning ~6 ms, scatter ~8 ms, ...) predicted
rebin_every would cut ~5 ms/step; the measured fused-loop saving was
0.3 ms — XLA overlaps/fuses stages inside the fori_loop, so the only
honest decomposition is differential: time the WHOLE 50-iter loop with a
stage removed and subtract.

Variants (all as one jitted fori_loop over 50 iters, 150k/512² color):
  full        — refine_step as shipped (stats on, densify off for purity)
  no_ssim     — loss = L1 only
  no_stats    — densify-stats accumulation off
  no_adam     — grads computed, parameters not updated (carry grad sum)
  fwd_l1      — forward render + L1 loss, no backward
  fwd_only    — forward render only
  bin_only    — projection+binning only (build_pairs_packed)

Run: nohup python tools_profile_refine_ablate.py > /tmp/refine_ablate.log 2>&1
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.rasterize import (
    RasterSettings, build_pairs_packed, rasterize,
)
from igs_tpu.stream.refine import (
    RefineConfig, _loss_and_grads, init_refine_state, refine_step,
)
from igs_tpu.train.losses import l1_loss
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
    cams_list.append(Camera.from_w2c(m, 0.9, 0.9, height=res, width=res))
cams = jax.tree.map(lambda *x: jnp.stack(x), *cams_list)
settings = RasterSettings(
    image_height=res, image_width=res, impl="pallas_packed",
    max_pairs=1 << 19, outputs="color", clamp_grads=False)
gts = jnp.zeros((nviews, 3, res, res))
order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
state = init_refine_state(g, capacity=n)
cfg = RefineConfig(use_densify=False)
cfg_l1 = cfg._replace(lambda_l1=1.0)  # pure-L1 loss variant


def loop_full(st):
    def body(it, s):
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        s, _ = refine_step(s, cam, gts[order[it]], jnp.zeros(3), cfg,
                           settings)
        return s
    return jax.lax.fori_loop(0, iters, body, st)


def loop_no_ssim(st):
    def body(it, s):
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        s, _ = refine_step(s, cam, gts[order[it]], jnp.zeros(3), cfg_l1,
                           settings)
        return s
    return jax.lax.fori_loop(0, iters, body, st)


def loop_no_stats(st):
    def body(it, s):
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        s, _ = refine_step(s, cam, gts[order[it]], jnp.zeros(3), cfg,
                           settings, do_densify_stats=False)
        return s
    return jax.lax.fori_loop(0, iters, body, st)


def loop_no_adam(st):
    # grads computed each iter; xyz nudged by a tiny multiple of its grad
    # so iterations stay data-dependent (no update math / moments)
    def body(it, carry):
        gg, acc = carry
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        _, grads, g_m2o, radii, mse, _ = _loss_and_grads(
            gg, cam, gts[order[it]], jnp.zeros(3), cfg, settings)
        gg = gg.replace(xyz=gg.xyz - 1e-6 * grads["xyz"])
        return gg, acc + mse
    gg, acc = jax.lax.fori_loop(
        0, iters, body, (st.gaussians, jnp.float32(0)))
    return acc + jnp.sum(gg.xyz[:8])


def loop_fwd_l1(st):
    def body(it, carry):
        gg, acc = carry
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        out = rasterize(
            means3d=gg.get_xyz, opacity=gg.get_opacity,
            scaling=gg.get_scaling, rotation=gg.get_rotation, camera=cam,
            shs=gg.shs, valid=gg.valid, settings=settings)
        l = l1_loss(out["color"], gts[order[it]])
        gg = gg.replace(xyz=gg.xyz + 1e-9 * l)
        return gg, acc + l
    gg, acc = jax.lax.fori_loop(
        0, iters, body, (st.gaussians, jnp.float32(0)))
    return acc + jnp.sum(gg.xyz[:8])


def loop_fwd_only(st):
    def body(it, carry):
        gg, acc = carry
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        out = rasterize(
            means3d=gg.get_xyz, opacity=gg.get_opacity,
            scaling=gg.get_scaling, rotation=gg.get_rotation, camera=cam,
            shs=gg.shs, valid=gg.valid, settings=settings)
        m = jnp.mean(out["color"])
        gg = gg.replace(xyz=gg.xyz + 1e-9 * m)
        return gg, acc + m
    gg, acc = jax.lax.fori_loop(
        0, iters, body, (st.gaussians, jnp.float32(0)))
    return acc + jnp.sum(gg.xyz[:8])


def loop_bin_only(st):
    def body(it, carry):
        gg, acc = carry
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        pairs = build_pairs_packed(
            gg.get_xyz, gg.get_opacity, gg.get_scaling, gg.get_rotation,
            cam, valid=gg.valid, settings=settings)
        m = jnp.sum(pairs.tile_count).astype(jnp.float32) * 1e-9
        gg = gg.replace(xyz=gg.xyz + 1e-12 * m)
        return gg, acc + m
    gg, acc = jax.lax.fori_loop(
        0, iters, body, (st.gaussians, jnp.float32(0)))
    return acc + jnp.sum(gg.xyz[:8])


variants = [
    ("full", loop_full),
    ("no_ssim", loop_no_ssim),
    ("no_stats", loop_no_stats),
    ("no_adam", loop_no_adam),
    ("fwd_l1", loop_fwd_l1),
    ("fwd_only", loop_fwd_only),
    ("bin_only", loop_bin_only),
]
out = {}
for name, fn in variants:
    t = timeit_device(jax.jit(fn), state, K=2, iters=3)
    out[name] = t
    print(f"{name:10s}: loop {t:.3f} s  step {t/iters*1e3:.2f} ms",
          flush=True)

print("\nDifferential (ms/step):")
ms = {k: v / iters * 1e3 for k, v in out.items()}
print(f"  ssim+grad         : {ms['full'] - ms['no_ssim']:.2f}")
print(f"  densify stats     : {ms['full'] - ms['no_stats']:.2f}")
print(f"  adam update       : {ms['full'] - ms['no_adam']:.2f}")
print(f"  backward total    : {ms['no_adam'] - ms['fwd_l1']:.2f}")
print(f"  l1 fwd            : {ms['fwd_l1'] - ms['fwd_only']:.2f}")
print(f"  fwd render        : {ms['fwd_only'] - ms['bin_only']:.2f}")
print(f"  projection+binning: {ms['bin_only']:.2f}")
