"""Locate the rebin-cache machinery overhead (~4 ms/step).

rebin2.py showed: exact 31.0 ms/step, frozen read-only pair stack 26.6
(incl. prebuild), shipped rebin=4 30.9 — the cache recovers almost
nothing. Variants isolate the machinery cost:

  v1_mincond : cond over ONLY (gaussian arrays, cached pv) instead of the
               whole RefineState; stack update + ages as shipped (K=4)
  v2_nocond  : rebuild EVERY iteration but keep the stack update + ages
               bookkeeping (isolates cond cost vs stack cost vs exact)
  v3_nostack : cond as v1 but the rebuilt pv is NOT written back (cache
               never refreshes after prebuild = frozen+cond; isolates the
               stack-update cost)

Run: nohup python tools_bench_rebin3.py > /tmp/rebin3.log 2>&1
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
    RefineConfig, init_refine_state, refine_step,
)
from igs_tpu.utils.devtime import timeit_device

n, res, iters, nviews, K = 150_000, 512, 50, 18, 4
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

g_t = g.replace(xyz=g.xyz + 0.01 * rng.normal(size=(n, 3)).astype(np.float32))
render1 = jax.jit(lambda c: rasterize(
    means3d=g_t.get_xyz, opacity=g_t.get_opacity, scaling=g_t.get_scaling,
    rotation=g_t.get_rotation, camera=c, shs=g_t.shs,
    settings=settings)["color"])
gts = jnp.stack([render1(c) for c in cams_list])
float(jnp.sum(gts))

order = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
state = init_refine_state(g, capacity=n)
cfg = RefineConfig(use_densify=False)


def build_view(gg, cam):
    return build_pairs_packed(
        gg.get_xyz, gg.get_opacity, gg.get_scaling, gg.get_rotation,
        cam, valid=gg.valid, settings=settings)


def prebuild(gg):
    return jax.vmap(
        lambda v: build_view(gg, jax.tree.map(lambda x: x[v], cams))
    )(jnp.arange(nviews))


def make_loop(mode):
    def run(st):
        pstack = prebuild(st.gaussians)
        ages0 = jnp.full((nviews,), K - 1, jnp.int32)

        def body(it, carry):
            s, pstack, ages = carry
            v = order[it]
            cam = jax.tree.map(lambda x: x[v], cams)
            pv_old = jax.tree.map(lambda x: x[v], pstack)
            gg = s.gaussians
            small_op = (gg.get_xyz, gg.get_opacity, gg.get_scaling,
                        gg.get_rotation, gg.valid, pv_old)
            if mode == "v2_nocond":
                pv = build_view(gg, cam)
                need = jnp.bool_(True)
            else:
                need = ages[v] <= 0
                pv = jax.lax.cond(
                    need,
                    lambda op: build_view_raw(op, cam),
                    lambda op: op[5],
                    small_op,
                )
            if mode != "v3_nostack":
                pstack = jax.tree.map(
                    lambda stk, p: jax.lax.dynamic_update_index_in_dim(
                        stk, p, v, 0),
                    pstack, pv)
            ages = ages.at[v].set(
                jnp.where(need, jnp.int32(K - 1), ages[v] - 1))
            s, _ = refine_step(s, cam, gts[v], jnp.zeros(3), cfg, settings,
                               pairs_override=pv)
            return s, pstack, ages

        s, _, _ = jax.lax.fori_loop(0, iters, body,
                                    (st, pstack, ages0))
        return s

    def build_view_raw(op, cam):
        xyz, opac, scal, rot, vald, _ = op
        from igs_tpu.ops.projection import project
        from igs_tpu.ops.binning import build_tile_pairs, image_tile_grid

        proj = project(xyz, scal, rot, opac, cam,
                       colors_precomp=jnp.zeros((n, 3), jnp.float32),
                       valid=vald, geometry=False)
        gx, gy = image_tile_grid(res, res)
        return jax.lax.stop_gradient(
            build_tile_pairs(proj, gx, gy, settings.max_pairs))

    return run


eval_cam = cams_list[0]
render_final = jax.jit(lambda gg: rasterize(
    means3d=gg.get_xyz, opacity=gg.get_opacity, scaling=gg.get_scaling,
    rotation=gg.get_rotation, camera=eval_cam, shs=gg.shs,
    valid=gg.valid, settings=settings)["color"])

for mode in ("v1_mincond", "v2_nocond", "v3_nostack"):
    fn = jax.jit(make_loop(mode))
    t = timeit_device(fn, state, K=2, iters=3)
    st_out = fn(state)
    img = render_final(st_out.gaussians)
    mse = float(jnp.mean((img - gts[0]) ** 2))
    print(f"{mode:10s}: loop {t:.3f} s  step {t/iters*1e3:.2f} ms  "
          f"psnr(v0) {-10*np.log10(mse):.3f} dB", flush=True)
