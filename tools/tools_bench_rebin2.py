"""Pair-caching ceiling: read-only prebuilt per-view pair lists.

The ablation shows projection+binning is 8.2 ms of the 29.7 ms in-context
refine step, but the shipped rebin_every cache recovers only 0.3 ms — the
cache machinery (cond + pair-stack carry) eats the win. This measures the
CEILING: build all 18 views' pair lists once outside the loop, read-only
index inside (maximum staleness = the whole loop), plus the quality drift
vs exact binning on a real target.

Also measures proj_only (geometry=False) in-context to split the 8.2 ms
into projection vs pair building.

Run: nohup python tools_bench_rebin2.py > /tmp/rebin2.log 2>&1
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.projection import project
from igs_tpu.ops.rasterize import (
    RasterSettings, build_pairs_packed, rasterize,
)
from igs_tpu.stream.refine import (
    RefineConfig, init_refine_state, refine_step,
)
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

# real targets (same as tools_bench_rebin.py) for the quality guard
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


def build_view(gg, v):
    cam = jax.tree.map(lambda x: x[v], cams)
    return build_pairs_packed(
        gg.get_xyz, gg.get_opacity, gg.get_scaling, gg.get_rotation,
        cam, valid=gg.valid, settings=settings)


def prebuild(gg):
    return jax.vmap(lambda v: build_view(gg, v))(jnp.arange(nviews))


def loop_frozen(st):
    pstack = prebuild(st.gaussians)

    def body(it, s):
        v = order[it]
        cam = jax.tree.map(lambda x: x[v], cams)
        pv = jax.tree.map(lambda x: x[v], pstack)
        s, _ = refine_step(s, cam, gts[v], jnp.zeros(3), cfg, settings,
                           pairs_override=pv)
        return s

    return jax.lax.fori_loop(0, iters, body, st)


def loop_exact(st):
    def body(it, s):
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        s, _ = refine_step(s, cam, gts[order[it]], jnp.zeros(3), cfg,
                           settings)
        return s
    return jax.lax.fori_loop(0, iters, body, st)


def loop_proj_only(st):
    def body(it, carry):
        gg, acc = carry
        cam = jax.tree.map(lambda x: x[order[it]], cams)
        proj = project(
            gg.get_xyz, gg.get_scaling, gg.get_rotation, gg.get_opacity,
            cam, colors_precomp=jnp.zeros((n, 3), jnp.float32),
            valid=gg.valid, geometry=False)
        m = jnp.sum(proj.depth) * 1e-9
        gg = gg.replace(xyz=gg.xyz + 1e-12 * m)
        return gg, acc + m
    gg, acc = jax.lax.fori_loop(
        0, iters, body, (st.gaussians, jnp.float32(0)))
    return acc + jnp.sum(gg.xyz[:8])


eval_cam = cams_list[0]
render_final = jax.jit(lambda gg: rasterize(
    means3d=gg.get_xyz, opacity=gg.get_opacity, scaling=gg.get_scaling,
    rotation=gg.get_rotation, camera=eval_cam, shs=gg.shs,
    valid=gg.valid, settings=settings)["color"])

for name, fn in [("exact", loop_exact), ("frozen", loop_frozen),
                 ("proj_only", loop_proj_only)]:
    t = timeit_device(jax.jit(fn), state, K=2, iters=3)
    line = f"{name:9s}: loop {t:.3f} s  step {t/iters*1e3:.2f} ms"
    if name in ("exact", "frozen"):
        st_out = jax.jit(fn)(state)
        img = render_final(st_out.gaussians)
        mse = float(jnp.mean((img - gts[0]) ** 2))
        line += f"  psnr(v0) {-10*np.log10(mse):.3f} dB"
    print(line, flush=True)
