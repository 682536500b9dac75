"""In-context binning stage costs (differential, inside a 50-iter loop).

bin_only measured 8.2 ms/step with projection free — decompose:
depth-argsort+gathers -> expansion repeat -> fused sort -> ranges -> aux.
"""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.ops.projection import project
from igs_tpu.ops.binning import _sort_pairs, image_tile_grid
from igs_tpu.utils.devtime import timeit_device

n, res, iters, nviews = 150_000, 512, 50, 18
max_pairs = 1 << 19
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
grid_x, grid_y = image_tile_grid(res, res)
num_tiles = grid_x * grid_y


def stages(xyz, cam, upto):
    proj = project(xyz, g.get_scaling, g.get_rotation, g.get_opacity, cam,
                   colors_precomp=jnp.zeros((n, 3), jnp.float32),
                   valid=g.valid, geometry=False)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    if upto == "depthsort":
        return jnp.sum(order)
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    tiles_touched = proj.tiles_touched[order]
    offsets = jnp.cumsum(tiles_touched)
    total = offsets[-1]
    if upto == "gathers":
        return jnp.sum(rect_min) + jnp.sum(total)
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    base = jnp.concatenate([jnp.zeros(1, offsets.dtype), offsets[:-1]])
    packed = jnp.stack([
        rect_min[:, 0], rect_min[:, 1],
        jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1),
        base.astype(jnp.int32), order.astype(jnp.int32)], axis=1)
    exp = jnp.repeat(packed, tiles_touched, axis=0,
                     total_repeat_length=max_pairs)
    local = slots - exp[:, 3]
    rw_f = exp[:, 2].astype(jnp.float32)
    q = jnp.floor(local.astype(jnp.float32) / rw_f).astype(jnp.int32)
    tile_x = exp[:, 0] + (local - q * exp[:, 2])
    tile_y = exp[:, 1] + q
    pair_valid = slots < total
    tile_id = jnp.where(pair_valid, tile_y * grid_x + tile_x,
                        num_tiles).astype(jnp.int32)
    gauss_id = jnp.where(pair_valid, exp[:, 4], -1)
    if upto == "expand":
        return jnp.sum(tile_id) + jnp.sum(gauss_id)
    ts, gs_, ss = _sort_pairs(tile_id, gauss_id, num_tiles)
    if upto == "sort":
        return jnp.sum(ts) + jnp.sum(gs_) + jnp.sum(ss)
    bounds = jnp.searchsorted(
        ts, jnp.arange(num_tiles + 1, dtype=ts.dtype))
    if upto == "ranges":
        return jnp.sum(bounds) + jnp.sum(gs_) + jnp.sum(ss)
    # aux: the 2 segred sorts
    _, exp_to_sorted = jax.lax.sort(
        (ss, jnp.arange(max_pairs, dtype=jnp.int32)), num_keys=1,
        is_stable=False)
    ends_d = jnp.minimum(offsets, max_pairs).astype(jnp.int32) - 1
    has = (tiles_touched > 0) & (base < jnp.minimum(total, max_pairs))
    last_row_d = jnp.where(has, ends_d, -1)
    _, gauss_last_row = jax.lax.sort(
        (order.astype(jnp.int32), last_row_d), num_keys=1, is_stable=False)
    return (jnp.sum(bounds) + jnp.sum(exp_to_sorted)
            + jnp.sum(gauss_last_row) + jnp.sum(gs_))


order_v = jnp.asarray(np.arange(iters) % nviews, jnp.int32)
for upto in ("depthsort", "gathers", "expand", "sort", "ranges", "aux"):
    def loop(xyz, u=upto):
        def body(it, carry):
            x, acc = carry
            cam = jax.tree.map(lambda c: c[order_v[it]], cams)
            s = stages(x, cam, u)
            x = x + 1e-12 * s.astype(jnp.float32)
            return x, acc + s.astype(jnp.float32)
        x, acc = jax.lax.fori_loop(0, iters, body, (xyz, jnp.float32(0)))
        return acc + jnp.sum(x[:4])
    t = timeit_device(jax.jit(loop), g.xyz, K=2, iters=3)
    print(f"upto {upto:10s}: {t/iters*1e3:6.2f} ms/step", flush=True)
