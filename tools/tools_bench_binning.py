"""Ablation bench for the binning stage (run on TPU).

Times build_tile_pairs with pieces stubbed to locate the cost:
full → no-final-sort → no-expansion-divmod → sort-only → argsort-only.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.gaussians import Gaussians
from igs_tpu.core.camera import Camera
from igs_tpu.ops.projection import project
from igs_tpu.ops.binning import image_tile_grid

N = 150_000
MP = 1 << 19
H = W = 512
rng = np.random.RandomState(0)
g = Gaussians.create(
    rng.uniform(-2, 2, (N, 3)).astype(np.float32),
    rng.uniform(-2, 4, (N, 1)).astype(np.float32),
    (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
        rng.normal(size=(N, 4)).astype(np.float32)),
    rng.uniform(-5.5, -3.5, (N, 3)).astype(np.float32),
    np.zeros((N, 16, 3), np.float32),
)
w2c = np.eye(4, dtype=np.float32)
w2c[2, 3] = 5.0
cam = Camera.from_w2c(w2c, 0.9, 0.9, height=H, width=W)
proj = jax.jit(lambda: project(
    g.get_xyz, g.get_scaling, g.get_rotation, g.get_opacity, cam,
    colors_precomp=jnp.zeros((N, 3))))()
gx, gy = image_tile_grid(H, W)
num_tiles = gx * gy

K = 10


def timeit_rep(f):
    def rep(eps):
        def body(c, i):
            r = f(eps * i)
            return c + jnp.sum(r[:128].astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out
    jf = jax.jit(rep)
    jax.block_until_ready(jf(jnp.float32(1e-9)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(jf(jnp.float32(1e-9)))
        ts.append(time.time() - t0)
    return np.median(ts) / K


def variant(eps, *, do_expand=True, do_divmod=True, do_sort=True,
            do_ranges=True):
    depth_key = jnp.where(proj.visible, proj.depth + eps, jnp.inf)
    order = jnp.argsort(depth_key)
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    tiles_touched = proj.tiles_touched[order]
    offsets = jnp.cumsum(tiles_touched)
    total = offsets[-1]
    if not do_expand:
        return order[:MP % N + 128]
    slots = jnp.arange(MP, dtype=jnp.int32)
    g_sorted = jnp.searchsorted(offsets, slots, side="right",
                                method="sort").astype(jnp.int32)
    g_clamped = jnp.minimum(g_sorted, N - 1)
    if do_divmod:
        base = jnp.where(g_clamped > 0,
                         offsets[jnp.maximum(g_clamped - 1, 0)], 0)
        local = slots - base
        rw = jnp.maximum(rect_max[g_clamped, 0] - rect_min[g_clamped, 0], 1)
        tile_x = rect_min[g_clamped, 0] + local % rw
        tile_y = rect_min[g_clamped, 1] + local // rw
    else:
        tile_x = rect_min[g_clamped, 0]
        tile_y = rect_min[g_clamped, 1]
    pair_valid = slots < total
    tile_id = jnp.where(pair_valid, tile_y * gx + tile_x,
                        num_tiles).astype(jnp.int32)
    gauss_id = jnp.where(pair_valid, order[g_clamped].astype(jnp.int32), -1)
    if not do_sort:
        return tile_id + gauss_id
    ts_, gs_ = jax.lax.sort((tile_id, gauss_id), num_keys=1, is_stable=True)
    if not do_ranges:
        return gs_
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(ts_, tids, side="left", method="sort")
    end = jnp.searchsorted(ts_, tids, side="right", method="sort")
    return gs_ + jnp.pad(start + end, (0, MP - num_tiles))


print("argsort+gather only:",
      round(timeit_rep(lambda e: variant(e, do_expand=False)), 4))
print("+expand (no divmod):",
      round(timeit_rep(lambda e: variant(e, do_divmod=False, do_sort=False)), 4))
print("+divmod:", round(timeit_rep(lambda e: variant(e, do_sort=False)), 4))
print("+sort:", round(timeit_rep(lambda e: variant(e, do_ranges=False)), 4))
print("full:", round(timeit_rep(lambda e: variant(e)), 4))
