"""Binning strategy bench at production scale (run on TPU, alone).

Times the CURRENT sort-based build_tile_pairs (+idx table, +feature
gather) against the compact (sort-free) path and piecewise ablations,
all amortized with an on-device scan.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.gaussians import Gaussians
from igs_tpu.core.camera import Camera
from igs_tpu.ops.projection import project
from igs_tpu.ops.binning import (
    build_tile_pairs, build_tile_lists_compact, image_tile_grid)
from igs_tpu.ops.render_tiles import pairs_to_idx_table
from igs_tpu.ops.pallas_blend import pack_features

N = 150_000
MP = 1 << 19
MPT = 1024
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
K = 10


def timeit_rep(f, red=lambda r: jnp.sum(r[0][:64].astype(jnp.float32))):
    def rep(eps):
        def body(c, i):
            r = f(eps * i)
            return c + red(r), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out
    jf = jax.jit(rep)
    jax.block_until_ready(jf(jnp.float32(1e-9)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(jf(jnp.float32(1e-9)))
        ts.append(time.time() - t0)
    return round(float(np.median(ts)) / K * 1e3, 2)


def perturb(eps):
    return proj._replace(means2d=proj.means2d + eps)


# current production path pieces
print("pairs only          ms:", timeit_rep(
    lambda e: (build_tile_pairs(perturb(e), gx, gy, MP).gauss_id,)))
print("pairs+idx_table     ms:", timeit_rep(
    lambda e: (pairs_to_idx_table(
        build_tile_pairs(perturb(e), gx, gy, MP), MPT),)))


def full_current(e):
    p = perturb(e)
    pairs = build_tile_pairs(p, gx, gy, MP)
    idx = pairs_to_idx_table(pairs, MPT)
    feats = pack_features(p)
    gathered = feats[jnp.maximum(idx, 0)]
    return (gathered.reshape(-1, 32),)


print("pairs+idx+gather    ms:", timeit_rep(full_current))

# compact path
print("compact lists       ms:", timeit_rep(
    lambda e: (build_tile_lists_compact(perturb(e), gx, gy, MPT)[0],)))


def full_compact(e):
    p = perturb(e)
    idx, counts = build_tile_lists_compact(p, gx, gy, MPT)
    feats = pack_features(p)
    gathered = feats[jnp.maximum(idx, 0)]
    return (gathered.reshape(-1, 32),)


print("compact+gather      ms:", timeit_rep(full_compact))

# smaller budgets for the current path
for mp in (1 << 18, 1 << 17):
    print(f"pairs mp={mp:7d}    ms:", timeit_rep(
        lambda e, mp=mp: (build_tile_pairs(perturb(e), gx, gy, mp).gauss_id,)))

# how full is the budget actually?
pairs = jax.jit(lambda: build_tile_pairs(proj, gx, gy, MP))()
print("num_pairs:", int(pairs.num_pairs), "/", MP,
      " max tile count:", int(pairs.tile_count.max()),
      " overflowed:", bool(pairs.overflowed))
