"""Bench idx-table construction variants (run on TPU, alone).

pairs_to_idx_table's (T, maxpt) gather from the sorted pair list measured
12 ms of the 16 ms binning budget — try scatter-based constructions.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from igs_tpu.core.gaussians import Gaussians
from igs_tpu.core.camera import Camera
from igs_tpu.ops.projection import project
from igs_tpu.ops.binning import build_tile_pairs, image_tile_grid
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
T = gx * gy
K = 10


def timeit_rep(f):
    def rep(eps):
        def body(c, i):
            r = f(eps * i)
            return c + jnp.sum(r[:64].astype(jnp.float32)), None
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


def mkpairs(e):
    return build_tile_pairs(
        proj._replace(means2d=proj.means2d + e), gx, gy, MP)


# A: current
print("A gather idx_table      ms:", timeit_rep(
    lambda e: pairs_to_idx_table(mkpairs(e), MPT)))


# B: scatter with searchsorted-derived within-tile rank
def variant_b(e):
    pairs = mkpairs(e)
    slots = jnp.arange(MP, dtype=jnp.int32)
    start = jnp.searchsorted(
        pairs.tile_id, pairs.tile_id, side="left", method="sort"
    ).astype(jnp.int32)
    within = slots - start
    ok = (pairs.tile_id < T) & (within < MPT)
    dest = jnp.where(ok, pairs.tile_id * MPT + within, T * MPT)
    table = jnp.full(T * MPT, -1, jnp.int32).at[dest].set(
        pairs.gauss_id, mode="drop")
    return table.reshape(T, MPT)


print("B scatter searchsorted  ms:", timeit_rep(variant_b))


# C: scatter with tile_start gather (small-array gather)
def variant_c(e):
    pairs = mkpairs(e)
    slots = jnp.arange(MP, dtype=jnp.int32)
    start_pad = jnp.concatenate(
        [pairs.tile_start, jnp.full((1,), MP, jnp.int32)])
    within = slots - start_pad[jnp.minimum(pairs.tile_id, T)]
    ok = (pairs.tile_id < T) & (within < MPT) & (within >= 0)
    dest = jnp.where(ok, pairs.tile_id * MPT + within, T * MPT)
    table = jnp.full(T * MPT, -1, jnp.int32).at[dest].set(
        pairs.gauss_id, mode="drop")
    return table.reshape(T, MPT)


print("C scatter start-gather  ms:", timeit_rep(variant_c))


# D: fuse the feature gather: gather feats at pair level (wide rows, fast)
# then scatter rows into the (T*MPT, 32) table
def variant_d(e):
    p = proj._replace(means2d=proj.means2d + e)
    pairs = build_tile_pairs(p, gx, gy, MP)
    feats = pack_features(p)
    rows = feats[jnp.maximum(pairs.gauss_id, 0)]  # (MP, 32) wide gather
    slots = jnp.arange(MP, dtype=jnp.int32)
    start = jnp.searchsorted(
        pairs.tile_id, pairs.tile_id, side="left", method="sort"
    ).astype(jnp.int32)
    within = slots - start
    ok = (pairs.tile_id < T) & (within < MPT) & (pairs.gauss_id >= 0)
    dest = jnp.where(ok, pairs.tile_id * MPT + within, T * MPT)
    table = jnp.zeros((T * MPT, 32), jnp.float32).at[dest].set(
        rows, mode="drop")
    return table.reshape(-1, 32)


print("D fused feats scatter   ms:", timeit_rep(variant_d))

# correctness: B/C vs A
pairs0 = jax.jit(lambda: build_tile_pairs(proj, gx, gy, MP))()
a = np.asarray(jax.jit(lambda: pairs_to_idx_table(pairs0, MPT))())
b = np.asarray(jax.jit(lambda: variant_b(jnp.float32(0)))())
c = np.asarray(jax.jit(lambda: variant_c(jnp.float32(0)))())
print("B == A:", (a == b).all(), " C == A:", (a == c).all())


# E: no idx_table at all — pair-level wide gather + vmapped dynamic_slice
# of each tile's contiguous [start, start+maxpt) window
def variant_e(e):
    p = proj._replace(means2d=proj.means2d + e)
    pairs = build_tile_pairs(p, gx, gy, MP)
    feats = pack_features(p)
    pair_feats = feats[jnp.maximum(pairs.gauss_id, 0)]  # (MP, 32) wide
    pair_feats = jnp.pad(pair_feats, ((0, MPT), (0, 0)))
    gathered = jax.vmap(
        lambda s: jax.lax.dynamic_slice(pair_feats, (s, 0), (MPT, 32))
    )(pairs.tile_start)
    return gathered.reshape(-1, 32)


print("E dyn-slice windows     ms:", timeit_rep(variant_e))

# correctness vs A+gather
pairs0 = jax.jit(lambda: build_tile_pairs(proj, gx, gy, MP))()
feats0 = jax.jit(lambda: pack_features(proj))()
idx0 = jax.jit(lambda: pairs_to_idx_table(pairs0, MPT))()
ga = np.asarray(jax.jit(lambda: feats0[jnp.maximum(idx0, 0)])())
ge = np.asarray(jax.jit(lambda: variant_e(jnp.float32(0)))()).reshape(
    ga.shape)
counts0 = np.asarray(jnp.minimum(pairs0.tile_count, MPT))
ok = True
for t in range(ga.shape[0]):
    c = counts0[t]
    ok &= (ga[t, :c] == ge[t, :c]).all()
print("E == A+gather (within counts):", bool(ok))
