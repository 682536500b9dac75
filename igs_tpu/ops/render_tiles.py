"""Tiled front-to-back alpha blending — TPU-native formulation.

Replaces renderCUDA (cuda_rasterizer/forward.cu:428-693) and its hand-written
backward (backward.cu:631-1016). Key TPU-first ideas:

  * The per-pixel sequential transmittance loop becomes a log-space
    cumulative sum over each chunk of Gaussians, turning blending into
    (pixels × gaussians) matmuls that map onto the MXU — no per-pixel
    scalar loop, no atomics.
  * The backward pass is obtained by JAX AD through this formulation with
    ``jax.checkpoint`` on the chunk body (alpha recomputation mirrors the
    CUDA backward's re-walk); gradient scatter to Gaussians becomes the
    transpose of the gathers — a deterministic segment reduction rather
    than CUDA's nondeterministic atomicAdd (SURVEY.md §5 race notes).
  * Skip/termination semantics are mask-exact vs CUDA: power>0 skip,
    α<1/255 skip, sticky done when T·(1-α)<1e-4 (forward.cu:552-573).

Outputs match the reference 8-tuple: color(+bg), radii, expected/median
coord, expected/median depth, alpha(=Σ αT), normal — plus accum buffers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from igs_tpu.ops.binning import TilePairs
from igs_tpu.ops.projection import ProjectedGaussians, TILE_X, TILE_Y

_LOG_TERM = jnp.log(1e-4)  # T < 1e-4 ⇒ done (forward.cu:569)
_MIN_ALPHA = 1.0 / 255.0


class RenderOutputs(NamedTuple):
    color: jnp.ndarray  # (3, H, W), bg-composited
    alpha: jnp.ndarray  # (H, W)   Σ αT
    coord: jnp.ndarray  # (3, H, W) expected camera-space coord (normalized)
    mcoord: jnp.ndarray  # (3, H, W) median coord
    depth: jnp.ndarray  # (H, W)   expected depth (normalized)
    mdepth: jnp.ndarray  # (H, W)   median depth
    normal: jnp.ndarray  # (3, H, W) blended unit normal (camera space)
    accum_coord: jnp.ndarray  # (3, H, W) unnormalized Σ coord·αT
    accum_depth: jnp.ndarray  # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32 last contributor position
    max_contrib: jnp.ndarray  # (H, W) int32 median contributor position


def _chunk_features(proj: ProjectedGaussians, ids: jnp.ndarray):
    """Gather per-Gaussian blend inputs for a chunk of pair ids (G,)."""
    safe = jnp.maximum(ids, 0)
    return dict(
        xy=proj.means2d[safe],
        conic=proj.conic[safe],
        opacity=proj.opacity[safe],
        color=proj.color[safe],
        vp=proj.view_point[safe],
        t=proj.t_center[safe],
        cp=proj.camera_plane[safe],
        rp=proj.ray_plane[safe],
        nrm=proj.normal[safe],
        live=ids >= 0,
    )


def _blend_chunk(carry, feats, pixf, contrib_base):
    """Blend one chunk of G Gaussians into P pixels.

    carry: dict of per-pixel state (P,)/(P,C) arrays.
    feats: gathered per-Gaussian arrays (G, ·) for this chunk.
    pixf:  (P, 2) float pixel coordinates of the tile.
    contrib_base: () int32 — pair position offset of this chunk in the
    tile's range (for n_contrib/max_contrib parity).
    """
    g = feats["xy"].shape[0]
    dx = feats["xy"][:, 0:1] - pixf[None, :, 0]  # (G, P)
    dy = feats["xy"][:, 1:2] - pixf[None, :, 1]
    cx = feats["conic"][:, 0:1]
    cy = feats["conic"][:, 1:2]
    cz = feats["conic"][:, 2:3]
    power = -0.5 * (cx * dx * dx + cz * dy * dy) - cy * dx * dy
    # exp only where power<=0 (candidate condition) — keeps AD NaN-free
    alpha = jnp.minimum(
        0.99, feats["opacity"][:, None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    cand = (
        feats["live"][:, None]
        & (power <= 0.0)
        & (alpha >= _MIN_ALPHA)
    )
    a = jnp.where(cand, alpha, 0.0)
    log1m = jnp.log1p(-a)  # 0 for non-candidates
    cum_incl = carry["logT"][None, :] + jnp.cumsum(log1m, axis=0)  # (G, P)
    cum_excl = cum_incl - log1m
    alive = cum_incl >= _LOG_TERM
    accept = cand & alive & (~carry["done"])[None, :]
    t_before = jnp.exp(cum_excl)
    w = jnp.where(accept, a * t_before, 0.0)  # (G, P)
    wdx = w * dx
    wdy = w * dy

    # MXU accumulation: features → (G, K) blocks
    f1 = jnp.concatenate(
        [
            feats["color"],  # 3
            feats["vp"],  # 3
            feats["t"][:, None],  # 1
            feats["nrm"],  # 3
            jnp.ones((g, 1), w.dtype),  # 1 (weight)
        ],
        axis=1,
    )  # (G, 11)
    f2 = jnp.concatenate(
        [feats["cp"][:, 0::2], feats["rp"][:, 0:1]], axis=1
    )  # (G, 4): coord-x contributions of dx
    f3 = jnp.concatenate([feats["cp"][:, 1::2], feats["rp"][:, 1:2]], axis=1)

    acc1 = jnp.einsum("gp,gk->pk", w, f1)
    acc2 = jnp.einsum("gp,gk->pk", wdx, f2)
    acc3 = jnp.einsum("gp,gk->pk", wdy, f3)

    color = carry["color"] + acc1[:, 0:3]
    coord = carry["coord"] + acc1[:, 3:6] + acc2[:, 0:3] + acc3[:, 0:3]
    depth = carry["depth"] + acc1[:, 6] + acc2[:, 3] + acc3[:, 3]
    normal = carry["normal"] + acc1[:, 7:10]
    weight = carry["weight"] + acc1[:, 10]

    # median (T_before > 0.5 pre-update → record this gaussian's values)
    med = accept & (t_before > 0.5)
    gidx = jnp.arange(1, g + 1, dtype=jnp.int32)[:, None]
    sel1 = jnp.max(jnp.where(med, gidx, 0), axis=0)  # (P,) 1-based, 0 = none
    has = sel1 > 0
    gsel = jnp.maximum(sel1 - 1, 0)
    parange = jnp.arange(pixf.shape[0])
    dxs = dx[gsel, parange]
    dys = dy[gsel, parange]
    t_sel = feats["t"][gsel] + feats["rp"][gsel, 0] * dxs + feats["rp"][gsel, 1] * dys
    coord_sel = (
        feats["vp"][gsel]
        + feats["cp"][gsel, 0::2] * dxs[:, None]
        + feats["cp"][gsel, 1::2] * dys[:, None]
    )
    mdepth = jnp.where(has, t_sel, carry["mdepth"])
    mcoord = jnp.where(has[:, None], coord_sel, carry["mcoord"])
    max_contrib = jnp.where(
        has, contrib_base + sel1, carry["max_contrib"]
    )

    # last contributor (position of last accepted pair)
    lastg = jnp.max(jnp.where(accept, gidx, 0), axis=0)
    n_contrib = jnp.where(
        lastg > 0, contrib_base + lastg, carry["n_contrib"]
    )

    logT = carry["logT"] + jnp.sum(jnp.where(accept, log1m, 0.0), axis=0)
    done = carry["done"] | jnp.any(cand & ~alive, axis=0)

    return dict(
        logT=logT,
        done=done,
        color=color,
        coord=coord,
        depth=depth,
        normal=normal,
        weight=weight,
        mdepth=mdepth,
        mcoord=mcoord,
        max_contrib=max_contrib,
        n_contrib=n_contrib,
    )


def pairs_to_idx_table(pairs: TilePairs, max_per_tile: int) -> jnp.ndarray:
    """(T, max_per_tile) per-tile gaussian-id table from sorted pairs."""
    j = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_pos = pairs.tile_start[:, None] + j[None, :]
    in_range = j[None, :] < pairs.tile_count[:, None]
    gather_pos = jnp.minimum(gather_pos, pairs.gauss_id.shape[0] - 1)
    return jnp.where(in_range, pairs.gauss_id[gather_pos], -1)


def render_tiles(
    proj: ProjectedGaussians,
    idx_table: jnp.ndarray,  # (T, max_per_tile) gaussian ids, -1 padded
    height: int,
    width: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
    chunk: int = 256,
) -> RenderOutputs:
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    p = TILE_X * TILE_Y
    max_per_tile = idx_table.shape[1]
    n_chunks = max(1, max_per_tile // chunk)

    # tile pixel coordinates (T, P, 2)
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = (tid % grid_x) * TILE_X
    ty0 = (tid // grid_x) * TILE_Y
    py, px = jnp.meshgrid(
        jnp.arange(TILE_Y, dtype=jnp.float32),
        jnp.arange(TILE_X, dtype=jnp.float32),
        indexing="ij",
    )
    pixf = jnp.stack(
        [
            tx0[:, None].astype(jnp.float32) + px.reshape(-1)[None, :],
            ty0[:, None].astype(jnp.float32) + py.reshape(-1)[None, :],
        ],
        axis=-1,
    )  # (T, P, 2)

    zero_tp = jnp.zeros((num_tiles, p), jnp.float32)
    carry = dict(
        logT=zero_tp,
        done=jnp.zeros((num_tiles, p), bool),
        color=jnp.zeros((num_tiles, p, 3), jnp.float32),
        coord=jnp.zeros((num_tiles, p, 3), jnp.float32),
        depth=zero_tp,
        normal=jnp.zeros((num_tiles, p, 3), jnp.float32),
        weight=zero_tp,
        mdepth=zero_tp,
        mcoord=jnp.zeros((num_tiles, p, 3), jnp.float32),
        max_contrib=jnp.zeros((num_tiles, p), jnp.int32),
        n_contrib=jnp.zeros((num_tiles, p), jnp.int32),
    )

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, c):
        ids = jax.lax.dynamic_slice_in_dim(idx_table, c * chunk, chunk, axis=1)
        feats = jax.vmap(lambda i: _chunk_features(proj, i))(ids)
        new = jax.vmap(_blend_chunk, in_axes=(0, 0, 0, None))(
            carry, feats, pixf, c * chunk
        )
        return new, None

    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_chunks), unroll=1)

    # finalize (forward.cu:631-692)
    t_final = jnp.exp(carry["logT"])
    any_acc = carry["n_contrib"] > 0
    color = carry["color"] + t_final[..., None] * bg[None, None, :]
    weight = carry["weight"]
    wsafe = jnp.where(weight > 0, weight, 1.0)
    out_coord = jnp.where(any_acc[..., None], carry["coord"] / wsafe[..., None], 0.0)

    # per-pixel ray-norm ln (forward.cu:466-467): uses W/2, H/2 exactly
    lnf = jnp.sqrt(
        ((pixf[..., 0] - width / 2.0) / focal_x) ** 2
        + ((pixf[..., 1] - height / 2.0) / focal_y) ** 2
        + 1.0
    )
    depth_ln = carry["depth"] / lnf
    out_depth = jnp.where(any_acc, depth_ln / wsafe, 0.0)
    out_mdepth = carry["mdepth"] / lnf

    from igs_tpu.utils.safe_math import safe_norm

    nlen = jnp.maximum(safe_norm(carry["normal"], keepdims=True), 1e-12)
    out_normal = jnp.where(any_acc[..., None], carry["normal"] / nlen, 0.0)

    def untile(x):
        """(T, P, C) → (C, H, W) cropping tile padding."""
        c = x.shape[-1] if x.ndim == 3 else 1
        img = x.reshape(grid_y, grid_x, TILE_Y, TILE_X, c)
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            c, grid_y * TILE_Y, grid_x * TILE_X
        )
        img = img[:, :height, :width]
        return img if x.ndim == 3 else img[0]

    return RenderOutputs(
        color=untile(color),
        alpha=untile(weight),
        coord=untile(out_coord),
        mcoord=untile(carry["mcoord"]),
        depth=untile(out_depth),
        mdepth=untile(out_mdepth),
        normal=untile(out_normal),
        accum_coord=untile(carry["coord"]),
        accum_depth=untile(depth_ln),
        n_contrib=untile(carry["n_contrib"]),
        max_contrib=untile(carry["max_contrib"]),
    )
