"""Fused Pallas TPU kernel for the per-tile blend (forward).

The XLA chunk-scan blend (render_tiles.py) materializes several (G, P)
intermediates per chunk and always processes the full static per-tile
budget. This kernel fuses the whole blend for one 16×16 tile in VMEM and
uses a dynamic while-loop over chunks with two exits:
  * past the tile's actual pair count (scalar-prefetched counts), and
  * all pixels saturated (the T<1e-4 sticky done of forward.cu:566-573).

Inputs are PRE-GATHERED per-tile feature blocks (T, max_per_tile, 32)
(XLA row-gathers are fast; Pallas then streams contiguous blocks through
the pipeline — no per-row DMA). The in-chunk transmittance cumsum runs on
the MXU as a lower-triangular matmul; median selection is a one-hot
("suffix-count == 1") matmul — no gathers inside the kernel.

Backward: gradients route through the XLA implementation via custom_vjp in
rasterize.py (identical math ⇒ identical gradients); this kernel is the
inference/render hot path.

Feature packing (32 lanes): [xy(2) | conic(3) | opacity(1) | color(3) |
vp(3) | t(1) | cpx(3) | cpy(3) | rp(2) | nrm(3) | pad(11)].

Output packing (16 lanes): [color(3) | weight(1) | coord(3) | depth(1) |
normal(3) | mcoord(3) | mdepth(1) | n_contrib(1)].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from igs_tpu.ops.projection import ProjectedGaussians, TILE_X, TILE_Y

_LOG_TERM = -9.210340371976182  # log(1e-4)
_MIN_ALPHA = 1.0 / 255.0
P = TILE_X * TILE_Y  # 256 pixels per tile

# packed feature column ranges
_XY = slice(0, 2)
_CONIC = slice(2, 5)
_OPAC = slice(5, 6)
_COLOR = slice(6, 9)
_VP = slice(9, 12)
_T = slice(12, 13)
_CPX = slice(13, 16)
_CPY = slice(16, 19)
_RP = slice(19, 21)
_NRM = slice(21, 24)


def pack_features(proj: ProjectedGaussians) -> jnp.ndarray:
    """(N, 32) packed per-gaussian blend features (lane-aligned)."""
    n = proj.means2d.shape[0]
    return jnp.concatenate(
        [
            proj.means2d,
            proj.conic,
            proj.opacity[:, None],
            proj.color,
            proj.view_point,
            proj.t_center[:, None],
            proj.camera_plane[:, 0::2],  # cpx
            proj.camera_plane[:, 1::2],  # cpy
            proj.ray_plane,
            proj.normal,
            jnp.zeros((n, 8), jnp.float32),
        ],
        axis=1,
    )


def _blend_kernel(
    counts_ref,  # scalar prefetch: (T,) int32
    scalars_ref,  # scalar prefetch: (8,) f32 [fx, fy, w/2, h/2, bg0..2, gx]
    feats_ref,  # (1, MAXPT, 32) VMEM — this tile's gathered features
    out_ref,  # (1, P, 16) VMEM
    *,
    chunk: int,
):
    t = pl.program_id(0)
    count = counts_ref[t]
    grid_x = scalars_ref[7].astype(jnp.int32)
    tx0 = ((t % grid_x) * TILE_X).astype(jnp.float32)
    ty0 = ((t // grid_x) * TILE_Y).astype(jnp.float32)

    # flat pixel index p = py*TILE_X + px, generated directly in (1, P)
    # layout (Mosaic can't shape-cast (16,16)→(1,256))
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pixx = tx0 + (pidx % TILE_X).astype(jnp.float32)
    pixy = ty0 + (pidx // TILE_X).astype(jnp.float32)

    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))  # inclusive

    n_chunks = pl.cdiv(count, chunk)
    carry0 = (
        jnp.zeros((1, P), jnp.float32),  # 0 logT
        jnp.zeros((1, P), jnp.float32),  # 1 done (0/1)
        jnp.zeros((P, 4), jnp.float32),  # 2 acc color3 + weight1
        jnp.zeros((P, 4), jnp.float32),  # 3 acc coord3 + depth1
        jnp.zeros((P, 4), jnp.float32),  # 4 acc normal3 + pad
        jnp.zeros((P, 4), jnp.float32),  # 5 mcoord3 + mdepth1
        jnp.zeros((1, P), jnp.float32),  # 6 n_contrib (float)
        jnp.int32(0),  # 7 chunk index
    )

    def cond(carry):
        return (carry[7] < n_chunks) & (jnp.min(carry[1]) < 0.5)

    def body(carry):
        logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib, c = carry
        f = feats_ref[0, pl.ds(c * chunk, chunk), :]  # (chunk, 32)
        slot = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + c * chunk
        )
        live = slot < count  # (chunk, 1)

        dx = f[:, 0:1] - pixx  # (chunk, P)
        dy = f[:, 1:2] - pixy
        power = (
            -0.5 * (f[:, 2:3] * dx * dx + f[:, 4:5] * dy * dy)
            - f[:, 3:4] * dx * dy
        )
        alpha = jnp.minimum(
            0.99, f[:, 5:6] * jnp.exp(jnp.minimum(power, 0.0))
        )
        cand = live & (power <= 0.0) & (alpha >= _MIN_ALPHA)
        a = jnp.where(cand, alpha, 0.0)
        log1m = jnp.log1p(-a)
        cum_incl = logT + jnp.dot(
            tri, log1m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        cum_excl = cum_incl - log1m
        alive = cum_incl >= _LOG_TERM
        accept = cand & alive & (done < 0.5)
        t_before = jnp.exp(cum_excl)
        w = jnp.where(accept, a * t_before, 0.0)  # (chunk, P)
        wdx = w * dx
        wdy = w * dy
        wt = w.T  # (P, chunk)

        ones = jnp.ones((chunk, 1), jnp.float32)
        f_cw = jnp.concatenate([f[:, _COLOR], ones], axis=1)  # (chunk,4)
        acc_cw = acc_cw + jnp.dot(
            wt, f_cw, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        # coord3 + depth1 — dx/dy plane terms share the matmul
        f_cd_w = jnp.concatenate([f[:, _VP], f[:, _T]], axis=1)
        f_cd_x = jnp.concatenate([f[:, _CPX], f[:, 19:20]], axis=1)
        f_cd_y = jnp.concatenate([f[:, _CPY], f[:, 20:21]], axis=1)
        acc_cd = (
            acc_cd
            + jnp.dot(wt, f_cd_w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(wdx.T, f_cd_x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(wdy.T, f_cd_y, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
        f_n = jnp.concatenate([f[:, _NRM], jnp.zeros_like(ones)], axis=1)
        acc_n = acc_n + jnp.dot(
            wt, f_n, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

        # median: last accepted with T_before > 0.5 (suffix-count == 1)
        med = (accept & (t_before > 0.5)).astype(jnp.float32)
        suffix = jnp.dot(tri.T, med, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        last = med * (suffix < 1.5)  # one-hot per column
        has = jnp.sum(last, axis=0, keepdims=True)  # (1, P)
        med_new = (
            jnp.dot(last.T, f_cd_w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(
                (last * dx).T, f_cd_x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(
                (last * dy).T, f_cd_y, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )  # (P, 4) = mcoord3 + mdepth1
        acc_med = jnp.where(has.T > 0.5, med_new, acc_med)

        acceptf = accept.astype(jnp.float32)
        pos = (slot + 1).astype(jnp.float32)
        ncontrib = jnp.maximum(
            ncontrib, jnp.max(acceptf * pos, axis=0, keepdims=True)
        )

        logT = logT + jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=0, keepdims=True
        )
        done = jnp.maximum(
            done,
            jnp.max(
                jnp.where(cand & ~alive, 1.0, 0.0), axis=0, keepdims=True
            ),
        )
        return (logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib, c + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib, _ = out

    fx = scalars_ref[0]
    fy = scalars_ref[1]
    halfw = scalars_ref[2]
    halfh = scalars_ref[3]

    t_final = jnp.exp(logT).reshape(P, 1)
    weight = acc_cw[:, 3:4]
    any_acc = ncontrib.reshape(P, 1) > 0.5
    wsafe = jnp.where(weight > 0, weight, 1.0)

    bg0 = scalars_ref[4]
    bg1 = scalars_ref[5]
    bg2 = scalars_ref[6]
    color = acc_cw[:, 0:3] + jnp.concatenate(
        [t_final * bg0, t_final * bg1, t_final * bg2], axis=1
    )

    lnf = jnp.sqrt(
        ((pixx - halfw) / fx) ** 2 + ((pixy - halfh) / fy) ** 2 + 1.0
    ).reshape(P, 1)
    depth_ln = acc_cd[:, 3:4] / lnf
    out_depth = jnp.where(any_acc, depth_ln / wsafe, 0.0)
    out_coord = jnp.where(any_acc, acc_cd[:, 0:3] / wsafe, 0.0)
    out_mdepth = acc_med[:, 3:4] / lnf
    nrm = acc_n[:, 0:3]
    nlen2 = jnp.sum(nrm * nrm, axis=1, keepdims=True)
    nlen = jnp.sqrt(jnp.where(nlen2 > 0, nlen2, 1.0))
    out_normal = jnp.where(any_acc, nrm / jnp.maximum(nlen, 1e-12), 0.0)

    out_ref[0, :, :] = jnp.concatenate(
        [
            color,  # 0:3
            weight,  # 3
            out_coord,  # 4:7
            out_depth,  # 7
            out_normal,  # 8:11
            acc_med[:, 0:3],  # 11:14 mcoord
            out_mdepth,  # 14
            ncontrib.reshape(P, 1),  # 15
        ],
        axis=1,
    )


def render_tiles_pallas(
    proj: ProjectedGaussians,
    idx_table: jnp.ndarray,  # (T, max_per_tile), -1 padded
    counts: jnp.ndarray,  # (T,)
    height: int,
    width: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
    chunk: int = 256,
    interpret: bool = False,
):
    """Forward-only Pallas render returning RenderOutputs (max_contrib=0)."""
    from igs_tpu.ops.render_tiles import RenderOutputs

    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    feats = pack_features(proj)
    gathered = feats[jnp.maximum(idx_table, 0)]  # (T, maxpt, 32)
    scalars = jnp.concatenate(
        [
            jnp.stack(
                [
                    jnp.asarray(focal_x, jnp.float32),
                    jnp.asarray(focal_y, jnp.float32),
                    jnp.asarray(width / 2.0, jnp.float32),
                    jnp.asarray(height / 2.0, jnp.float32),
                ]
            ),
            bg.astype(jnp.float32),
            jnp.asarray([grid_x], jnp.float32),
        ]
    )
    packed = blend_tiles_pallas(
        gathered, counts.astype(jnp.int32), scalars,
        grid_x=grid_x, grid_y=grid_y, chunk=chunk, interpret=interpret,
    )  # (T, P, 16)

    def untile(x):
        c = x.shape[-1]
        img = x.reshape(grid_y, grid_x, TILE_Y, TILE_X, c)
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            c, grid_y * TILE_Y, grid_x * TILE_X
        )
        return img[:, :height, :width]

    img = untile(packed)  # (16, H, W)
    weight = img[3]
    return RenderOutputs(
        color=img[0:3],
        alpha=weight,
        coord=img[4:7],
        mcoord=img[11:14],
        depth=img[7],
        mdepth=img[14],
        normal=img[8:11],
        accum_coord=img[4:7] * weight[None],
        accum_depth=img[7] * weight,
        n_contrib=img[15].astype(jnp.int32),
        max_contrib=jnp.zeros_like(img[15], jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "chunk", "interpret"),
)
def blend_tiles_pallas(
    gathered: jnp.ndarray,  # (T, max_per_tile, 32)
    counts: jnp.ndarray,  # (T,) int32
    scalars: jnp.ndarray,  # (8,) f32
    grid_x: int,
    grid_y: int,
    chunk: int = 256,
    interpret: bool = False,
):
    num_tiles = grid_x * grid_y
    max_per_tile = gathered.shape[1]
    kernel = functools.partial(_blend_kernel, chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, max_per_tile, 32), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, 16), lambda t, *_: (t, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, 16), jnp.float32),
        interpret=interpret,
    )(counts, scalars, gathered)
