"""Fused Pallas TPU kernels for the per-tile blend — forward AND backward.

Replaces renderCUDA forward (cuda_rasterizer/forward.cu:428-693) and its
hand-written backward (backward.cu:631-1016) with two TPU kernels:

  * Forward: per-tile while-loop over Gaussian chunks with two early exits
    (past the tile's pair count; all pixels saturated). Transmittance is a
    log-space cumulative sum computed as a lower-triangular matmul on the
    MXU; blending/median-selection are (pixels × gaussians) matmuls. The
    kernel emits RAW accumulators (Σ αT·feature, final log T, last/median
    contributor positions) — all normalization, background compositing and
    the per-pixel ray-norm happen in differentiable XLA outside.

  * Backward: reverse chunk walk recovering T exactly like the CUDA
    backward (T by subtraction of accepted log(1−α); the accepted set
    re-derived from the forward's per-pixel n_contrib, mirroring
    backward.cu:700 `contributor >= last_contributor` skip). dL/dα gets the
    suffix-sum term Σ_{j>i} w_j g_j via a carried per-pixel scalar plus an
    in-chunk upper-triangular matmul. Per-slot feature gradients are
    written densely to a (max_per_tile, 32) block; the scatter back to
    Gaussians is the XLA transpose of the pre-gather — a deterministic
    segment reduction (no atomics, reproducible grads).

Feature packing (32 lanes): [xy(2) | conic(3) | opacity(1) | color(3) |
vp(3) | t(1) | cpx(3) | cpy(3) | rp(2) | nrm(3) | pad(8)].

Raw output packing (24 lanes): [C(3) | W(1) | Coord(3) | D(1) | Nrm(3) |
mcoord(3) | mdepth_t(1) | logT(1) | n_contrib(1) | med_pos(1) | pad(7)].
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
HI = jax.lax.Precision.HIGHEST
LO = jax.lax.Precision.DEFAULT


def _dot3(a, b, dims, a_exact=False, b_exact=False):
    """dot_general at ~f32 accuracy in 3 (or 2) bf16 MXU passes.

    HIGHEST runs f32 dots as 6 bf16 passes; splitting both operands hi/lo
    and dropping the lo·lo term costs 3 passes at ~2^-16 relative error —
    half the MXU time, far inside the rasterizer's 2e-4 parity envelope
    (the packed kernels measured MXU-PASS-bound in full mode: all-DEFAULT
    probe cut fwd+bwd 52.4 → 40.5 ms at 512²/100k). ``a_exact``/``b_exact``
    mark operands already exactly representable in bf16 (0/1 masks), which
    need no split — 2 passes.
    """
    d = lambda x, y: jax.lax.dot_general(x, y, dims, precision=LO)
    if a_exact and b_exact:
        return d(a, b)
    if a_exact:
        bh = b.astype(jnp.bfloat16).astype(jnp.float32)
        return d(a, bh) + d(a, b - bh)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    if b_exact:
        return d(ah, b) + d(al, b)
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _tri_dot(x, tri):
    """dot(x, tri) for a 0/1 triangular matrix in 2 MXU passes.

    The (W, W) triangular prefix/suffix dots are the MXU-dominant cost of
    the packed kernels, and HIGHEST runs them as 6 bf16 passes (Mosaic
    rejects Precision.HIGH). But ``tri`` is exactly representable in
    bf16, so splitting only ``x`` (hi = bf16(x), lo = x - hi) makes
    dot(hi, tri) + dot(lo, tri) accurate to ~2^-17 relative -- far inside
    the 2e-4 parity envelope -- at 1/3 the MXU time.
    """
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    return (jnp.dot(hi, tri, precision=LO)
            + jnp.dot(lo, tri, precision=LO))

_XY = slice(0, 2)
_COLOR = slice(6, 9)
_VP = slice(9, 12)
_T = slice(12, 13)
_CPX = slice(13, 16)
_CPY = slice(16, 19)
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


def unpack_feature_grads(dfeats: jnp.ndarray) -> dict:
    """(N, 32) packed grads → per-field cotangents (pack_features order)."""
    cp = jnp.zeros((dfeats.shape[0], 6), dfeats.dtype)
    cp = cp.at[:, 0::2].set(dfeats[:, 13:16])
    cp = cp.at[:, 1::2].set(dfeats[:, 16:19])
    return dict(
        means2d=dfeats[:, 0:2],
        conic=dfeats[:, 2:5],
        opacity=dfeats[:, 5],
        color=dfeats[:, 6:9],
        view_point=dfeats[:, 9:12],
        t_center=dfeats[:, 12],
        camera_plane=cp,
        ray_plane=dfeats[:, 19:21],
        normal=dfeats[:, 21:24],
    )


def _common_chunk(f, pixx, pixy):
    dx = f[:, 0:1] - pixx  # (chunk, P)
    dy = f[:, 1:2] - pixy
    power = (
        -0.5 * (f[:, 2:3] * dx * dx + f[:, 4:5] * dy * dy)
        - f[:, 3:4] * dx * dy
    )
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, f[:, 5:6] * expp)
    return dx, dy, power, expp, alpha


def _pix_coords(t, scalars_ref):
    grid_x = scalars_ref[0].astype(jnp.int32)
    tx0 = ((t % grid_x) * TILE_X).astype(jnp.float32)
    ty0 = ((t // grid_x) * TILE_Y).astype(jnp.float32)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pixx = tx0 + (pidx % TILE_X).astype(jnp.float32)
    pixy = ty0 + (pidx // TILE_X).astype(jnp.float32)
    return pixx, pixy


def _fwd_kernel(counts_ref, scalars_ref, feats_ref, out_ref, *, chunk: int,
                tiles_per_block: int = 1, mode: str = "full"):
    for _tt in range(tiles_per_block):
        _fwd_one_tile(counts_ref, scalars_ref, feats_ref, out_ref,
                      chunk=chunk, tt=_tt,
                      tiles_per_block=tiles_per_block, mode=mode)


def _fwd_one_tile(counts_ref, scalars_ref, feats_ref, out_ref, *, chunk: int,
                  tt: int, tiles_per_block: int, mode: str = "full"):
    t = pl.program_id(0) * tiles_per_block + tt
    count = counts_ref[t]
    pixx, pixy = _pix_coords(t, scalars_ref)
    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    n_chunks = pl.cdiv(count, chunk)
    carry0 = (
        jnp.zeros((1, P), jnp.float32),  # 0 logT
        jnp.zeros((1, P), jnp.float32),  # 1 done
        jnp.zeros((P, 4), jnp.float32),  # 2 color3 + weight1
        jnp.zeros((P, 4), jnp.float32),  # 3 coord3 + depth1
        jnp.zeros((P, 4), jnp.float32),  # 4 normal3 + pad
        jnp.zeros((P, 4), jnp.float32),  # 5 mcoord3 + mdepth1
        jnp.zeros((1, P), jnp.float32),  # 6 n_contrib
        jnp.full((1, P), -1.0),          # 7 med_pos (slot, -1 none)
        jnp.int32(0),                    # 8 chunk index
    )

    def cond(c):
        return (c[8] < n_chunks) & (jnp.min(c[1]) < 0.5)

    def body(carry):
        (logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib, medpos,
         c) = carry
        f = feats_ref[tt, pl.ds(c * chunk, chunk), :]
        slot = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + c * chunk
        live = slot < count
        dx, dy, power, _, alpha = _common_chunk(f, pixx, pixy)
        cand = live & (power <= 0.0) & (alpha >= _MIN_ALPHA)
        a = jnp.where(cand, alpha, 0.0)
        log1m = jnp.log1p(-a)
        cum_incl = logT + jnp.dot(tri, log1m, precision=HI)
        alive = cum_incl >= _LOG_TERM
        accept = cand & alive & (done < 0.5)
        t_before = jnp.exp(cum_incl - log1m)
        w = jnp.where(accept, a * t_before, 0.0)
        wdx = w * dx
        wdy = w * dy
        wt = w.T

        ones = jnp.ones((chunk, 1), jnp.float32)
        f_cw = jnp.concatenate([f[:, _COLOR], ones], axis=1)
        f_cd_w = jnp.concatenate([f[:, _VP], f[:, _T]], axis=1)
        f_cd_x = jnp.concatenate([f[:, _CPX], f[:, 19:20]], axis=1)
        f_cd_y = jnp.concatenate([f[:, _CPY], f[:, 20:21]], axis=1)
        f_n = jnp.concatenate([f[:, _NRM], jnp.zeros_like(ones)], axis=1)

        acc_cw = acc_cw + jnp.dot(wt, f_cw, precision=HI)
        slotf = slot.astype(jnp.float32)
        if mode != "color":
            acc_cd = (
                acc_cd
                + jnp.dot(wt, f_cd_w, precision=HI)
                + jnp.dot(wdx.T, f_cd_x, precision=HI)
                + jnp.dot(wdy.T, f_cd_y, precision=HI)
            )
        if mode == "full":
            acc_n = acc_n + jnp.dot(wt, f_n, precision=HI)

            med = (accept & (t_before > 0.5)).astype(jnp.float32)
            suffix = jnp.dot(tri.T, med, precision=HI)
            last = med * (suffix < 1.5)
            has = jnp.sum(last, axis=0, keepdims=True)
            med_new = (
                jnp.dot(last.T, f_cd_w, precision=HI)
                + jnp.dot((last * dx).T, f_cd_x, precision=HI)
                + jnp.dot((last * dy).T, f_cd_y, precision=HI)
            )
            acc_med = jnp.where(has.T > 0.5, med_new, acc_med)
            medpos_new = jnp.sum(last * slotf, axis=0, keepdims=True)
            medpos = jnp.where(has > 0.5, medpos_new, medpos)

        acceptf = accept.astype(jnp.float32)
        ncontrib = jnp.maximum(
            ncontrib,
            jnp.max(acceptf * (slotf + 1.0), axis=0, keepdims=True),
        )
        logT = logT + jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=0, keepdims=True
        )
        done = jnp.maximum(
            done,
            jnp.max(jnp.where(cand & ~alive, 1.0, 0.0), axis=0,
                    keepdims=True),
        )
        return (logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib,
                medpos, c + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    logT, _, acc_cw, acc_cd, acc_n, acc_med, ncontrib, medpos, _ = out
    out_ref[tt, :, :] = jnp.concatenate(
        [
            acc_cw[:, 0:3],            # 0:3  C
            acc_cw[:, 3:4],            # 3    W
            acc_cd,                    # 4:8  Coord, D
            acc_n[:, 0:3],             # 8:11 Nrm
            acc_med,                   # 11:15 mcoord, mdepth_t
            logT.T,                    # 15
            ncontrib.T,                # 16
            medpos.T,                  # 17
            jnp.zeros((P, 6), jnp.float32),
        ],
        axis=1,
    )


def _count_kernel(counts_ref, scalars_ref, feats_ref, out_ref, *, chunk: int,
                  tiles_per_block: int = 1):
    for _tt in range(tiles_per_block):
        _count_one_tile(counts_ref, scalars_ref, feats_ref, out_ref,
                        chunk=chunk, tt=_tt,
                        tiles_per_block=tiles_per_block)


def _count_one_tile(counts_ref, scalars_ref, feats_ref, out_ref, *,
                    chunk: int, tt: int, tiles_per_block: int):
    """Per-SLOT accepted-contribution counts (LightGaussian compress).

    Walks the tile exactly like the forward blend but reduces over the
    pixel axis instead of the gaussian axis: out[slot] = #pixels whose
    accepted contributor set includes this slot — the deterministic
    equivalent of compress-…/forward.cu:473 ``gaussian_count[id]++``
    (which the CUDA code increments WITHOUT atomics, i.e. racily).
    """
    t = pl.program_id(0) * tiles_per_block + tt
    count = counts_ref[t]
    pixx, pixy = _pix_coords(t, scalars_ref)
    # partial boundary tiles: pixels outside the image contribute nothing
    # (CUDA's ``inside``/done=true, forward.cu:445)
    wlim = scalars_ref[1].astype(jnp.float32)
    hlim = scalars_ref[2].astype(jnp.float32)
    outside = ((pixx >= wlim) | (pixy >= hlim)).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    out_ref[tt, :, :] = jnp.zeros_like(out_ref[tt, :, :])
    n_chunks = pl.cdiv(count, chunk)

    def cond(c):
        return (c[2] < n_chunks) & (jnp.min(c[1]) < 0.5)

    def body(carry):
        logT, done, c = carry
        f = feats_ref[tt, pl.ds(c * chunk, chunk), :]
        slot = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + c * chunk
        live = slot < count
        _, _, power, _, alpha = _common_chunk(f, pixx, pixy)
        cand = live & (power <= 0.0) & (alpha >= _MIN_ALPHA)
        a = jnp.where(cand, alpha, 0.0)
        log1m = jnp.log1p(-a)
        cum_incl = logT + jnp.dot(tri, log1m, precision=HI)
        alive = cum_incl >= _LOG_TERM
        accept = cand & alive & (done < 0.5)
        acceptf = accept.astype(jnp.float32)
        slot_counts = jnp.sum(acceptf, axis=1, keepdims=True)  # (chunk, 1)
        out_ref[tt, pl.ds(c * chunk, chunk), :] = jnp.concatenate(
            [slot_counts, jnp.zeros((chunk, 7), jnp.float32)], axis=1)
        logT = logT + jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=0, keepdims=True)
        done = jnp.maximum(
            done,
            jnp.max(jnp.where(cand & ~alive, 1.0, 0.0), axis=0,
                    keepdims=True),
        )
        return (logT, done, c + 1)

    jax.lax.while_loop(
        cond, body,
        (jnp.zeros((1, P), jnp.float32), outside, jnp.int32(0)),
    )


def count_contributions_pallas(
    proj: ProjectedGaussians,
    idx_table: jnp.ndarray,  # (T, max_per_tile), -1 padded
    counts: jnp.ndarray,  # (T,)
    height: int,
    width: int,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-Gaussian accepted-contribution counts through the tile pipeline.

    Memory scales with the pair budget (T·max_per_tile), NOT N·H·W — this
    is what lets LightGaussian importance run at production scale
    (150k × 512² would need a 157 GB dense matrix).
    """
    n = proj.means2d.shape[0]
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    max_per_tile = idx_table.shape[1]
    feats = pack_features(proj)
    gathered = feats[jnp.maximum(idx_table, 0)]
    scalars = jnp.concatenate([
        jnp.asarray([grid_x, width, height], jnp.float32),
        jnp.zeros(5, jnp.float32),
    ])
    # per-slot output block doubles the VMEM footprint vs the render
    # forward; tpb=8 overflows the 16 MB scoped-vmem stack at maxpt=1024
    tpb = _pick_tpb(num_tiles, max_per_tile, max_tpb=4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, max_per_tile, 32), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tpb, max_per_tile, 8), lambda t, *_: (t, 0, 0)),
    )
    slot_counts = pl.pallas_call(
        functools.partial(_count_kernel, chunk=chunk, tiles_per_block=tpb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, max_per_tile, 8), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), scalars, gathered)[:, :, 0]

    # deterministic scatter back to gaussians (id -1 → dropped)
    flat_ids = jnp.where(idx_table >= 0, idx_table, n).reshape(-1)
    per_gauss = jax.ops.segment_sum(
        slot_counts.reshape(-1), flat_ids, num_segments=n + 1
    )[:n]
    return per_gauss


def _bwd_kernel(counts_ref, scalars_ref, feats_ref, fwd_ref, cot_ref,
                dfeats_ref, *, chunk: int, tiles_per_block: int = 1,
                mode: str = "full"):
    for _tt in range(tiles_per_block):
        _bwd_one_tile(counts_ref, scalars_ref, feats_ref, fwd_ref, cot_ref,
                      dfeats_ref, chunk=chunk, tt=_tt,
                      tiles_per_block=tiles_per_block, mode=mode)


def _bwd_one_tile(counts_ref, scalars_ref, feats_ref, fwd_ref, cot_ref,
                  dfeats_ref, *, chunk: int, tt: int, tiles_per_block: int,
                  mode: str = "full"):
    t = pl.program_id(0) * tiles_per_block + tt
    count = counts_ref[t]
    pixx, pixy = _pix_coords(t, scalars_ref)
    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))
    triu_incl = tri.T  # suffix inclusive
    triu_excl = triu_incl - jnp.eye(chunk, dtype=jnp.float32)

    fwd = fwd_ref[tt, :, :]  # (P, 24)
    cot = cot_ref[tt, :, :]  # (P, 24)
    logT_final = fwd[:, 15:16].T  # (1, P)
    ncontrib = fwd[:, 16:17].T
    medpos = fwd[:, 17:18].T

    uC = cot[:, 0:3]
    uW = cot[:, 3:4]
    uCD = cot[:, 4:8]      # uCoord(3) + uD(1)
    uN = cot[:, 8:11]
    uMed = cot[:, 11:15]   # umcoord(3) + umdepth(1)
    ulogT = cot[:, 15:16].T  # (1, P)

    # zero the whole grad block (slots beyond the walk stay zero)
    dfeats_ref[tt, :, :] = jnp.zeros_like(dfeats_ref[tt, :, :])

    nc_max = jnp.max(ncontrib).astype(jnp.int32)
    limit = jnp.minimum(count, nc_max)
    c_start = pl.cdiv(limit, chunk) - 1

    def cond(carry):
        return carry[2] >= 0

    def body(carry):
        s_carry, logT_end, c = carry
        f = feats_ref[tt, pl.ds(c * chunk, chunk), :]
        slot = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + c * chunk
        dx, dy, power, expp, alpha = _common_chunk(f, pixx, pixy)
        slotf = slot.astype(jnp.float32)
        accept = (
            (slot < count)
            & (power <= 0.0)
            & (alpha >= _MIN_ALPHA)
            & ((slotf + 1.0) <= ncontrib)
        )
        a = jnp.where(accept, alpha, 0.0)
        log1m = jnp.log1p(-a)
        suffix_incl = jnp.dot(triu_incl, log1m, precision=HI)
        logT_i = logT_end - suffix_incl  # T before gaussian i
        t_i = jnp.exp(logT_i)
        w = jnp.where(accept, a * t_i, 0.0)

        ones = jnp.ones((chunk, 1), jnp.float32)
        f_cw = jnp.concatenate([f[:, _COLOR], ones], axis=1)
        f_cd_w = jnp.concatenate([f[:, _VP], f[:, _T]], axis=1)
        f_cd_x = jnp.concatenate([f[:, _CPX], f[:, 19:20]], axis=1)
        f_cd_y = jnp.concatenate([f[:, _CPY], f[:, 20:21]], axis=1)
        f_n = jnp.concatenate([f[:, _NRM], jnp.zeros_like(ones)], axis=1)

        # g_i(p) = dL/dw_i(p) — contract on the 4-channel axis without
        # explicit transposes (dot_general is Mosaic-friendlier)
        def dotT(a, b):  # (chunk, K) × (P, K) → (chunk, P)
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), precision=HI)

        uCW = jnp.concatenate([uC, uW], axis=1)
        g = dotT(f_cw, uCW)  # (chunk, P)
        if mode != "color":
            g = (
                g
                + dotT(f_cd_w, uCD)
                + dx * dotT(f_cd_x, uCD)
                + dy * dotT(f_cd_y, uCD)
            )
        if mode == "full":
            uN4 = jnp.concatenate(
                [uN, jnp.zeros((P, 1), jnp.float32)], axis=1)
            g = g + dotT(f_n, uN4)
        wg = w * g
        s_cur = s_carry + jnp.dot(triu_excl, wg, precision=HI)  # Σ_{j>i}

        da = jnp.where(
            accept,
            t_i * g - (s_cur + ulogT) / (1.0 - a),
            0.0,
        )
        notclip = (alpha < 0.99).astype(jnp.float32)
        dpower = da * a * notclip  # a = op·E when unclipped
        dop_px = da * expp * notclip  # (chunk, P), sum later

        # median one-hot (slot of the median contributor)
        ddx = dpower * (-(f[:, 2:3] * dx + f[:, 3:4] * dy))
        ddy = dpower * (-(f[:, 4:5] * dy + f[:, 3:4] * dx))
        if mode != "color":
            ddx = ddx + w * dotT(f_cd_x, uCD)
            ddy = ddy + w * dotT(f_cd_y, uCD)
        if mode == "full":
            lastm = (
                (slotf == medpos) & (medpos >= 0.0)
            ).astype(jnp.float32)  # (chunk, P)
            ldx = lastm * dx
            ldy = lastm * dy
            ddx = ddx + lastm * dotT(f_cd_x, uMed)
            ddy = ddy + lastm * dotT(f_cd_y, uMed)

        wdx = w * dx
        wdy = w * dy
        # per-slot feature grads — (chunk, P) @ (P, K) matmuls
        dxy = jnp.concatenate(
            [
                jnp.sum(ddx, axis=1, keepdims=True),
                jnp.sum(ddy, axis=1, keepdims=True),
            ],
            axis=1,
        )  # (chunk, 2)
        dconic = jnp.concatenate(
            [
                jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True),
                jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True),
                jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True),
            ],
            axis=1,
        )  # (chunk, 3)
        dop = jnp.sum(dop_px, axis=1, keepdims=True)  # (chunk, 1)
        dcolor = jnp.dot(w, uC, precision=HI)  # (chunk, 3)
        if mode != "color":
            dvp_t = jnp.dot(w, uCD, precision=HI)  # (chunk,4): vp3 + t1
            dcpx_rp0 = jnp.dot(wdx, uCD, precision=HI)
            dcpy_rp1 = jnp.dot(wdy, uCD, precision=HI)
        else:
            dvp_t = jnp.zeros((chunk, 4), jnp.float32)
            dcpx_rp0 = jnp.zeros((chunk, 4), jnp.float32)
            dcpy_rp1 = jnp.zeros((chunk, 4), jnp.float32)
        if mode == "full":
            dvp_t = dvp_t + jnp.dot(lastm, uMed, precision=HI)
            dcpx_rp0 = dcpx_rp0 + jnp.dot(ldx, uMed, precision=HI)
            dcpy_rp1 = dcpy_rp1 + jnp.dot(ldy, uMed, precision=HI)
            dnrm = jnp.dot(w, uN, precision=HI)  # (chunk, 3)
        else:
            dnrm = jnp.zeros((chunk, 3), jnp.float32)

        block = jnp.concatenate(
            [
                dxy,                 # 0:2
                dconic,              # 2:5
                dop,                 # 5
                dcolor,              # 6:9
                dvp_t[:, 0:3],       # 9:12 vp
                dvp_t[:, 3:4],       # 12   t
                dcpx_rp0[:, 0:3],    # 13:16 cpx
                dcpy_rp1[:, 0:3],    # 16:19 cpy
                dcpx_rp0[:, 3:4],    # 19 rp0
                dcpy_rp1[:, 3:4],    # 20 rp1
                dnrm,                # 21:24
                jnp.zeros((chunk, 8), jnp.float32),
            ],
            axis=1,
        )
        dfeats_ref[tt, pl.ds(c * chunk, chunk), :] = block

        s_next = s_carry + jnp.sum(wg, axis=0, keepdims=True)
        logT_next = logT_end - jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=0, keepdims=True
        )
        return (s_next, logT_next, c - 1)

    jax.lax.while_loop(
        cond, body,
        (jnp.zeros((1, P), jnp.float32), logT_final, c_start),
    )


# backward tiles-per-block cap: VMEM-limited (the bwd streams two
# (maxpt, 32) blocks per tile + chunk-sized intermediates); 2 is safe at
# chunk=256/maxpt=1024, larger values measured via tools_bench_blend.
_BWD_MAX_TPB = 2


def _pick_tpb(num_tiles: int, max_per_tile: int, max_tpb: int) -> int:
    """Tiles per grid step: amortizes per-step overhead (grid steps are
    sequential on a TPU core). The backward kernel streams two
    (maxpt, 32) blocks per tile and larger intermediates, so its cap is
    lower (VMEM stack is ~16 MB; tpb=8 overflows it in backward)."""
    cap = max_tpb
    if max_per_tile > 1024:
        cap = max(1, cap // (max_per_tile // 1024))
    for tpb in (8, 4, 2):
        if tpb <= cap and num_tiles % tpb == 0:
            return tpb
    return 1


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def blend_raw(gathered, counts, scalars, grid_x, grid_y, chunk, interpret,
              mode="full"):
    """(T, maxpt, 32) gathered feats → (T, P, 24) raw accumulators."""
    num_tiles = grid_x * grid_y
    max_per_tile = gathered.shape[1]
    tpb = _pick_tpb(num_tiles, max_per_tile, max_tpb=8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, max_per_tile, 32), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tpb, P, 24), lambda t, *_: (t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, tiles_per_block=tpb,
                          mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, 24), jnp.float32),
        interpret=interpret,
    )(counts, scalars, gathered)


def _blend_raw_fwd(gathered, counts, scalars, grid_x, grid_y, chunk,
                   interpret, mode="full"):
    out = blend_raw(gathered, counts, scalars, grid_x, grid_y, chunk,
                    interpret, mode)
    return out, (gathered, counts, scalars, out)


def _blend_raw_bwd(grid_x, grid_y, chunk, interpret, mode, res, cot):
    import numpy as _np

    gathered, counts, scalars, fwd_out = res
    num_tiles = grid_x * grid_y
    max_per_tile = gathered.shape[1]
    tpb = _pick_tpb(num_tiles, max_per_tile, max_tpb=_BWD_MAX_TPB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, max_per_tile, 32), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((tpb, P, 24), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((tpb, P, 24), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tpb, max_per_tile, 32), lambda t, *_: (t, 0, 0)),
    )
    dgathered = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, tiles_per_block=tpb,
                          mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, max_per_tile, 32), jnp.float32),
        interpret=interpret,
    )(counts, scalars, gathered, fwd_out, cot)
    return (
        dgathered,
        _np.zeros(counts.shape, jax.dtypes.float0),
        jnp.zeros_like(scalars),
    )


blend_raw.defvjp(_blend_raw_fwd, _blend_raw_bwd)


def gather_tile_windows(
    feats: jnp.ndarray,  # (N, C) packed per-gaussian features
    gauss_id: jnp.ndarray,  # (MP,) sorted pair → gaussian id, -1 padded
    tile_start: jnp.ndarray,  # (T,) pair-range starts
    max_per_tile: int,
) -> jnp.ndarray:  # (T, max_per_tile, C)
    """Per-tile feature blocks WITHOUT the (T·maxpt) random index gather.

    The sorted pair list is contiguous per tile, so each tile's block is a
    contiguous window [start, start+maxpt): one wide pair-level row gather
    + vmapped dynamic_slice. Measured 4.6 ms faster than
    pairs_to_idx_table + table gather at 512²/150k (the (T, maxpt) int
    gather is microcoded element-wise on TPU; contiguous slices are not).
    Rows beyond a tile's count alias the next tile's pairs — the kernels
    gate on ``counts`` so they are never read.
    """
    pair_feats = feats[jnp.maximum(gauss_id, 0)]  # (MP, C) wide gather
    pair_feats = jnp.pad(pair_feats, ((0, max_per_tile), (0, 0)))
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            pair_feats, (s, 0), (max_per_tile, pair_feats.shape[1]))
    )(tile_start)


def render_tiles_pallas(
    proj: ProjectedGaussians,
    idx_table: jnp.ndarray,  # (T, max_per_tile), -1 padded; or None
    counts: jnp.ndarray,  # (T,)
    height: int,
    width: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
    chunk: int = 256,
    interpret: bool = False,
    mode: str = "full",
    pairs=None,  # TilePairs — preferred over idx_table when given
    max_per_tile: int = 0,  # required with pairs
):
    """Differentiable Pallas render → RenderOutputs (max_contrib from the
    median contributor position)."""
    from igs_tpu.ops.render_tiles import RenderOutputs
    from igs_tpu.utils.safe_math import safe_norm

    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    feats = pack_features(proj)
    if pairs is not None:
        assert max_per_tile > 0
        gathered = gather_tile_windows(
            feats, pairs.gauss_id, pairs.tile_start, max_per_tile)
    else:
        gathered = feats[jnp.maximum(idx_table, 0)]
    scalars = jnp.concatenate(
        [jnp.asarray([grid_x], jnp.float32), jnp.zeros(7, jnp.float32)]
    )
    raw = blend_raw(
        gathered, counts.astype(jnp.int32), scalars,
        grid_x, grid_y, chunk, interpret, mode,
    )  # (T, P, 24)
    return _raw_to_outputs(
        raw, grid_x, grid_y, height, width, focal_x, focal_y, bg)


def _raw_to_outputs_color(raw, grid_x, grid_y, height, width, bg):
    """(T, P, 8) color-mode raw → RenderOutputs (color/alpha/n_contrib
    live, geometry outputs zero — the kernel never accumulates them)."""
    from igs_tpu.ops.render_tiles import RenderOutputs

    c = raw.shape[-1]
    img = raw.reshape(grid_y, grid_x, TILE_Y, TILE_X, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        c, grid_y * TILE_Y, grid_x * TILE_X
    )[:, :height, :width]
    color_acc = img[0:3]
    weight = img[3]
    logT = img[4]
    n_contrib = img[5]
    t_final = jnp.exp(logT)
    color = color_acc + t_final[None] * bg[:, None, None]
    z1 = jnp.zeros((height, width), jnp.float32)
    z3 = jnp.zeros((3, height, width), jnp.float32)
    return RenderOutputs(
        color=color,
        alpha=weight,
        coord=z3,
        mcoord=z3,
        depth=z1,
        mdepth=z1,
        normal=z3,
        accum_coord=z3,
        accum_depth=z1,
        n_contrib=n_contrib.astype(jnp.int32),
        max_contrib=jnp.zeros((height, width), jnp.int32),
    )


def _raw_to_outputs(raw, grid_x, grid_y, height, width, focal_x, focal_y,
                    bg):
    """(T, P, 24) raw accumulators → RenderOutputs (differentiable XLA)."""
    from igs_tpu.ops.render_tiles import RenderOutputs
    from igs_tpu.utils.safe_math import safe_norm

    def untile(x):
        c = x.shape[-1]
        img = x.reshape(grid_y, grid_x, TILE_Y, TILE_X, c)
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            c, grid_y * TILE_Y, grid_x * TILE_X
        )
        return img[:, :height, :width]

    img = untile(raw)  # (24, H, W)
    color_acc = img[0:3]
    weight = img[3]
    coord_acc = img[4:7]
    depth_acc = img[7]
    nrm_acc = img[8:11]
    mcoord = img[11:14]
    mdepth_t = img[14]
    logT = img[15]
    n_contrib = img[16]
    med_pos = img[17]

    t_final = jnp.exp(logT)
    color = color_acc + t_final[None] * bg[:, None, None]
    any_acc = n_contrib > 0.5
    wsafe = jnp.where(weight > 0, weight, 1.0)

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    lnf = jnp.sqrt(
        ((xs - width / 2.0) / focal_x) ** 2
        + ((ys - height / 2.0) / focal_y) ** 2
        + 1.0
    )
    depth_ln = depth_acc / lnf
    out_depth = jnp.where(any_acc, depth_ln / wsafe, 0.0)
    out_coord = jnp.where(any_acc[None], coord_acc / wsafe[None], 0.0)
    out_mdepth = mdepth_t / lnf
    nlen = jnp.maximum(safe_norm(nrm_acc, axis=0, keepdims=True), 1e-12)
    out_normal = jnp.where(any_acc[None], nrm_acc / nlen, 0.0)

    return RenderOutputs(
        color=color,
        alpha=weight,
        coord=out_coord,
        mcoord=mcoord,
        depth=out_depth,
        mdepth=out_mdepth,
        normal=out_normal,
        accum_coord=coord_acc,
        accum_depth=depth_ln,
        n_contrib=n_contrib.astype(jnp.int32),
        max_contrib=(med_pos + 1.0).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Packed-pair kernels: transposed (32, MP) feature layout + in-kernel DMA.
#
# The windowed path above streams (T, max_per_tile, 32) blocks — at N3DV
# scale tiles average ~420 live pairs against a 1024 budget, so >half the
# HBM traffic is padding, and the windows must first be materialized by
# gather_tile_windows (another full read+write). Here the kernel walks each
# tile's pair segment IN PLACE: features live once as (32, total_pairs)
# (binning.build_tile_pairs, UNALIGNED contiguous segments — no pad
# pairs), and each grid step issues double-buffered DMAs of (32, chunk)
# lane windows at the 128-floor of each segment, masking the head columns.
# Per-tile budgets (max_per_tile) disappear entirely, and the backward
# hands shared boundary windows between adjacent tiles through a stashed
# VMEM window so each 128-window is DMA-written exactly once.
#
# The compute is the same math as the windowed kernels with the two axes
# swapped: intermediates are (P pixels, chunk pairs), prefix/suffix scans
# over pairs become right-multiplies by triangular matrices, and feature
# contractions contract the pair (lane) axis on both sides.
# ---------------------------------------------------------------------------


def _pix_coords_t(t, scalars_ref):
    grid_x = scalars_ref[0].astype(jnp.int32)
    tx0 = ((t % grid_x) * TILE_X).astype(jnp.float32)
    ty0 = ((t // grid_x) * TILE_Y).astype(jnp.float32)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pixx = tx0 + (pidx % TILE_X).astype(jnp.float32)
    pixy = ty0 + (pidx // TILE_X).astype(jnp.float32)
    return pixx, pixy  # (P, 1)


def _common_chunk_t(ft, pixx, pixy):
    """Transposed _common_chunk: ft (32, W) feature rows, pix (P, 1)."""
    dx = ft[0:1, :] - pixx  # (P, W)
    dy = ft[1:2, :] - pixy
    power = (
        -0.5 * (ft[2:3, :] * dx * dx + ft[4:5, :] * dy * dy)
        - ft[3:4, :] * dx * dy
    )
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, ft[5:6, :] * expp)
    return dx, dy, power, expp, alpha


def _dma_window(feats_hbm, scratch, sem, off, chunk):
    """Start the async copy of lanes [off, off+chunk) into scratch.

    ``off`` is always a multiple of 128 by construction (window bases are
    the 128-floor of each tile's segment start plus chunk==128 strides);
    the multiple_of hint tells Mosaic the lane slice is tile-aligned so it
    can lower the dynamic-offset DMA.
    """
    return pltpu.make_async_copy(
        feats_hbm.at[:, pl.ds(pl.multiple_of(off, 128), chunk)],
        scratch, sem)


def _seg_base_head(start, chunk):
    """128-floor of a tile's segment start and its in-window offset.

    Segments are UNALIGNED (contiguous per tile, no pad pairs); the kernel
    DMAs aligned windows and masks the ``head`` columns that belong to the
    previous tile's tail.
    """
    base = (start // chunk) * chunk
    return base, start - base


def _fwd_kernel_packed(counts_ref, starts_ref, scalars_ref, feats_hbm,
                       out_ref, scratch_ref, sem_ref, *, chunk: int,
                       tiles_per_block: int, mode: str):
    # Cross-tile DMA pipelining: at N3DV densities the average tile holds
    # ~1 chunk, so a per-tile prologue-then-wait exposes the full HBM
    # latency once per tile. Issue EVERY tile's first-window DMA up front
    # into per-tile buffers — later tiles' first waits then overlap
    # earlier tiles' compute.
    t0 = pl.program_id(0) * out_ref.shape[0]
    for tt in range(tiles_per_block):
        @pl.when(counts_ref[t0 + tt] > 0)
        def _prologue(tt=tt):
            base, _ = _seg_base_head(starts_ref[t0 + tt], chunk)
            _dma_window(feats_hbm, scratch_ref.at[tt, 0],
                        sem_ref.at[tt, 0], base, chunk).start()
    for tt in range(tiles_per_block):
        _fwd_one_tile_packed(
            counts_ref, starts_ref, scalars_ref, feats_hbm, out_ref,
            scratch_ref, sem_ref, chunk=chunk, tt=tt, mode=mode)


def _fwd_one_tile_packed(counts_ref, starts_ref, scalars_ref, feats_hbm,
                         out_ref, scratch_ref, sem_ref, *, chunk: int,
                         tt: int, mode: str):
    t = pl.program_id(0) * out_ref.shape[0] + tt
    count = counts_ref[t]
    start = starts_ref[t]
    base, head = _seg_base_head(start, chunk)
    pixx, pixy = _pix_coords_t(t, scalars_ref)
    triu_inc = jnp.triu(jnp.ones((chunk, chunk), jnp.float32))
    tril_inc = triu_inc.T

    # count == 0 must not walk at all (head alone would round up to one
    # chunk whose DMA the prologue never issued)
    n_chunks = jnp.where(count > 0, pl.cdiv(head + count, chunk), 0)

    def dotl(a, b, a_exact=False):  # (P, W) ×(contract W) (K, W) → (P, K)
        return _dot3(a, b, (((1,), (1,)), ((), ())), a_exact=a_exact)

    # double buffering: slot c%2 of this tile's buffer pair holds chunk c;
    # chunk 0's DMA was issued by the kernel-level prologue.

    carry0 = (
        jnp.zeros((P, 1), jnp.float32),  # 0 logT
        jnp.zeros((P, 1), jnp.float32),  # 1 done
        jnp.zeros((P, 4), jnp.float32),  # 2 color3 + weight1
        jnp.zeros((P, 4), jnp.float32),  # 3 coord3 + depth1
        jnp.zeros((P, 4), jnp.float32),  # 4 normal3 + pad
        jnp.zeros((P, 4), jnp.float32),  # 5 mcoord3 + mdepth1
        jnp.zeros((P, 1), jnp.float32),  # 6 n_contrib
        jnp.full((P, 1), -1.0),          # 7 med_pos
        jnp.int32(0),                    # 8 chunk index
    )

    def cond(c):
        return (c[8] < n_chunks) & (jnp.min(c[1]) < 0.5)

    def body(carry):
        (logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib, medpos,
         c) = carry
        slot = c % 2
        _dma_window(feats_hbm, scratch_ref.at[tt, slot],
                    sem_ref.at[tt, slot],
                    base + c * chunk, chunk).wait()

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            _dma_window(
                feats_hbm, scratch_ref.at[tt, (c + 1) % 2],
                sem_ref.at[tt, (c + 1) % 2],
                base + (c + 1) * chunk, chunk).start()

        ft = scratch_ref[tt, slot]  # (32, chunk)
        # local pair index within this tile's segment; columns with
        # loc < 0 are the previous tile's tail sharing our head window
        slot_row = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                    + c * chunk - head)
        live = (slot_row >= 0) & (slot_row < count)
        dx, dy, power, _, alpha = _common_chunk_t(ft, pixx, pixy)
        cand = live & (power <= 0.0) & (alpha >= _MIN_ALPHA)
        a = jnp.where(cand, alpha, 0.0)
        log1m = jnp.log1p(-a)
        cum_incl = logT + _tri_dot(log1m, triu_inc)
        alive = cum_incl >= _LOG_TERM
        accept = cand & alive & (done < 0.5)
        t_before = jnp.exp(cum_incl - log1m)
        w = jnp.where(accept, a * t_before, 0.0)
        wdx = w * dx
        wdy = w * dy

        ones_row = jnp.ones((1, chunk), jnp.float32)
        f_cw = jnp.concatenate([ft[6:9, :], ones_row], axis=0)  # (4, W)
        if mode != "color":  # lanes 9-23 absent from the 16-lane pack
            f_cd_w = jnp.concatenate([ft[9:12, :], ft[12:13, :]], axis=0)
            f_cd_x = jnp.concatenate([ft[13:16, :], ft[19:20, :]], axis=0)
            f_cd_y = jnp.concatenate([ft[16:19, :], ft[20:21, :]], axis=0)
            f_n = jnp.concatenate(
                [ft[21:24, :], jnp.zeros((1, chunk), jnp.float32)], axis=0)

        acc_cw = acc_cw + dotl(w, f_cw)
        slotf = slot_row.astype(jnp.float32)
        if mode != "color":
            acc_cd = (
                acc_cd
                + dotl(w, f_cd_w)
                + dotl(wdx, f_cd_x)
                + dotl(wdy, f_cd_y)
            )
        if mode == "full":
            acc_n = acc_n + dotl(w, f_n)

            med = (accept & (t_before > 0.5)).astype(jnp.float32)
            suffix = jnp.dot(med, tril_inc, precision=LO)
            last = med * (suffix < 1.5)
            has = jnp.sum(last, axis=1, keepdims=True)  # (P, 1)
            med_new = (
                dotl(last, f_cd_w, a_exact=True)
                + dotl(last * dx, f_cd_x)
                + dotl(last * dy, f_cd_y)
            )
            acc_med = jnp.where(has > 0.5, med_new, acc_med)
            medpos_new = jnp.sum(last * slotf, axis=1, keepdims=True)
            medpos = jnp.where(has > 0.5, medpos_new, medpos)

        acceptf = accept.astype(jnp.float32)
        ncontrib = jnp.maximum(
            ncontrib,
            jnp.max(acceptf * (slotf + 1.0), axis=1, keepdims=True),
        )
        logT = logT + jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=1, keepdims=True
        )
        done = jnp.maximum(
            done,
            jnp.max(jnp.where(cand & ~alive, 1.0, 0.0), axis=1,
                    keepdims=True),
        )
        return (logT, done, acc_cw, acc_cd, acc_n, acc_med, ncontrib,
                medpos, c + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    logT, _, acc_cw, acc_cd, acc_n, acc_med, ncontrib, medpos, cf = out

    # drain: on early termination (every pixel saturated) the loop exits
    # with chunk cf's prefetch still in flight; its semaphore signal must
    # be consumed or the next tile/grid step reusing this buffer pair
    # would see a stale completion and read garbage.
    @pl.when(cf < n_chunks)
    def _drain():
        _dma_window(feats_hbm, scratch_ref.at[tt, cf % 2],
                    sem_ref.at[tt, cf % 2],
                    base + cf * chunk, chunk).wait()

    if mode == "color":
        # 8-lane raw block: [C(3) | W(1) | logT | n_contrib | pad(2)] —
        # the coord/depth/normal/median accumulators are identically zero
        # in color mode, and the (T, P, 24) HBM write + its untile
        # transpose were ~1/3 of the forward's cost at 512².
        out_ref[tt, :, :] = jnp.concatenate(
            [
                acc_cw,              # 0:4  C, W
                logT,                # 4
                ncontrib,            # 5
                jnp.zeros((P, 2), jnp.float32),
            ],
            axis=1,
        )
    else:
        out_ref[tt, :, :] = jnp.concatenate(
            [
                acc_cw,
                acc_cd,
                acc_n[:, 0:3],
                acc_med,
                logT,
                ncontrib,
                medpos,
                jnp.zeros((P, 6), jnp.float32),
            ],
            axis=1,
        )


def _out_copy(oscratch_ref, dout_hbm, osem_ref, tt, oslot, off, chunk):
    """Async copy of tile tt's (32, chunk) grad block to its pair segment.

    Reconstructed descriptors with the same semaphore are also used to
    WAIT on a previously started copy (the wait consumes the semaphore
    signal; src/dst only size the bookkeeping)."""
    return pltpu.make_async_copy(
        oscratch_ref.at[tt, oslot],
        dout_hbm.at[:, pl.ds(pl.multiple_of(off, 128), chunk)],
        osem_ref.at[tt, oslot],
    )


def _bwd_c_start(counts_ref, starts_ref, fwd_ref, t, tt, chunk,
                 mode="full"):
    """Index of the LAST chunk the backward pass must visit for tile tt
    (the forward's n_contrib early-termination skip), or -1 if none.

    Tiles with pairs but zero contributors still walk ONE chunk
    (limit floored at 1) so the boundary-window hand-off chain
    (merge / stash / skip, see _bwd_one_tile_packed) stays unbroken."""
    count = counts_ref[t]
    _, head = _seg_base_head(starts_ref[t], chunk)
    nc_lane = 5 if mode == "color" else 16  # 8- vs 24-lane raw layout
    nc_max = jnp.max(fwd_ref[tt, :, nc_lane:nc_lane + 1]).astype(jnp.int32)
    limit = jnp.minimum(count, jnp.maximum(nc_max, 1))
    return jnp.where(count > 0, pl.cdiv(head + limit, chunk) - 1, -1)


def _bwd_write_tail(counts_ref, starts_ref, scalars_ref, t, c_start, chunk):
    """Whether tile t itself DMAs its LAST walked window (chunk c_start).

    Boundary windows are shared between adjacent tiles' segments; exactly
    ONE tile writes each window — the last one whose walk covers it. If
    the next real pair (at ``end``) falls inside this window, a later tile
    will merge our stashed content into its own write, so we skip ours
    (two DMAs to the same window would race)."""
    start = starts_ref[t]
    base, _ = _seg_base_head(start, chunk)
    end = start + counts_ref[t]
    total = scalars_ref[1].astype(jnp.int32)  # num real pairs
    tail_end = base + (c_start + 1) * chunk
    return (end >= total) | (end >= tail_end)


def _bwd_kernel_packed(counts_ref, starts_ref, scalars_ref, feats_hbm,
                       fwd_ref, cot_ref, dz_hbm, dout_hbm, scratch_ref,
                       oscratch_ref, pwin_ref, ex_ref, pbase_ref, sem_ref,
                       osem_ref, *, chunk: int, tiles_per_block: int,
                       mode: str):
    del dz_hbm  # zero-initialized alias of dout_hbm
    t0 = pl.program_id(0) * fwd_ref.shape[0]
    # boundary-chain state persists across tiles AND grid steps; -1 marks
    # "no stashed window" at the very first grid step
    @pl.when(pl.program_id(0) == 0)
    def _init_chain():
        pbase_ref[0] = jnp.int32(-1)

    # cross-tile pipelining: issue every tile's first-window DMA up front
    # (see _fwd_kernel_packed); c_start/write_tail computed ONCE per tile
    # and shared with the walk and the drains (the (P,) n_contrib max is
    # not free ×3)
    cs, wt = [], []
    for tt in range(tiles_per_block):
        c_start = _bwd_c_start(counts_ref, starts_ref, fwd_ref, t0 + tt,
                               tt, chunk, mode)
        cs.append(c_start)
        wt.append(_bwd_write_tail(counts_ref, starts_ref, scalars_ref,
                                  t0 + tt, c_start, chunk))

        @pl.when(c_start >= 0)
        def _prologue(tt=tt, c_start=c_start):
            base, _ = _seg_base_head(starts_ref[t0 + tt], chunk)
            _dma_window(feats_hbm, scratch_ref.at[tt, c_start % 2],
                        sem_ref.at[tt, c_start % 2],
                        base + c_start * chunk, chunk).start()
    for tt in range(tiles_per_block):
        _bwd_one_tile_packed(
            counts_ref, starts_ref, scalars_ref, feats_hbm, fwd_ref,
            cot_ref, dout_hbm, scratch_ref, oscratch_ref, pwin_ref,
            ex_ref, pbase_ref, sem_ref, osem_ref, chunk=chunk, tt=tt,
            mode=mode, c_start=cs[tt], write_tail=wt[tt])
    # drain: each tile's chunks 0 and 1 (its LAST two writes, reverse
    # order) may still have output copies in flight (every walked chunk
    # starts a copy — a skipped tail redirects to the dump block)
    for tt in range(tiles_per_block):
        base, _ = _seg_base_head(starts_ref[t0 + tt], chunk)

        @pl.when(cs[tt] >= 0)
        def _drain0(tt=tt, base=base):
            _out_copy(oscratch_ref, dout_hbm, osem_ref, tt, 0,
                      base, chunk).wait()

        @pl.when(cs[tt] >= 1)
        def _drain1(tt=tt, base=base):
            _out_copy(oscratch_ref, dout_hbm, osem_ref, tt, 1,
                      base + chunk, chunk).wait()


def _bwd_one_tile_packed(counts_ref, starts_ref, scalars_ref, feats_hbm,
                         fwd_ref, cot_ref, dout_hbm, scratch_ref,
                         oscratch_ref, pwin_ref, ex_ref, pbase_ref,
                         sem_ref, osem_ref, *, chunk: int, tt: int,
                         mode: str, c_start, write_tail):
    t = pl.program_id(0) * fwd_ref.shape[0] + tt
    count = counts_ref[t]
    start = starts_ref[t]
    base, head = _seg_base_head(start, chunk)
    pixx, pixy = _pix_coords_t(t, scalars_ref)
    ones_c = jnp.ones((chunk, chunk), jnp.float32)
    tril_inc = jnp.tril(ones_c)          # suffix inclusive (j ≥ i)
    tril_exc = tril_inc - jnp.eye(chunk, dtype=jnp.float32)  # j > i

    fwd = fwd_ref[tt, :, :]  # (P, 8) color / (P, 24) full
    cot = cot_ref[tt, :, :]
    if mode == "color":  # 8-lane raw layout (see _fwd_one_tile_packed)
        logT_final = fwd[:, 4:5]  # (P, 1)
        ncontrib = fwd[:, 5:6]
        medpos = uCD = uN = uMed = None
        ulogT = cot[:, 4:5]
    else:
        logT_final = fwd[:, 15:16]  # (P, 1)
        ncontrib = fwd[:, 16:17]
        medpos = fwd[:, 17:18]
        uCD = cot[:, 4:8]
        uN = cot[:, 8:11]
        uMed = cot[:, 11:15]
        ulogT = cot[:, 15:16]  # (P, 1)
    uC = cot[:, 0:3]
    uW = cot[:, 3:4]
    uCW = jnp.concatenate([uC, uW], axis=1)  # (P, 4)

    def dotc(a, b, b_exact=False):  # (P, K) × (P, W) → (K, W)
        return _dot3(a, b, (((0,), (0,)), ((), ())), b_exact=b_exact)

    def mm3(a, b, a_exact=False):  # (P, K) × (K, W) → (P, W)
        return _dot3(a, b, (((1,), (0,)), ((), ())), a_exact=a_exact)

    # chunk c_start's DMA was issued by the kernel-level prologue

    # capture the PREDECESSOR's stashed boundary window before our own
    # walk stashes over it (the tail stash happens at chunk c_start, the
    # head merge that needs the predecessor's content at chunk 0 — later
    # in the reverse walk). Staged through ex_ref and loaded at the point
    # of use: carrying the (lanes, chunk) value live across the loop
    # spills vregs (measured +12% on the 100k bench scene).
    ex_ref[...] = jnp.where(pbase_ref[0] == base, pwin_ref[...], 0.0)

    def cond(carry):
        return carry[2] >= 0

    def body(carry):
        s_carry, logT_end, c = carry
        slot = c % 2
        _dma_window(feats_hbm, scratch_ref.at[tt, slot],
                    sem_ref.at[tt, slot],
                    base + c * chunk, chunk).wait()

        @pl.when(c - 1 >= 0)
        def _prefetch():
            _dma_window(feats_hbm, scratch_ref.at[tt, (c - 1) % 2],
                        sem_ref.at[tt, (c - 1) % 2],
                        base + (c - 1) * chunk, chunk).start()

        ft = scratch_ref[tt, slot]
        # local pair index within this tile's segment; columns with
        # loc < 0 are the previous tile's tail sharing our head window
        slot_row = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                    + c * chunk - head)
        slotf = slot_row.astype(jnp.float32)
        dx, dy, power, expp, alpha = _common_chunk_t(ft, pixx, pixy)
        accept = (
            (slot_row >= 0)
            & (slot_row < count)
            & (power <= 0.0)
            & (alpha >= _MIN_ALPHA)
            & ((slotf + 1.0) <= ncontrib)
        )
        a = jnp.where(accept, alpha, 0.0)
        log1m = jnp.log1p(-a)
        # T-recovery subtracts this suffix from logT_final — catastrophic
        # cancellation amplifies rounding here (2-pass measured 4× the
        # windowed path's grad error), so split a THIRD residual level:
        # err ~2^-26·|x|, finer than a single f32 rounding, at half the
        # MXU passes of HIGHEST.
        h1 = log1m.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = log1m - h1
        h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        suffix_incl = (
            jnp.dot(h1, tril_inc, precision=LO)
            + jnp.dot(h2, tril_inc, precision=LO)
            + jnp.dot(r1 - h2, tril_inc, precision=LO)
        )
        logT_i = logT_end - suffix_incl
        t_i = jnp.exp(logT_i)
        w = jnp.where(accept, a * t_i, 0.0)

        ones_row = jnp.ones((1, chunk), jnp.float32)
        f_cw = jnp.concatenate([ft[6:9, :], ones_row], axis=0)
        if mode != "color":  # lanes 9-23 absent from the 16-lane pack
            f_cd_w = jnp.concatenate([ft[9:12, :], ft[12:13, :]], axis=0)
            f_cd_x = jnp.concatenate([ft[13:16, :], ft[19:20, :]], axis=0)
            f_cd_y = jnp.concatenate([ft[16:19, :], ft[20:21, :]], axis=0)
            f_n4 = jnp.concatenate(
                [ft[21:24, :], jnp.zeros((1, chunk), jnp.float32)], axis=0)

        # g feeds da = t_i·g − (s+ulogT)/(1−a), a cancellation-prone
        # difference — keep the dL/dw assembly at HIGHEST (the split-pass
        # version measured 2.7e-3 grad error vs the 2e-3 gate)
        g = jnp.dot(uCW, f_cw, precision=HI)  # (P, W)
        if mode != "color":
            gx = jnp.dot(uCD, f_cd_x, precision=HI)
            gy = jnp.dot(uCD, f_cd_y, precision=HI)
            g = g + jnp.dot(uCD, f_cd_w, precision=HI) + dx * gx + dy * gy
        if mode == "full":
            g = g + jnp.dot(
                jnp.concatenate(
                    [uN, jnp.zeros((P, 1), jnp.float32)], axis=1),
                f_n4, precision=HI)
        wg = w * g
        s_cur = s_carry + _tri_dot(wg, tril_exc)

        da = jnp.where(
            accept,
            t_i * g - (s_cur + ulogT) / (1.0 - a),
            0.0,
        )
        notclip = (alpha < 0.99).astype(jnp.float32)
        dpower = da * a * notclip
        dop_px = da * expp * notclip

        ddx = dpower * (-(ft[2:3, :] * dx + ft[3:4, :] * dy))
        ddy = dpower * (-(ft[4:5, :] * dy + ft[3:4, :] * dx))
        if mode != "color":
            ddx = ddx + w * gx
            ddy = ddy + w * gy
        if mode == "full":
            lastm = (
                (slotf == medpos) & (medpos >= 0.0)
            ).astype(jnp.float32)  # (P, W)
            ldx = lastm * dx
            ldy = lastm * dy
            ddx = ddx + lastm * mm3(uMed, f_cd_x)
            ddy = ddy + lastm * mm3(uMed, f_cd_y)

        wdx = w * dx
        wdy = w * dy
        dxy_x = jnp.sum(ddx, axis=0, keepdims=True)  # (1, W)
        dxy_y = jnp.sum(ddy, axis=0, keepdims=True)
        dconic = jnp.concatenate(
            [
                jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True),
                jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True),
                jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True),
            ],
            axis=0,
        )  # (3, W)
        dop = jnp.sum(dop_px, axis=0, keepdims=True)
        dcolor = dotc(uC, w)  # (3, W)
        if mode != "color":
            dvp_t = dotc(uCD, w)  # (4, W)
            dcpx_rp0 = dotc(uCD, wdx)
            dcpy_rp1 = dotc(uCD, wdy)
        else:
            dvp_t = jnp.zeros((4, chunk), jnp.float32)
            dcpx_rp0 = jnp.zeros((4, chunk), jnp.float32)
            dcpy_rp1 = jnp.zeros((4, chunk), jnp.float32)
        if mode == "full":
            dvp_t = dvp_t + dotc(uMed, lastm, b_exact=True)
            dcpx_rp0 = dcpx_rp0 + dotc(uMed, ldx)
            dcpy_rp1 = dcpy_rp1 + dotc(uMed, ldy)
            dnrm = dotc(uN, w)  # (3, W)
        else:
            dnrm = jnp.zeros((3, chunk), jnp.float32)

        if mode == "color":
            # 16-lane pack: only geometry/opacity/color grads exist
            block = jnp.concatenate(
                [
                    dxy_x,           # 0:2
                    dxy_y,
                    dconic,          # 2:5
                    dop,             # 5
                    dcolor,          # 6:9
                    jnp.zeros((7, chunk), jnp.float32),
                ],
                axis=0,
            )  # (16, W)
        else:
            block = jnp.concatenate(
                [
                    dxy_x,               # 0:2
                    dxy_y,
                    dconic,              # 2:5
                    dop,                 # 5
                    dcolor,              # 6:9
                    dvp_t[0:3, :],       # 9:12
                    dvp_t[3:4, :],       # 12
                    dcpx_rp0[0:3, :],    # 13:16
                    dcpy_rp1[0:3, :],    # 16:19
                    dcpx_rp0[3:4, :],    # 19
                    dcpy_rp1[3:4, :],    # 20
                    dnrm,                # 21:24
                    jnp.zeros((8, chunk), jnp.float32),
                ],
                axis=0,
            )  # (32, W)
        # ---- boundary-window hand-off chain -------------------------
        # Segments are unaligned, so the head window (chunk 0, when
        # head > 0) is shared with earlier tiles' tails and the tail
        # window (chunk c_start) may be shared with later tiles' heads.
        # Each window is DMA'd by exactly ONE tile: the head window
        # merges the previous writer's stashed content (pwin_ref, valid
        # when its base matches — otherwise the window was never written
        # and the zero-aliased output is correct), and the tail window is
        # skipped (stash only) when a later tile will write it merged.
        is_head = (c == 0) & (head > 0)
        live_col = (slot_row >= 0) & (slot_row < count)  # (1, chunk)
        block = jnp.where(
            is_head & jnp.logical_not(live_col), ex_ref[...], block)

        is_tail = c == c_start

        @pl.when(is_tail)
        def _stash(block=block):
            pwin_ref[...] = block
            pbase_ref[0] = base + c * chunk

        # write out through this tile's out-scratch pair, double-buffered:
        # before overwriting a slot, consume the semaphore of the copy
        # started on it two chunks ago (chunk c+2, reverse order); the
        # copies still in flight when the loop ends are drained at the
        # END of the kernel. Every walked chunk starts a copy — a skipped
        # tail redirects to the dump block (the padded last window of
        # dout, whose content is sliced away by the caller), keeping the
        # DMA schedule branch-free; concurrent dump writes are a benign
        # write-write race on never-read scratch columns.
        oslot = c % 2

        @pl.when(c + 2 <= c_start)
        def _owait():
            _out_copy(oscratch_ref, dout_hbm, osem_ref, tt, oslot,
                      base + (c + 2) * chunk, chunk).wait()

        oscratch_ref[tt, oslot] = block
        dump_off = dout_hbm.shape[1] - chunk
        off = jnp.where(is_tail & jnp.logical_not(write_tail),
                        dump_off, base + c * chunk)
        _out_copy(oscratch_ref, dout_hbm, osem_ref, tt, oslot,
                  off, chunk).start()

        s_next = s_carry + jnp.sum(wg, axis=1, keepdims=True)
        logT_next = logT_end - jnp.sum(
            jnp.where(accept, log1m, 0.0), axis=1, keepdims=True
        )
        return (s_next, logT_next, c - 1)

    jax.lax.while_loop(
        cond, body,
        (jnp.zeros((P, 1), jnp.float32), logT_final, c_start),
    )


def _packed_tpb(num_tiles: int) -> int:
    for tpb in (8, 4, 2):
        if num_tiles % tpb == 0:
            return tpb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_raw_packed(feats_t, counts, starts, scalars, grid_x, grid_y,
                     interpret, mode="full"):
    """(32, total_pairs) packed feats → (T, P, nl) raw accumulators.

    ``feats_t`` is the TRANSPOSED per-pair feature array over UNALIGNED
    contiguous tile segments (binning.build_tile_pairs); the kernel walks
    each segment with double-buffered (32, 128) DMAs at 128-aligned window
    bases, masking the head columns that belong to the previous tile.
    """
    num_tiles = grid_x * grid_y
    chunk = 128  # DMA window width; see docstring
    lanes = feats_t.shape[0]  # 16 (color mode) or 32
    nl = 8 if mode == "color" else 24  # raw lanes (see _fwd_one_tile_packed)
    tpb = _packed_tpb(num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((tpb, P, nl), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tpb, 2, lanes, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_packed, chunk=chunk,
                          tiles_per_block=tpb, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, nl), jnp.float32),
        interpret=interpret,
    )(counts, starts, scalars, feats_t)


def _blend_raw_packed_fwd(feats_t, counts, starts, scalars, grid_x, grid_y,
                          interpret, mode="full"):
    out = blend_raw_packed(feats_t, counts, starts, scalars, grid_x,
                           grid_y, interpret, mode)
    return out, (feats_t, counts, starts, scalars, out)


def _blend_raw_packed_bwd(grid_x, grid_y, interpret, mode, res, cot):
    import numpy as _np

    feats_t, counts, starts, scalars, fwd_out = res
    num_tiles = grid_x * grid_y
    chunk = 128
    lanes = feats_t.shape[0]  # 16 (color mode) or 32
    nl = 8 if mode == "color" else 24
    tpb = _packed_tpb(num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((tpb, P, nl), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((tpb, P, nl), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((tpb, 2, lanes, chunk), jnp.float32),
            pltpu.VMEM((tpb, 2, lanes, chunk), jnp.float32),
            pltpu.VMEM((lanes, chunk), jnp.float32),  # stashed boundary win
            pltpu.VMEM((lanes, chunk), jnp.float32),  # staged predecessor win
            pltpu.SMEM((1,), jnp.int32),              # stash window base
            pltpu.SemaphoreType.DMA((tpb, 2)),
            pltpu.SemaphoreType.DMA((tpb, 2)),
        ],
    )
    # pad segments the kernel never reaches (beyond each tile's n_contrib
    # limit, between-segment pad lanes, the invalid-pair tail) must come
    # back zero: alias a zeros input to the output buffer. The alias index
    # counts ALL pallas_call operands incl. the scalar-prefetch ones.
    dzero = jnp.zeros_like(feats_t)
    dfeats_t = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, chunk=chunk,
                          tiles_per_block=tpb, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats_t.shape, jnp.float32),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(counts, starts, scalars, feats_t, fwd_out, cot, dzero)
    return (
        dfeats_t,
        _np.zeros(counts.shape, jax.dtypes.float0),
        _np.zeros(starts.shape, jax.dtypes.float0),
        jnp.zeros_like(scalars),
    )


blend_raw_packed.defvjp(_blend_raw_packed_fwd, _blend_raw_packed_bwd)


def render_tiles_pallas_packed(
    proj: ProjectedGaussians,
    pairs,  # TilePairs from build_tile_pairs
    height: int,
    width: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
    interpret: bool = False,
    mode: str = "full",
):
    """Packed-pair Pallas render: no per-tile budget, ~2× less HBM traffic
    than the windowed path at N3DV tile densities."""
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    feats = pack_features(proj)  # (N, 32)
    if mode == "color":
        # color mode reads only lanes 0-8 (geometry+opacity+color) and
        # writes grads only there — a 16-lane pack halves the pair
        # gather, the kernel DMA traffic, and the AD scatter-add
        feats = feats[:, :16]
    assert pairs.gauss_id.shape[0] % 128 == 0, "max_pairs must be 128-aligned"
    if pairs.gauss_last_row.size > 0:
        # full mode: per-pair feature gather whose VJP avoids the
        # microcoded (MP, L) → (N, L) scatter-add — inverse-permute +
        # Pallas segmented scan + boundary gather (ops/segred.py; ~3 ms
        # faster than the scatter at 524k pairs / 150k on v5e). The
        # color backward measured FASTER with the plain scatter (A/B in
        # tools_bench_segred_ab.py), so color binning omits the aux.
        from igs_tpu.ops.segred import gather_pairs

        pair_feats = gather_pairs(
            feats, pairs.gauss_id, pairs.exp_to_sorted, pairs.exp_gauss_id,
            pairs.gauss_last_row, interpret)  # (MP, lanes)
    else:
        pair_feats = feats[jnp.maximum(pairs.gauss_id, 0)]  # (MP, lanes)
    # +1 window of pad rows: the backward's dump block for skipped
    # boundary-window copies (pad's VJP slices the grads back to MP rows)
    pair_feats = jnp.pad(pair_feats, ((0, 128), (0, 0)))
    feats_t = pair_feats.T  # (lanes, MP + 128) — lanes = pairs
    # scalars[1] = number of real pairs: the backward's boundary-window
    # hand-off needs to know whether a later tile exists past a segment
    scalars = jnp.concatenate(
        [jnp.asarray([grid_x], jnp.float32),
         pairs.num_pairs.astype(jnp.float32)[None],
         jnp.zeros(6, jnp.float32)]
    )
    raw = blend_raw_packed(
        feats_t, pairs.tile_count.astype(jnp.int32),
        pairs.tile_start.astype(jnp.int32), scalars,
        grid_x, grid_y, interpret, mode,
    )
    if mode == "color":
        return _raw_to_outputs_color(raw, grid_x, grid_y, height, width, bg)
    return _raw_to_outputs(
        raw, grid_x, grid_y, height, width, focal_x, focal_y, bg)
