"""Public differentiable rasterization API.

TPU-native replacement for the reference's three CUDA extensions
(diff-gaussian-rasterization RaDe-GS / clamp / compress variants,
SURVEY.md §2.1): one implementation with flags —
  * ``clamp_grads=True``  ≡ the *_clamp variant: every Gaussian-parameter
    gradient clamped to ±15 (…_rade_clamp/__init__.py:156-162).
  * ``count_mode=True``   ≡ the compress variant's importance counting
    (per-Gaussian hit count and Σ blended-opacity importance,
    compress …/forward.cu:392,542-558) — here a cheap extra output of the
    same forward.

Inputs follow the reference binding (…_rade/__init__.py:177-243): activated
opacity/scales, normalized rotations, raw SH. ``means2d_offset`` is the
JAX-idiomatic stand-in for the torch ``screenspace_points`` trick: an NDC
offset added to the projected mean whose gradient equals the reference's
``grad_means2D`` (backward.cu dL_dmean2D, NDC-scaled) for densification.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from igs_tpu.ops.binning import build_tile_pairs, image_tile_grid
from igs_tpu.ops.projection import project
from igs_tpu.ops.raster_ref import render_reference
from igs_tpu.ops.render_tiles import RenderOutputs, render_tiles


class RasterSettings(NamedTuple):
    """Static rasterization configuration (hashable, jit-friendly)."""

    image_height: int = 512
    image_width: int = 512
    sh_degree: int = 3
    kernel_size: float = 0.0  # RaDe-GS default in IGS (gs.py:606)
    scale_modifier: float = 1.0
    max_pairs: int = 2**21
    max_per_tile: int = 4096
    chunk: int = 128  # pair-chunk per kernel step; 128 measured fastest
    # at 512²/150k (tools_bench_blend.py: 58.4 vs 60.3 ms fwd+bwd @256)
    # "tiles" = exact XLA path (gradcheck oracle); "pallas" = fused
    # windowed kernels; "pallas_packed" = fused kernels walking the sorted
    # pair list in place (no per-tile budget, least HBM traffic — production)
    impl: str = "tiles"
    binning: str = "sort"  # "sort" (merge-searchsorted) | "compact"
    pallas_interpret: bool = False  # interpreter mode (CPU tests)
    # "full" = all RaDe-GS outputs; "color" = color/alpha only (the refine
    # loss touches only color — skips median/coord/normal work in the
    # Pallas kernels; those outputs come back as zeros)
    outputs: str = "full"
    clamp_grads: bool = False
    clamp_value: float = 15.0


def _rasterize_impl(
    means3d,
    opacity,
    scaling,
    rotation,
    shs,
    colors_precomp,
    means2d_offset,
    bg,
    camera,
    settings: RasterSettings,
    valid,
    strip_row0=None,
    pairs_override=None,
):
    proj = project(
        means3d,
        scaling,
        rotation,
        opacity,
        camera,
        shs=shs,
        colors_precomp=colors_precomp,
        sh_degree=settings.sh_degree,
        kernel_size=settings.kernel_size,
        scale_modifier=settings.scale_modifier,
        valid=valid,
        # color-only rendering never reads camera/ray planes or normals —
        # skip their whole chain (and its AD transpose in the backward)
        geometry=settings.outputs != "color",
    )
    if means2d_offset is not None:
        # NDC offset → pixel offset (ndc2Pix is affine with slope S/2)
        scale = jnp.array(
            [0.5 * settings.image_width, 0.5 * settings.image_height],
            dtype=jnp.float32,
        )
        proj = proj._replace(means2d=proj.means2d + means2d_offset * scale[None, :])

    if strip_row0 is not None:
        # Tile-row strip rendering (cross-chip image sharding): the camera
        # is the FULL image's; settings.image_height is the strip height.
        # Shift projection into strip-local pixel space — the gaussian/tile
        # pair sets decompose exactly by tile row, and conic/depth/color
        # are translation-invariant, so a strip render equals the matching
        # rows of the full render to float accuracy (chunk grouping in the
        # packed kernel depends on each segment's global offset, so the
        # prefix dots associate differently — last-ulp drift only;
        # tests/test_rasterize.py::TestStripRendering).
        from igs_tpu.ops.projection import TILE_Y

        rows_local = settings.image_height // TILE_Y
        row0px = (strip_row0 * TILE_Y).astype(jnp.float32)
        rymin = jnp.clip(proj.rect_min[:, 1] - strip_row0, 0, rows_local)
        rymax = jnp.clip(proj.rect_max[:, 1] - strip_row0, 0, rows_local)
        tiles = (proj.rect_max[:, 0] - proj.rect_min[:, 0]) * (rymax - rymin)
        proj = proj._replace(
            means2d=proj.means2d
            - jnp.stack([jnp.zeros_like(row0px), row0px])[None, :],
            rect_min=jnp.stack([proj.rect_min[:, 0], rymin], -1),
            rect_max=jnp.stack([proj.rect_max[:, 0], rymax], -1),
            tiles_touched=jnp.where(proj.visible, tiles, 0),
        )

    h, w = settings.image_height, settings.image_width
    fx, fy = camera.focal_x, camera.focal_y
    if settings.impl == "reference":
        out = render_reference(proj, h, w, fx, fy, bg)
        overflow = jnp.zeros((), jnp.int32)
    else:
        from igs_tpu.ops.binning import build_tile_lists_compact
        from igs_tpu.ops.render_tiles import pairs_to_idx_table

        grid_x, grid_y = image_tile_grid(h, w)
        pairs = None
        if settings.impl == "pallas_packed":
            from igs_tpu.ops.pallas_blend import render_tiles_pallas_packed

            if pairs_override is not None:
                # caller-supplied (possibly stale) pair list — the refine
                # loop's rebin_every amortization (stream/refine.py)
                pairs = pairs_override
            else:
                # segred VJP for full AND color backward. The r3b
                # standalone A/B had color-scatter winning (it fuses with
                # its preceding transpose there), but in the REAL consumer
                # — the fused refine loop — segred wins 28.4 vs 29.7
                # ms/step (tools_bench_segred_loop.py r4): the scatter
                # serializes against the kernels in-loop, like the
                # histogram scatter did (PERF r3 item 13). color_depth
                # keeps the scatter (no in-context consumer measured).
                pairs = build_tile_pairs(
                    proj, grid_x, grid_y, settings.max_pairs,
                    segred_aux=settings.outputs in ("full", "color"))
            out = render_tiles_pallas_packed(
                proj, pairs, h, w, fx, fy, bg,
                interpret=settings.pallas_interpret,
                mode=settings.outputs,
            )
            # no per-tile budget in the packed path; only the global pair
            # budget can truncate
            overflow = jnp.where(pairs.overflowed, jnp.int32(1 << 20), 0)
            return out, proj, overflow
        if settings.binning == "compact":
            idx_table, counts = build_tile_lists_compact(
                proj, grid_x, grid_y, settings.max_per_tile
            )
            overflow = jnp.zeros((), jnp.int32)  # surfaced via sort path only
        else:
            pairs = build_tile_pairs(proj, grid_x, grid_y, settings.max_pairs)
            # the pallas path consumes the sorted pair list directly
            # (contiguous per-tile windows); only the XLA tiles path needs
            # the materialized index table
            idx_table = (
                None if settings.impl == "pallas"
                else pairs_to_idx_table(pairs, settings.max_per_tile)
            )
            counts = jnp.minimum(pairs.tile_count, settings.max_per_tile)
            # static-budget exhaustion (VERDICT r1 weak-4): tiles silently
            # clamped to max_per_tile + global pair-budget overflow. The
            # CUDA reference sizes buffers dynamically; a static design
            # must SURFACE the truncation instead.
            overflow = (
                jnp.sum((pairs.tile_count > settings.max_per_tile)
                        .astype(jnp.int32))
                + jnp.where(pairs.overflowed, jnp.int32(1 << 20), 0)
            )
        if settings.impl == "pallas":
            from igs_tpu.ops.pallas_blend import render_tiles_pallas

            out = render_tiles_pallas(
                proj, idx_table, counts, h, w, fx, fy, bg,
                chunk=settings.chunk,
                interpret=settings.pallas_interpret,
                mode=settings.outputs,
                pairs=pairs,
                max_per_tile=settings.max_per_tile,
            )
        else:
            out = render_tiles(
                proj, idx_table, h, w, fx, fy, bg, chunk=settings.chunk
            )
    return out, proj, overflow


def rasterize(
    means3d: jnp.ndarray,
    opacity: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    camera,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    settings: RasterSettings = RasterSettings(),
    strip_row0=None,
    pairs_override=None,
) -> dict:
    """Render; returns the reference 8-tuple as a dict plus radii.

    Differentiable wrt means3d/opacity/scaling/rotation/shs/colors/
    means2d_offset via JAX AD (deterministic segment reductions replace the
    CUDA atomicAdd backward).
    """
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if (shs is None) == (colors_precomp is None):
        raise ValueError("provide exactly one of shs / colors_precomp")

    if pairs_override is not None:
        if settings.impl != "pallas_packed" or strip_row0 is not None:
            raise NotImplementedError(
                "pairs_override requires impl='pallas_packed' without "
                "strip_row0 (refine rebin / shared-window-pairs paths)")
    if settings.clamp_grads:
        if strip_row0 is not None:
            # custom_vjp can't carry the shard_map-traced row offset
            # (full_lower not implemented on ShardMapTracer); the strip
            # path is only used by the refine loop, which is plain.
            raise NotImplementedError(
                "strip_row0 requires clamp_grads=False")
        render = _rasterize_clamped
    else:
        render = _rasterize_plain
    out, radii, overflow = render(
        means3d,
        opacity,
        scaling,
        rotation,
        shs,
        colors_precomp,
        means2d_offset,
        bg,
        camera,
        settings,
        valid,
        strip_row0,
        pairs_override,
    )
    return {
        "overflow_tiles": overflow,
        "color": out.color,
        "alpha": out.alpha,
        "coord": out.coord,
        "mcoord": out.mcoord,
        "depth": out.depth,
        "mdepth": out.mdepth,
        "normal": out.normal,
        "radii": radii,
        "n_contrib": out.n_contrib,
    }


def _rasterize_plain(
    means3d, opacity, scaling, rotation, shs, colors_precomp,
    means2d_offset, bg, camera, settings, valid, strip_row0=None,
    pairs_override=None,
):
    out, proj, overflow = _rasterize_impl(
        means3d, opacity, scaling, rotation, shs, colors_precomp,
        means2d_offset, bg, camera, settings, valid, strip_row0,
        pairs_override,
    )
    return out, jax.lax.stop_gradient(proj.radius), \
        jax.lax.stop_gradient(overflow)


def _clamped_core(settings, args):
    m3, op, sc, ro, sh, cp, m2o, bg, camera, valid, strip_row0, pairs = args
    out, proj, overflow = _rasterize_impl(
        m3, op, sc, ro, sh, cp, m2o, bg, camera, settings, valid, strip_row0,
        pairs,
    )
    return out, jax.lax.stop_gradient(proj.radius), \
        jax.lax.stop_gradient(overflow)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _clamped_call(settings, args):
    return _clamped_core(settings, args)


def _clamped_fwd(settings, args):
    out, vjp_fn = jax.vjp(functools.partial(_clamped_core, settings), args)
    return out, vjp_fn


def _clamped_bwd(settings, vjp_fn, cts):
    (g,) = vjp_fn(cts)
    c = settings.clamp_value
    clip = lambda x: None if x is None else jnp.clip(x, -c, c)
    g_m3, g_op, g_sc, g_ro, g_sh = g[:5]
    # clamp the five Gaussian-parameter grads only (…_rade_clamp:157-161);
    # colors_precomp / means2d_offset / bg / camera / valid pass through.
    return ((clip(g_m3), clip(g_op), clip(g_sc), clip(g_ro), clip(g_sh)) + tuple(g[5:]),)


_clamped_call.defvjp(_clamped_fwd, _clamped_bwd)


def _rasterize_clamped(
    means3d, opacity, scaling, rotation, shs, colors_precomp,
    means2d_offset, bg, camera, settings, valid, strip_row0=None,
    pairs_override=None,
):
    """Clamp-variant: param grads clamped to ±15 (means2d/colors exempt,
    matching …_rade_clamp/__init__.py:156-162). pairs_override rides
    inside the custom-VJP args so the clamp applies on the rebin /
    shared-window-pairs paths too (round-4 advisor finding)."""
    return _clamped_call(
        settings,
        (means3d, opacity, scaling, rotation, shs, colors_precomp,
         means2d_offset, bg, camera, valid, strip_row0, pairs_override),
    )


def build_pairs_packed(
    means3d, opacity, scaling, rotation, camera,
    valid=None, settings: RasterSettings = RasterSettings(),
):
    """Binning only: the tile-pair list the packed renderer consumes.

    Used by the refine loop's ``rebin_every`` amortization: binning is
    ~25% of a refine step but the pair/tile assignment changes by far less
    than one 16px tile per Adam step, so the loop rebuilds pairs every K
    iterations and feeds the cached list back via
    ``rasterize(pairs_override=...)`` (fresh per-iteration features are
    still gathered from the current parameters — only the tile assignment
    and per-tile depth ORDER are ≤K-1 steps stale).
    """
    n = means3d.shape[0]
    proj = project(
        means3d, scaling, rotation, opacity, camera,
        colors_precomp=jnp.zeros((n, 3), jnp.float32),
        kernel_size=settings.kernel_size,
        scale_modifier=settings.scale_modifier,
        valid=valid,
        geometry=False,  # rect/depth/visibility only
    )
    grid_x, grid_y = image_tile_grid(
        settings.image_height, settings.image_width)
    # keep the segred aux tables in the cached list too — without them the
    # full-outputs backward silently falls back to the scatter VJP when fed
    # stale pairs (pallas_blend gates on gauss_last_row.size). The aux is
    # stop_gradient'd with the rest, so staleness semantics are unchanged.
    pairs = build_tile_pairs(
        proj, grid_x, grid_y, settings.max_pairs,
        segred_aux=settings.outputs in ("full", "color"))
    return jax.lax.stop_gradient(pairs)


def count_gaussians(
    means3d, opacity, scaling, rotation, camera,
    valid=None, settings: RasterSettings = RasterSettings(),
):
    """LightGaussian importance counting (compress variant).

    Returns (gaussians_count (N,) int32, important_score (N,) f32): per-
    Gaussian number of accepted pixel contributions and Σ of conic-opacity
    (opacity·coef) over those contributions — parity with
    compress-…/cuda_rasterizer/forward.cu:464-474 where each accepted
    pixel adds 1 to count and con_o.w (the conic opacity, constant per
    Gaussian) to the score, so score ≡ count · conic_opacity.

    Runs through the tile pipeline (binning + a Pallas count kernel), so
    memory scales with the pair budget like the renderer — usable at
    production scale (150k × 512²). The O(N·H·W) dense construction lives
    on as ``count_gaussians_dense`` for small-scene cross-checks.
    """
    n = means3d.shape[0]
    proj = project(
        means3d, scaling, rotation, opacity, camera,
        colors_precomp=jnp.zeros((n, 3), jnp.float32),
        kernel_size=settings.kernel_size,
        scale_modifier=settings.scale_modifier,
        valid=valid,
        geometry=False,  # counting reads only conic/opacity
    )
    h, w = settings.image_height, settings.image_width
    grid_x, grid_y = image_tile_grid(h, w)
    from igs_tpu.ops.pallas_blend import count_contributions_pallas
    from igs_tpu.ops.render_tiles import pairs_to_idx_table

    pairs = build_tile_pairs(proj, grid_x, grid_y, settings.max_pairs)
    idx_table = pairs_to_idx_table(pairs, settings.max_per_tile)
    counts = jnp.minimum(pairs.tile_count, settings.max_per_tile)
    per_gauss = count_contributions_pallas(
        proj, idx_table, counts, h, w,
        chunk=settings.chunk, interpret=settings.pallas_interpret,
    )
    count = per_gauss.astype(jnp.int32)
    score = per_gauss * proj.opacity
    return count, score


def count_gaussians_dense(
    means3d, opacity, scaling, rotation, camera,
    valid=None, settings: RasterSettings = RasterSettings(),
):
    """Dense-oracle importance counting — O(N·H·W) memory, small scenes
    only; kept as the independent cross-check for ``count_gaussians``."""
    n = means3d.shape[0]
    proj = project(
        means3d, scaling, rotation, opacity, camera,
        colors_precomp=jnp.zeros((n, 3), jnp.float32),
        kernel_size=settings.kernel_size,
        scale_modifier=settings.scale_modifier,
        valid=valid,
        geometry=False,  # counting reads only conic/opacity
    )
    h, w = settings.image_height, settings.image_width

    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    inv = jnp.argsort(order)

    from igs_tpu.ops.projection import TILE_X, TILE_Y
    from igs_tpu.ops.render_tiles import _LOG_TERM, _MIN_ALPHA

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pixf = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    ptx = (pixf[:, 0] // TILE_X).astype(jnp.int32)
    pty = (pixf[:, 1] // TILE_Y).astype(jnp.int32)

    xy = proj.means2d[order]
    conic = proj.conic[order]
    opac = proj.opacity[order]
    rmin, rmax = proj.rect_min[order], proj.rect_max[order]
    vis = proj.visible[order]

    dx = xy[:, 0:1] - pixf[None, :, 0]
    dy = xy[:, 1:2] - pixf[None, :, 1]
    power = -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy) - conic[
        :, 1:2
    ] * dx * dy
    alpha = jnp.minimum(0.99, opac[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
    covers = (
        (ptx[None, :] >= rmin[:, 0:1]) & (ptx[None, :] < rmax[:, 0:1])
        & (pty[None, :] >= rmin[:, 1:2]) & (pty[None, :] < rmax[:, 1:2])
    )
    cand = vis[:, None] & covers & (power <= 0.0) & (alpha >= _MIN_ALPHA)
    a = jnp.where(cand, alpha, 0.0)
    cum = jnp.cumsum(jnp.log1p(-a), axis=0)
    accept = cand & (cum >= _LOG_TERM)
    count = jnp.sum(accept, axis=1).astype(jnp.int32)[inv]
    score = jnp.sum(jnp.where(accept, opac[:, None], 0.0), axis=1)[inv]
    return count, score


def calibrate_pair_budget(
    means3d, opacity, scaling, rotation, camera,
    valid=None, settings: RasterSettings = RasterSettings(),
    headroom: float = 1.25, quantum: int = 32768,
):
    """Right-size ``max_pairs`` to the scene: measured pair count ×
    headroom, rounded up to ``quantum``, capped at the configured budget.

    Every pair-budget-sized stage (expansion, sorts, gathers, kernel
    walks, the backward reduction) pays for the STATIC budget, not the
    live pair count — an oversized budget taxes the whole pipeline.
    This is how a deployment should pick the budget for a scene:
    measure once, add headroom for motion/densify, keep the overflow
    surfacing as the guard (rasterize warns and the pipeline records
    overflow_events when the calibrated budget is ever exceeded).
    Returns (settings with the calibrated max_pairs, measured_pairs).
    """
    pairs = build_pairs_packed(
        means3d, opacity, scaling, rotation, camera,
        valid=valid, settings=settings)
    measured = int(pairs.num_pairs)
    budget = int(-(-(measured * headroom) // quantum) * quantum)
    budget = max(quantum, min(budget, settings.max_pairs))
    return settings._replace(max_pairs=budget), measured
