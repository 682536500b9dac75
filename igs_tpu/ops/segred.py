"""Pair→Gaussian gradient reduction without the microcoded scatter.

The packed rasterizer gathers per-pair features with ``feats[gauss_id]``;
its AD transpose is a (max_pairs, L) → (N, L) scatter-add, which XLA
lowers to a per-row microcoded loop (~8 ms at 524k pairs / 150k Gaussians
on v5e — the single largest XLA-side item of a refine step, see PERF.md
round 3). This module re-expresses that reduction using structure the
binning already guarantees (binning.py step 1-2): Gaussians are
depth-sorted BEFORE pair expansion, so in *expansion order* the pairs of
each Gaussian form one contiguous segment. The backward then becomes

  1. inverse-permute the per-pair grads from tile-sorted order back to
     expansion order            — a wide row GATHER (fast on TPU),
  2. a segmented inclusive scan over contiguous segments — a streaming
     Pallas kernel (this file; Hillis-Steele with boundary flags, carried
     across blocks through VMEM/SMEM scratch),
  3. read each segment's last row — a (N, L) row gather at the
     per-Gaussian boundary rows binning precomputed.

No scatter anywhere; every step is a contiguous stream or a wide gather.
Accuracy: the scan's MXU dots run a bf16 hi/lo split (x = hi + lo with hi
= bf16(x)); the lo pass itself is truncated to bf16 by Precision.DEFAULT,
so the result carries ~bf16² precision — a ~2^-17 relative error bound vs
the exact-f32 scatter-add, NOT full f32-reassociation equivalence. That
bound sits well under the 1e-4 gradient-parity tolerances used by the
tests; if parity with the scatter path ever tightens below ~1e-5, split
``lo`` into a second hi/lo level (a third dot) to recover ~f32.

Reference semantics being replaced: the CUDA backward's atomicAdd
accumulation into per-Gaussian grads (backward.cu:631-1016).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(mp: int) -> tuple[int, int]:
    """(rows per masked matmul, sub-blocks per grid step).

    256-row matmuls balance MXU mask cost (∝ rows per output row)
    against step count; grouping 16 of them per grid step amortizes the
    ~2 µs fixed per-step overhead that dominated the ungrouped kernel
    (4.4 ms → the sub-block carries stay in registers)."""
    for r in (256, 128):
        if mp % r:
            continue
        for g in (16, 8, 4, 2, 1):
            if mp % (r * g) == 0:
                return r, g
    raise ValueError(f"max_pairs {mp} must be a multiple of 128")


def _segscan_kernel(ids_ref, x_ref, out_ref, carry_ref, previd_ref, *,
                    rows: int, group: int):
    """One (group·rows, L) block of the segmented inclusive scan.

    Per 256-row sub-block: scan[i] = Σ_{j≤i, ids[j]==ids[i]} x[j] as ONE
    masked lower-triangular matmul on the MXU — segments are contiguous,
    so ids-equal ∧ j≤i is exactly the triangular-segment mask. M is 0/1
    (bf16-exact); x splits hi/lo for ~f32 accuracy in 2 MXU passes (cf.
    _tri_dot in pallas_blend.py). Cross-(sub-)block: a row continues the
    carried segment iff its id equals the carried id (ids form contiguous
    runs), in which case it adds the carried partial sum. Carries hop
    sub-blocks in registers and grid steps through VMEM scratch.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)
        previd_ref[...] = jnp.full_like(previd_ref, -2)  # matches no id

    carry = carry_ref[...]  # (1, L)
    previd = previd_ref[...]  # (1, 1) i32
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    for k in range(group):
        x = x_ref[k * rows:(k + 1) * rows, :]  # (rows, L)
        ids = ids_ref[k * rows:(k + 1) * rows, :]  # (rows, 1)
        # segment-start row per row, WITHOUT transposing ids (a
        # sublane↔lane relayout per sub-block dominated a first cut):
        # boundary flags from a vertical shift, then an 8-step max-scan;
        # s[i] = -1 means the row continues the carried-in segment.
        shifted = jnp.concatenate([previd, ids[:-1]], axis=0)
        s = jnp.where(ids != shifted, ridx, -1)
        d = 1
        while d < rows:
            s = jnp.maximum(
                s, jnp.concatenate(
                    [jnp.full((d, 1), -1, jnp.int32), s[:-d]], axis=0))
            d *= 2
        m = ((ci <= ri) & (ci >= s)).astype(jnp.float32)
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        scan = (jnp.dot(m, hi, precision=jax.lax.Precision.DEFAULT)
                + jnp.dot(m, lo, precision=jax.lax.Precision.DEFAULT))
        scan = scan + (s < 0).astype(jnp.float32) * carry
        out_ref[k * rows:(k + 1) * rows, :] = scan
        carry = scan[rows - 1:rows, :]
        previd = ids[rows - 1:rows, :]
    carry_ref[...] = carry
    previd_ref[...] = previd


def segmented_scan(x: jnp.ndarray, ids: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Inclusive per-segment prefix sum of ``x`` (MP, L) over contiguous
    runs of equal ``ids`` (MP,). Streaming Pallas kernel, no scatter."""
    mp, lanes = x.shape
    rows, group = _pick_rows(mp)
    block = rows * group
    return pl.pallas_call(
        functools.partial(_segscan_kernel, rows=rows, group=group),
        grid=(mp // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda t: (t, 0)),
            pl.BlockSpec((block, lanes), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((block, lanes), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ids.reshape(mp, 1), x)


def segment_sum_sorted(dpair_exp, exp_gauss_id, gauss_last_row,
                       interpret: bool = False):
    """Per-Gaussian sums of expansion-ordered per-pair grads.

    ``gauss_last_row[g]`` is the expansion row of Gaussian g's last pair
    (-1 if it has none) — precomputed by binning in ORIGINAL Gaussian
    order, so the output needs no reordering.
    """
    scan = segmented_scan(dpair_exp, exp_gauss_id, interpret=interpret)
    safe = jnp.maximum(gauss_last_row, 0)
    out = scan[safe]
    return jnp.where((gauss_last_row >= 0)[:, None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_pairs(feats, gauss_id, exp_to_sorted, exp_gauss_id,
                 gauss_last_row, interpret=False):
    """``feats[gauss_id]`` whose VJP is gather+scan+gather, not scatter."""
    del exp_to_sorted, exp_gauss_id, gauss_last_row
    return feats[jnp.maximum(gauss_id, 0)]


def _gather_pairs_fwd(feats, gauss_id, exp_to_sorted, exp_gauss_id,
                      gauss_last_row, interpret):
    out = feats[jnp.maximum(gauss_id, 0)]
    return out, (exp_to_sorted, exp_gauss_id, gauss_last_row)


def _gather_pairs_bwd(interpret, res, dpair):
    import numpy as _np

    exp_to_sorted, exp_gauss_id, gauss_last_row = res
    dpair_exp = dpair[exp_to_sorted]  # sorted order → expansion order
    dfeats = segment_sum_sorted(
        dpair_exp, exp_gauss_id, gauss_last_row, interpret=interpret)
    z = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (dfeats, z(exp_to_sorted), z(exp_to_sorted), z(exp_gauss_id),
            z(gauss_last_row))


gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)
