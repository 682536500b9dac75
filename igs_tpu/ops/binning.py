"""Tile binning: duplicate Gaussians across covered tiles and sort.

Replaces the CUDA pipeline duplicateWithKeys → cub radix sort →
identifyTileRanges (rasterizer_impl.cu:70-174,350-391) with a TPU-native,
static-shape construction:

  1. Gaussians are stably depth-sorted ONCE (the CUDA code sorts 64-bit
     (tile<<32 | depth-bits) keys; sorting by depth first and then stably by
     tile yields the identical per-tile depth order, with ties broken by
     Gaussian index exactly like cub's stable radix sort).
  2. Pair expansion uses a fixed ``max_pairs`` budget: slot→Gaussian lookup
     by searchsorted over the cumulative tiles_touched (the dynamic
     ``num_rendered`` D2H read of the CUDA path becomes a static budget +
     validity mask).
  3. A single stable 32-bit sort by tile id replaces the 64-bit radix sort.
  4. Per-tile ranges via searchsorted (identifyTileRanges equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from igs_tpu.ops.projection import ProjectedGaussians, TILE_X, TILE_Y


def _sort_pairs(tile_id, gauss_id, num_tiles):
    """Stable (tile, input-order) pair sort as ONE unstable fused-key sort.

    XLA lowers ``is_stable=True`` by carrying an extra iota operand
    through the whole bitonic network (3 lanes of traffic). The input
    order IS the tiebreak we want, so fuse it into the key instead:
    ``key = tile << ceil_log2(n) | slot`` — unique keys, 2 lanes, same
    order as the stable sort, measured ~0.5 ms faster at a 655k-pair
    sort. Falls back to the stable 2-key sort when tile·slot doesn't fit
    32 bits (huge images + pair budgets).

    Also returns ``slot_sorted``: each sorted pair's expansion slot (its
    pre-sort position) — the segmented grad reduction (ops/segred.py)
    inverts the sort with it.
    """
    n = tile_id.shape[0]
    shift = max(int(num_tiles + 1).bit_length(), 1)
    slot_bits = int(n - 1).bit_length()
    if shift + slot_bits > 32:  # pragma: no cover - giant configs only
        slots = jnp.arange(n, dtype=jnp.int32)
        ts, gs, ss = jax.lax.sort((tile_id, gauss_id, slots), num_keys=1,
                                  is_stable=True)
        return ts, gs, ss
    slots = jnp.arange(n, dtype=jnp.uint32)
    key = (tile_id.astype(jnp.uint32) << slot_bits) | slots
    key_sorted, gauss_sorted = jax.lax.sort(
        (key, gauss_id), num_keys=1, is_stable=False)
    tile_sorted = (key_sorted >> slot_bits).astype(jnp.int32)
    slot_sorted = (key_sorted & jnp.uint32((1 << slot_bits) - 1)).astype(
        jnp.int32)
    return tile_sorted, gauss_sorted, slot_sorted


class TilePairs(NamedTuple):
    gauss_id: jnp.ndarray  # (max_pairs,) int32 gaussian index, depth-ordered per tile
    tile_id: jnp.ndarray  # (max_pairs,) int32, == num_tiles for invalid slots
    num_pairs: jnp.ndarray  # () int32 actual pair count
    tile_start: jnp.ndarray  # (num_tiles,) int32 range starts
    tile_count: jnp.ndarray  # (num_tiles,) int32 range lengths
    overflowed: jnp.ndarray  # () bool — true if budget was exceeded
    # — segmented grad-reduction aux (ops/segred.py): Gaussians are
    # depth-sorted BEFORE expansion, so expansion-order pairs are
    # contiguous per Gaussian —
    exp_to_sorted: jnp.ndarray  # (max_pairs,) int32 expansion slot → sorted pos
    exp_gauss_id: jnp.ndarray  # (max_pairs,) int32 gaussian id per expansion slot (-1 pad)
    gauss_last_row: jnp.ndarray  # (N,) int32 expansion row of each gaussian's last pair, -1 if none (ORIGINAL gaussian order)


def build_tile_pairs(
    proj: ProjectedGaussians, grid_x: int, grid_y: int, max_pairs: int,
    segred_aux: bool = False,
) -> TilePairs:
    n = proj.depth.shape[0]
    num_tiles = grid_x * grid_y

    # 1. depth-sort gaussians (invisible → +inf, pushed to the end)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # stable
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    tiles_touched = proj.tiles_touched[order]

    # 2. expand slots → (gaussian, tile) pairs under static budget.
    # Every per-gaussian column is broadcast to its pair slots with a
    # single packed jnp.repeat — narrow per-slot gathers (values[idx]) were
    # the dominant binning cost on TPU (see tools_bench_binning.py).
    # The expansion is pure ROW MOVEMENT (6.1 ms of the 8 ms binning floor
    # at 524k/150k, PERF.md r4): bit-pack the tile-rect geometry
    # (x0, y0, row width — each ≤ grid dims) into ONE int32 so the repeat
    # carries 3 columns instead of 5 (round-5: −38 % expansion bytes).
    offsets = jnp.cumsum(tiles_touched)  # inclusive
    total = offsets[-1]
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    base = jnp.concatenate([jnp.zeros(1, offsets.dtype), offsets[:-1]])
    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    bx = max(int(grid_x).bit_length(), 1)
    by = max(int(grid_y).bit_length(), 1)
    bw = max(int(grid_x + 1).bit_length(), 1)
    if bx + by + bw <= 31:
        geom = (rect_min[:, 0] | (rect_min[:, 1] << bx)
                | (rw << (bx + by))).astype(jnp.int32)
        packed = jnp.stack(
            [geom, base.astype(jnp.int32), order.astype(jnp.int32)], axis=1)
        exp = jnp.repeat(
            packed, tiles_touched, axis=0, total_repeat_length=max_pairs
        )  # (max_pairs, 3)
        geom_e = exp[:, 0]
        x0 = geom_e & ((1 << bx) - 1)
        y0 = (geom_e >> bx) & ((1 << by) - 1)
        rw_e = geom_e >> (bx + by)
        base_e, order_e = exp[:, 1], exp[:, 2]
    else:  # pragma: no cover — >16k² images
        packed = jnp.stack(
            [rect_min[:, 0], rect_min[:, 1], rw,
             base.astype(jnp.int32), order.astype(jnp.int32)], axis=1)
        exp = jnp.repeat(
            packed, tiles_touched, axis=0, total_repeat_length=max_pairs)
        x0, y0, rw_e = exp[:, 0], exp[:, 1], exp[:, 2]
        base_e, order_e = exp[:, 3], exp[:, 4]
    local = slots - base_e
    # variable-divisor int div/mod is microcoded on the VPU; emulate in f32
    # (exact: local < 2²⁴, rw ≤ 4096)
    rw_f = rw_e.astype(jnp.float32)
    q = jnp.floor(local.astype(jnp.float32) / rw_f).astype(jnp.int32)
    tile_x = x0 + (local - q * rw_e)
    tile_y = y0 + q
    pair_valid = slots < total
    tile_id = jnp.where(
        pair_valid, tile_y * grid_x + tile_x, num_tiles
    ).astype(jnp.int32)
    gauss_id = jnp.where(pair_valid, order_e, -1)

    # 3. (tile, input-order) sort — fused-key unstable sort, same order as
    # a stable tile sort (depth order preserved within tile)
    tile_sorted, gauss_sorted, slot_sorted = _sort_pairs(
        tile_id, gauss_id, num_tiles)

    # 4. tile ranges by binary search over the SORTED ids — the scatter-add
    # histogram is a 655k-row microcoded scatter (~5.4 ms at this scale);
    # 1025 binary-search queries over the already-sorted array are ~0.4 ms
    # (identifyTileRanges, rasterizer_impl.cu:151, does the same walk)
    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=tile_sorted.dtype))
    start = bounds[:num_tiles].astype(jnp.int32)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)

    # 5. segmented grad-reduction aux (ops/segred.py) — only for the
    # full-outputs backward, where the segred VJP beats the scatter
    # (~3 ms at 512²/150k); the color backward measured FASTER with the
    # plain scatter, so its binning skips the two aux sorts (~1 ms).
    # Inverse permutations come from 2-lane unstable sorts of unique
    # keys — the TPU-fast inversion (a scatter would be microcoded):
    #   exp_to_sorted[e] = sorted position of expansion slot e
    #   gauss_last_row[g] = expansion row of g's last pair (orig. order)
    if segred_aux:
        _, exp_to_sorted = jax.lax.sort(
            (slot_sorted, jnp.arange(max_pairs, dtype=jnp.int32)),
            num_keys=1, is_stable=False)
        ends_d = jnp.minimum(offsets, max_pairs).astype(jnp.int32) - 1
        has_pairs = (tiles_touched > 0) & (
            base < jnp.minimum(total, max_pairs))
        last_row_d = jnp.where(has_pairs, ends_d, -1)
        _, gauss_last_row = jax.lax.sort(
            (order.astype(jnp.int32), last_row_d), num_keys=1,
            is_stable=False)
        exp_gauss_id = gauss_id
    else:
        empty = jnp.zeros((0,), jnp.int32)
        exp_to_sorted = exp_gauss_id = gauss_last_row = empty

    return TilePairs(
        gauss_id=gauss_sorted,
        tile_id=tile_sorted,
        num_pairs=jnp.minimum(total, max_pairs).astype(jnp.int32),
        tile_start=start,
        tile_count=counts,
        overflowed=total > max_pairs,
        exp_to_sorted=exp_to_sorted,
        exp_gauss_id=exp_gauss_id,
        gauss_last_row=gauss_last_row,
    )


def image_tile_grid(height: int, width: int) -> tuple[int, int]:
    return (width + TILE_X - 1) // TILE_X, (height + TILE_Y - 1) // TILE_Y


def build_tile_lists_compact(
    proj: ProjectedGaussians, grid_x: int, grid_y: int, max_per_tile: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free binning: per-tile depth-ordered Gaussian lists by compaction.

    XLA's O(n log² n) bitonic sort dominates the sort-based pipeline on TPU
    (≈0.5 s at a 2M-pair budget); this path instead depth-sorts the N
    Gaussians once (cheap) and, for every tile, compacts the indices of
    covering Gaussians with a masked cumsum + scatter — O(T·N/row) work on
    the VPU, no global pair sort. Two levels (tile rows, then tiles) keep
    the mask matrices small.

    Returns (idx_table (T, max_per_tile) int32 gaussian ids, -1 padded;
             counts (T,)). Lists are depth-ordered with ties by original
    index — identical order to the CUDA radix sort (rasterizer_impl.cu:373).
    """
    n = proj.depth.shape[0]
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # stable
    rmin = proj.rect_min[order]  # (N, 2)
    rmax = proj.rect_max[order]

    # level 1: per tile-row compaction (rows are few; budget is generous)
    max_per_row = min(n, max_per_tile * grid_x)
    rows = jnp.arange(grid_y, dtype=jnp.int32)
    row_mask = (rows[:, None] >= rmin[None, :, 1]) & (
        rows[:, None] < rmax[None, :, 1]
    )  # (R, N)

    def compact(mask_row, budget):
        # indices (in depth order) of True entries, padded with n
        csum = jnp.cumsum(mask_row.astype(jnp.int32))
        count = csum[-1]
        pos = jnp.where(mask_row, csum - 1, budget)
        out = jnp.full(budget, n, jnp.int32).at[
            jnp.minimum(pos, budget)
        ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        return out, jnp.minimum(count, budget)

    row_lists, row_counts = jax.vmap(lambda m: compact(m, max_per_row))(
        row_mask
    )  # (R, max_per_row), (R,)

    # level 2: per tile compaction from its row's list
    rmin_x_pad = jnp.concatenate([rmin[:, 0], jnp.array([grid_x], jnp.int32)])
    rmax_x_pad = jnp.concatenate([rmax[:, 0], jnp.array([-1, ] , jnp.int32)])

    def tile_level(row_list, _row_count):
        gx_min = rmin_x_pad[row_list]  # (max_per_row,)
        gx_max = rmax_x_pad[row_list]
        cols = jnp.arange(grid_x, dtype=jnp.int32)
        mask = (cols[:, None] >= gx_min[None, :]) & (
            cols[:, None] < gx_max[None, :]
        )  # (grid_x, max_per_row)

        def per_tile(m):
            csum = jnp.cumsum(m.astype(jnp.int32))
            pos = jnp.where(m, csum - 1, max_per_tile)
            out = jnp.full(max_per_tile, n, jnp.int32).at[
                jnp.minimum(pos, max_per_tile)
            ].set(row_list, mode="drop")
            return out, jnp.minimum(csum[-1], max_per_tile)

        return jax.vmap(per_tile)(mask)

    tile_lists, tile_counts = jax.vmap(tile_level)(row_lists, row_counts)
    tile_lists = tile_lists.reshape(grid_y * grid_x, max_per_tile)
    tile_counts = tile_counts.reshape(grid_y * grid_x)
    # translate depth-order index → original gaussian id; n sentinel → -1
    order_pad = jnp.concatenate([order.astype(jnp.int32), jnp.array([-1], jnp.int32)])
    idx_table = order_pad[tile_lists]
    return idx_table, tile_counts
