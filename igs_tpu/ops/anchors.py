"""Anchor selection for AGM-Net: bbox mask → FPS anchors → KNN weights.

Reference parity: get_mask_fpsample (igs/models/gs.py:966-1011) and the
ablation get_mask_no_fpsample (gs.py:1013-1053). TPU-first: the dynamic
in-bbox subset stays a boolean mask over the full (padded) Gaussian array;
anchors are gathered to a fixed (A, 3) buffer; KNN indices address the FULL
point array (masked points keep weights but are gated downstream), so every
shape is static and the whole precompute jits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from igs_tpu.core.gaussians import select_points_bbox
from igs_tpu.ops.knn import farthest_point_sampling, knn


class AnchorState(NamedTuple):
    """Streaming precompute carried across frames (IGS.py pre_compute_states)."""

    anchor_points: jnp.ndarray  # (A, 3)
    anchor_idx: jnp.ndarray  # (A,) indices into the gaussian array
    mask: jnp.ndarray  # (N,) dynamic-region (in-bbox ∧ valid) mask
    weights: jnp.ndarray  # (N, K) softmax(−10·d) interpolation weights
    neighbor_idx: jnp.ndarray  # (N, K) anchor indices per point


def select_anchors(
    xyz: jnp.ndarray,
    bbox: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    anchor_size: int = 8192,
    k: int = 8,
    temperature: float = 10.0,
    exact_knn: bool = True,
    fps_buckets: int = 64,
) -> AnchorState:
    """Full anchor precompute for one scene/frame.

    ``fps_buckets=1`` runs exact sequential greedy FPS (the approximation
    ladder's reference configuration); the default 64 Morton buckets
    match the reference's own bucketed kd-line FPS (gs.py:983).
    """
    n = xyz.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    mask = select_points_bbox(xyz, bbox) & valid

    idx = farthest_point_sampling(xyz, anchor_size, valid=mask,
                                  num_buckets=fps_buckets)
    anchors = xyz[idx]
    # FPS can only return in-mask points unless the mask is smaller than
    # anchor_size; anchor validity follows the sampled point's mask bit.
    anchor_valid = mask[idx]

    dist, nbr = knn(anchors, xyz, k, points_valid=anchor_valid,
                    exact=exact_knn)
    weights = jax.nn.softmax(-temperature * dist, axis=-1)
    return AnchorState(
        anchor_points=anchors,
        anchor_idx=idx,
        mask=mask,
        weights=weights,
        neighbor_idx=nbr,
    )


def interpolate_anchor_features(
    anchor_feats: jnp.ndarray,  # (A, D)
    weights: jnp.ndarray,  # (N, K)
    neighbor_idx: jnp.ndarray,  # (N, K)
) -> jnp.ndarray:
    """Per-point feature = Σₖ wₖ · feat[anchorₖ].

    Parity: GS3DRenderer.query_ir_grid (igs/models/gs.py:759-821).
    """
    gathered = anchor_feats[neighbor_idx]  # (N, K, D)
    return jnp.einsum("nk,nkd->nd", weights, gathered)


def interpolate_anchor_rotations(
    anchor_quats: jnp.ndarray,  # (A, 4) raw rotation residuals
    weights: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Rotation residual blend: normalize per-anchor first, then weight-sum.

    Parity: interpolate_residual_feats rotation branch
    (igs/models/gs.py:737-742).
    """
    from igs_tpu.core.quaternion import quat_normalize

    gathered = quat_normalize(anchor_quats[neighbor_idx])
    return jnp.einsum("nk,nkd->nd", weights, gathered)


def select_anchors_no_fps(
    xyz: jnp.ndarray,
    bbox: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    anchor_size: int = 8192,
    k: int = 8,
) -> AnchorState:
    """Ablation precompute: EVERY in-bbox point is its own anchor.

    Parity: get_mask_no_fpsample (gs.py:1013-1053) — no FPS, no KNN;
    each dynamic point self-anchors with weight 1 (row==col identity
    neighbors). Static-shape version: in-bbox points compact into the
    ``anchor_size`` budget (overflow points fall back to static, like
    the reference would OOM); K slots are kept for AnchorState shape
    compatibility with all weight on slot 0.
    """
    n = xyz.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    mask = select_points_bbox(xyz, bbox) & valid
    idx = jnp.nonzero(mask, size=anchor_size, fill_value=0)[0]
    anchors = xyz[idx]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # in-bbox rank per point
    in_budget = mask & (rank < anchor_size)
    self_slot = jnp.clip(rank, 0, anchor_size - 1)
    neighbor = jnp.tile(self_slot[:, None], (1, k)).astype(jnp.int32)
    weights = jnp.zeros((n, k), jnp.float32).at[:, 0].set(1.0)
    return AnchorState(
        anchor_points=anchors,
        anchor_idx=idx.astype(jnp.int32),
        mask=in_budget,
        weights=weights,
        neighbor_idx=neighbor,
    )
