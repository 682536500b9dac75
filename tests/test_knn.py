"""Tests for KNN, FPS, and anchor selection."""

import numpy as np
import jax.numpy as jnp

from igs_tpu.ops.knn import knn, knn_weights, farthest_point_sampling
from igs_tpu.ops.anchors import select_anchors, interpolate_anchor_features


class TestKNN:
    def test_exact_vs_numpy(self):
        rng = np.random.RandomState(0)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        qs = rng.normal(size=(137, 3)).astype(np.float32)
        d, idx = knn(jnp.asarray(pts), jnp.asarray(qs), 8, chunk=64)
        d, idx = np.asarray(d), np.asarray(idx)
        full = np.linalg.norm(qs[:, None] - pts[None], axis=-1)
        ref_idx = np.argsort(full, axis=1, kind="stable")[:, :8]
        ref_d = np.take_along_axis(full, ref_idx, axis=1)
        np.testing.assert_allclose(d, ref_d, atol=1e-3)
        # indices must agree where distances are distinct
        same = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(same, ref_d, atol=1e-3)

    def test_invalid_points_excluded(self):
        pts = jnp.asarray(np.random.RandomState(1).normal(size=(64, 3)), jnp.float32)
        valid = jnp.arange(64) < 32
        _, idx = knn(pts, pts[:4], 8, points_valid=valid)
        assert np.asarray(idx).max() < 32

    def test_weights_softmax(self):
        rng = np.random.RandomState(2)
        anchors = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        w, idx = knn_weights(anchors, pts, k=8)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
        # nearest anchor gets the largest weight
        assert (np.asarray(w).argmax(1) == 0).all()


class TestFPS:
    def test_coverage(self):
        # FPS of a uniform cube should cover it much better than the
        # first-k prefix
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(4096, 3)), jnp.float32)
        idx = np.asarray(farthest_point_sampling(pts, 128, num_buckets=16))
        assert len(np.unique(idx)) == 128
        sel = np.asarray(pts)[idx]
        # max distance from any point to nearest sample should be small
        d = np.linalg.norm(np.asarray(pts)[:, None] - sel[None], axis=-1).min(1)
        assert d.max() < 0.55  # ~cube diagonal / cbrt(128)·slack

    def test_respects_valid_mask(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(1024, 3)), jnp.float32)
        valid = jnp.asarray(np.arange(1024) % 2 == 0)
        idx = np.asarray(farthest_point_sampling(pts, 64, valid=valid, num_buckets=8))
        assert (idx % 2 == 0).all()


class TestAnchors:
    def test_select_anchors(self):
        rng = np.random.RandomState(3)
        xyz = jnp.asarray(rng.uniform(-2, 2, size=(2048, 3)), jnp.float32)
        bbox = jnp.asarray([[-1.0, -1, -1], [1.0, 1, 1]])
        st = select_anchors(xyz, bbox, anchor_size=64, k=4, temperature=10.0)
        m = np.asarray(st.mask)
        assert m.any() and not m.all()
        # anchors lie inside the bbox
        a = np.asarray(st.anchor_points)
        assert (np.abs(a) <= 1.0 + 1e-5).all()
        np.testing.assert_allclose(np.asarray(st.weights).sum(-1), 1.0, atol=1e-5)

    def test_interpolation_constant_field(self):
        # interpolating a constant anchor feature returns the constant
        rng = np.random.RandomState(4)
        xyz = jnp.asarray(rng.uniform(-1, 1, size=(256, 3)), jnp.float32)
        bbox = jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]])
        st = select_anchors(xyz, bbox, anchor_size=32, k=4)
        feats = jnp.ones((32, 5)) * 3.0
        out = interpolate_anchor_features(feats, st.weights, st.neighbor_idx)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_select_anchors_no_fps_identity():
    """Ablation (gs.py:1013-1053): each in-bbox point self-anchors with
    weight 1 — interpolating anchor features must return each point's
    OWN anchor feature exactly."""
    import jax
    import jax.numpy as jnp

    from igs_tpu.ops.anchors import (
        interpolate_anchor_features, select_anchors_no_fps,
    )

    rng = np.random.RandomState(0)
    n, a, d = 64, 32, 8
    xyz = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    bbox = jnp.asarray([[-1.0, -1, -1], [1.0, 1, 1]])
    st = select_anchors_no_fps(xyz, bbox, anchor_size=a, k=4)
    mask = np.asarray(st.mask)
    assert mask.sum() > 0
    # anchors are exactly the in-bbox points, in order
    inb = np.asarray(xyz)[mask]
    np.testing.assert_allclose(
        np.asarray(st.anchor_points)[:mask.sum()], inb)
    feats = jnp.asarray(rng.normal(size=(a, d)), jnp.float32)
    out = interpolate_anchor_features(feats, st.weights, st.neighbor_idx)
    # each in-bbox point receives its own anchor's feature verbatim
    ranks = np.cumsum(mask) - 1
    np.testing.assert_allclose(
        np.asarray(out)[mask], np.asarray(feats)[ranks[mask]])
