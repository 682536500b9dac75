"""Segmented pair→gaussian grad reduction (ops/segred.py) vs segment_sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igs_tpu.ops.segred import gather_pairs, segment_sum_sorted, segmented_scan


def _expansion_fixture(rng, n, mp, lanes):
    """Build binning-like aux: contiguous per-gaussian expansion segments,
    a random (tile-sort stand-in) permutation, and the boundary rows."""
    counts = rng.randint(0, 5, size=n)
    total = int(counts.sum())
    assert total <= mp
    exp_gauss = np.full(mp, -1, np.int32)
    exp_gauss[:total] = np.repeat(np.arange(n), counts).astype(np.int32)
    ends = np.cumsum(counts) - 1
    last_row = np.where(counts > 0, ends, -1).astype(np.int32)
    # tile sort stand-in: arbitrary permutation of all MP slots
    sorted_to_exp = rng.permutation(mp).astype(np.int32)  # slot per sorted pos
    exp_to_sorted = np.argsort(sorted_to_exp).astype(np.int32)
    gauss_id_sorted = exp_gauss[sorted_to_exp]
    dpair_sorted = rng.normal(size=(mp, lanes)).astype(np.float32)
    # invalid pairs carry zero grads (the kernel's dzero alias)
    dpair_sorted[gauss_id_sorted < 0] = 0.0
    return (jnp.asarray(exp_gauss), jnp.asarray(last_row),
            jnp.asarray(exp_to_sorted), jnp.asarray(gauss_id_sorted),
            jnp.asarray(dpair_sorted))


class TestSegmentedScan:
    def test_matches_segment_sum(self):
        rng = np.random.RandomState(0)
        n, mp, lanes = 300, 1024, 16
        exp_gauss, last_row, e2s, gid_sorted, dpair = _expansion_fixture(
            rng, n, mp, lanes)
        dexp = dpair[e2s]
        got = segment_sum_sorted(dexp, exp_gauss, last_row, interpret=True)
        want = jax.ops.segment_sum(
            np.asarray(dpair), np.maximum(np.asarray(gid_sorted), 0),
            num_segments=n)
        want = jnp.where(
            (np.asarray(last_row) >= 0)[:, None], want, want * 0
        )  # gaussians without pairs: explicit zero either way
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)

    def test_scan_multi_block_carry(self):
        # segments straddling the 128-row kernel blocks exercise the carry
        rng = np.random.RandomState(1)
        mp, lanes = 512, 8
        ids = np.sort(rng.randint(0, 7, size=mp)).astype(np.int32)
        x = rng.normal(size=(mp, lanes)).astype(np.float32)
        got = np.asarray(segmented_scan(jnp.asarray(x), jnp.asarray(ids),
                                        interpret=True))
        want = np.zeros_like(x)
        run = np.zeros(lanes, np.float32)
        for i in range(mp):
            if i > 0 and ids[i] != ids[i - 1]:
                run = np.zeros(lanes, np.float32)
            run = run + x[i]
            want[i] = run
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gather_pairs_vjp_matches_scatter(self):
        rng = np.random.RandomState(2)
        n, mp, lanes = 200, 640, 16
        exp_gauss, last_row, e2s, gid_sorted, dpair = _expansion_fixture(
            rng, n, mp, lanes)
        feats = jnp.asarray(rng.normal(size=(n, lanes)).astype(np.float32))

        def via_segred(f):
            pf = gather_pairs(f, gid_sorted, e2s, exp_gauss, last_row, True)
            return jnp.sum(pf * dpair)

        def via_scatter(f):
            pf = f[jnp.maximum(gid_sorted, 0)]
            return jnp.sum(pf * dpair)

        g1 = jax.grad(via_segred)(feats)
        g2 = jax.grad(via_scatter)(feats)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)

    def test_gather_pairs_overflow_truncation(self):
        # a gaussian whose segment is cut by the pair budget sums only the
        # surviving pairs — and one fully beyond the budget gets zero
        rng = np.random.RandomState(3)
        n, mp, lanes = 4, 128, 8
        counts = np.array([100, 20, 30, 40])  # total 190 > 128
        exp_gauss = np.repeat(np.arange(n), counts)[:mp].astype(np.int32)
        ends = np.cumsum(counts) - 1
        base = np.cumsum(counts) - counts
        last_row = np.where(base < mp, np.minimum(ends, mp - 1), -1)
        last_row = np.where(counts > 0, last_row, -1).astype(np.int32)
        perm = rng.permutation(mp).astype(np.int32)
        e2s = np.argsort(perm).astype(np.int32)
        gid_sorted = exp_gauss[perm]
        dpair = rng.normal(size=(mp, lanes)).astype(np.float32)
        feats = jnp.asarray(rng.normal(size=(n, lanes)).astype(np.float32))

        def via_segred(f):
            pf = gather_pairs(f, jnp.asarray(gid_sorted), jnp.asarray(e2s),
                              jnp.asarray(exp_gauss), jnp.asarray(last_row),
                              True)
            return jnp.sum(pf * dpair)

        g1 = np.asarray(jax.grad(via_segred)(feats))
        want = np.zeros((n, lanes), np.float32)
        np.add.at(want, gid_sorted, dpair)
        np.testing.assert_allclose(g1, want, rtol=1e-5, atol=1e-5)
        assert last_row[3] == -1 and np.allclose(g1[3], want[3])
