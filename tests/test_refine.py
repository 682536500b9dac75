"""Key-frame refine loop tests: optimization progress, densify, prune."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from igs_tpu.ops.rasterize import RasterSettings, rasterize
from igs_tpu.stream.refine import (

    RefineConfig, densify_and_prune, init_refine_state, refine_step,
    convert2stream,
)
from tests.conftest import make_camera, random_gaussians

pytestmark = pytest.mark.slow

SET = RasterSettings(
    image_height=32, image_width=32, impl="tiles",
    max_pairs=1 << 14, max_per_tile=256, chunk=64,
)


def _render(g, cam):
    return rasterize(
        means3d=g.get_xyz, opacity=g.get_opacity, scaling=g.get_scaling,
        rotation=g.get_rotation, camera=cam, shs=g.shs, valid=g.valid,
        settings=SET,
    )["color"]


class TestRefineStep:
    def test_loss_decreases(self):
        cam = make_camera(height=32, width=32)
        target_g = random_gaussians(n=64, seed=0)
        gt = _render(target_g, cam)

        # perturb xyz, then refine back toward the target
        start_g = target_g.replace(
            xyz=target_g.xyz
            + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (64, 3))
        )
        cfg = RefineConfig(use_densify=False, position_lr=0.01)
        state = init_refine_state(start_g, capacity=64)
        bg = jnp.zeros(3)

        step = jax.jit(
            lambda s: refine_step(s, cam, gt, bg, cfg, SET),
        )
        losses = []
        for _ in range(20):
            state, metrics = step(state)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses

    def test_frozen_groups(self):
        cam = make_camera(height=32, width=32)
        g = random_gaussians(n=32, seed=2)
        gt = jnp.zeros((3, 32, 32))
        cfg = RefineConfig(no_shs=True, no_opacity=True, no_scaling=True)
        state = init_refine_state(g, capacity=32)
        state2, _ = refine_step(state, cam, gt, jnp.zeros(3), cfg, SET)
        np.testing.assert_array_equal(
            np.asarray(state2.gaussians.shs), np.asarray(g.shs))
        np.testing.assert_array_equal(
            np.asarray(state2.gaussians.opacity), np.asarray(g.opacity))
        np.testing.assert_array_equal(
            np.asarray(state2.gaussians.scaling), np.asarray(g.scaling))
        assert np.abs(
            np.asarray(state2.gaussians.xyz) - np.asarray(g.xyz)).max() > 0

    def test_densify_stats_accumulate(self):
        cam = make_camera(height=32, width=32)
        g = random_gaussians(n=32, seed=3)
        gt = jnp.zeros((3, 32, 32))
        state = init_refine_state(g, capacity=32)
        state, _ = refine_step(state, cam, gt, jnp.zeros(3),
                               RefineConfig(), SET)
        assert float(state.denom.max()) >= 1
        assert float(state.xyz_grad_accum.max()) > 0


class TestDensify:
    def test_split_fills_free_slots(self):
        g = random_gaussians(n=16, seed=4).pad_to(32)
        state = init_refine_state(g, capacity=32)
        # fake large accumulated gradients on first 4 valid rows
        accum = jnp.zeros(32).at[:4].set(1.0)
        state = state.replace(xyz_grad_accum=accum,
                              denom=jnp.ones(32))
        cfg = RefineConfig(densify_grad_threshold=0.5, min_opacity=0.0)
        state2 = densify_and_prune(state, cfg, extent=jnp.float32(1.0))
        n_before = 16
        n_after = int(state2.gaussians.num_valid)
        assert n_after == n_before + 4  # one extra per split row
        # split rows got smaller scales
        s_old = np.asarray(jnp.exp(g.scaling[:4]))
        s_new = np.asarray(jnp.exp(state2.gaussians.scaling[:4]))
        np.testing.assert_allclose(s_new, s_old / 1.6, rtol=1e-5)

    def test_capacity_bound(self):
        g = random_gaussians(n=30, seed=5).pad_to(32)
        state = init_refine_state(g, capacity=32)
        state = state.replace(
            xyz_grad_accum=jnp.ones(32), denom=jnp.ones(32))
        cfg = RefineConfig(densify_grad_threshold=0.5, min_opacity=0.0)
        state2 = densify_and_prune(state, cfg, extent=jnp.float32(1.0))
        assert int(state2.gaussians.num_valid) <= 32

    def test_opacity_prune(self):
        g = random_gaussians(n=16, seed=6)
        g = g.replace(opacity=g.opacity.at[:8].set(-10.0))  # σ ≈ 0
        state = init_refine_state(g, capacity=16)
        cfg = RefineConfig(densify_grad_threshold=1e9, min_opacity=0.005)
        state2 = densify_and_prune(state, cfg, extent=jnp.float32(1.0))
        assert int(state2.gaussians.num_valid) == 8
        assert not bool(state2.gaussians.valid[0])

    def test_convert2stream(self):
        g = random_gaussians(n=8, seed=7)
        state = init_refine_state(g, capacity=16)
        out = convert2stream(state)
        assert out.num_capacity == 16
        assert int(out.num_valid) == 8


def test_use_new_shs_freezes_original_rows():
    """refine_item.use_new_shs: pre-refine rows' SHs stay frozen, only
    densify-added rows' SHs train (gaussian_model.py:110-118,273,345)."""
    import numpy as np
    from igs_tpu.core.camera import Camera
    from igs_tpu.ops.rasterize import RasterSettings
    from igs_tpu.stream.refine import (
        RefineConfig, init_refine_state, refine_run,
    )
    from tests.conftest import make_camera, random_gaussians

    g = random_gaussians(n=96, seed=3)
    cam = make_camera()
    cams = jax.tree.map(lambda *x: jnp.stack(x), *[cam, cam])
    rng = np.random.RandomState(0)
    gts = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)), jnp.float32)
    order = jnp.asarray([0, 1, 0, 1], jnp.int32)
    settings = RasterSettings(
        image_height=64, image_width=64, impl="tiles",
        max_pairs=1 << 13, max_per_tile=256, chunk=64, outputs="color",
        clamp_grads=False,
    )
    init = init_refine_state(g, capacity=128)

    def run(use_new):
        cfg = RefineConfig(
            use_new_shs=use_new, use_densify=True,
            densification_interval=2, densify_grad_threshold=1e-7,
            # clone mode: originals stay in place (split would replace
            # them in-place with NEW gaussians, correctly unfreezing)
            percent_dense=1e6,
        )
        return refine_run(init, cams, gts, order, jnp.zeros(3), cfg,
                          settings, jnp.float32(3.0), 4)

    frozen = run(True)
    trained = run(False)
    orig = np.asarray(init.gaussians.shs)
    # rows still marked pre-refine (not re-split into new gaussians) keep
    # their SHs bit-for-bit; the unfrozen run moves them
    still = np.asarray(frozen.init_valid)
    assert still.any()
    np.testing.assert_array_equal(
        np.asarray(frozen.gaussians.shs)[still], orig[still])
    assert np.abs(np.asarray(trained.gaussians.shs)[still]
                  - orig[still]).max() > 0
    # densify added new rows (trainable SHs in both runs)
    assert np.asarray(frozen.gaussians.valid[96:]).any()
    assert not np.asarray(frozen.init_valid[96:]).any()


def test_rebin_quality_meet_rig():
    """Quality gate for the configuration rebin_every is RETAINED for
    (round-4 verdict weak-4): a meet/enerf-shaped rig — few cameras,
    use_densify=False — refined with cached pairs must land within
    0.05 dB of exact binning on the eval view."""
    from igs_tpu.stream.refine import (
        RefineConfig, init_refine_state, refine_run, convert2stream,
    )
    from tests.conftest import make_camera, random_gaussians

    target = random_gaussians(n=128, seed=11)
    # meet rig: ~6 training cameras on a small arc + 1 eval camera
    cams_l, n_views = [], 6
    for i in range(n_views):
        cams_l.append(make_camera())
    # vary extrinsics: shift each camera along x
    import jax as _jax
    from igs_tpu.core.camera import Camera

    cams_l = []
    for i in range(n_views):
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 4.0
        w2c[0, 3] = 0.25 * (i - n_views / 2)
        cams_l.append(Camera.from_w2c(w2c, 0.9, 0.9, height=64, width=64))
    eval_w2c = np.eye(4, dtype=np.float32)
    eval_w2c[2, 3] = 4.0
    eval_cam = Camera.from_w2c(eval_w2c, 0.9, 0.9, height=64, width=64)
    cams = jax.tree.map(lambda *x: jnp.stack(x), *cams_l)
    settings = RasterSettings(
        image_height=64, image_width=64, impl="pallas_packed",
        max_pairs=1 << 14, chunk=128, outputs="color",
        pallas_interpret=(jax.default_backend() == "cpu"),
    )

    def render(g, cam):
        return rasterize(
            means3d=g.get_xyz, opacity=g.get_opacity,
            scaling=g.get_scaling, rotation=g.get_rotation, camera=cam,
            shs=g.shs, valid=g.valid, settings=settings)["color"]

    gts = jnp.stack([render(target, c) for c in cams_l])
    gt_eval = np.asarray(render(target, eval_cam))
    # start = target + small drift (a key-frame hand-off)
    start = target.replace(
        xyz=target.xyz
        + 0.03 * _jax.random.normal(_jax.random.PRNGKey(2), (128, 3)))
    init = init_refine_state(start, capacity=128)
    iters = 18
    order = jnp.asarray(np.arange(iters) % n_views, jnp.int32)

    def psnr_after(k):
        cfg = RefineConfig(use_densify=False, rebin_every=k)
        st = refine_run(init, cams, gts, order, jnp.zeros(3), cfg,
                        settings, jnp.float32(3.0), iters)
        img = np.clip(np.asarray(render(convert2stream(st), eval_cam)), 0, 1)
        mse = ((img - np.clip(gt_eval, 0, 1)) ** 2).mean()
        return -10 * np.log10(mse)

    exact = psnr_after(1)
    cached = psnr_after(5)
    start_img = np.clip(np.asarray(render(start, eval_cam)), 0, 1)
    start_psnr = -10 * np.log10(((start_img - np.clip(gt_eval, 0, 1)) ** 2).mean())
    # the refine actually improved the eval view...
    assert exact > start_psnr + 0.5, (start_psnr, exact)
    # ...and cached pairs match exact binning within the revisit bar
    assert abs(exact - cached) < 0.05, (exact, cached)


def test_rebin_every_matches_exact_binning():
    """cfg.rebin_every>1: cached tile-pair refine tracks the exact loop.

    With per-step position deltas far below one 16px tile, a pair list
    rebuilt every K iterations must leave the optimization essentially
    unchanged: same densify decisions, near-identical final params, and
    the first iteration (fresh pairs in both) bit-comparable.
    """
    from igs_tpu.stream.refine import (
        RefineConfig, init_refine_state, refine_run,
    )
    from tests.conftest import make_camera, random_gaussians

    g = random_gaussians(n=96, seed=5)
    cam = make_camera()
    cams = jax.tree.map(lambda *x: jnp.stack(x), *[cam, cam])
    target = random_gaussians(n=96, seed=6)
    settings = RasterSettings(
        image_height=64, image_width=64, impl="pallas_packed",
        max_pairs=1 << 13, chunk=128, outputs="color",
        pallas_interpret=(jax.default_backend() == "cpu"),
    )
    gts = jnp.stack([
        rasterize(
            means3d=target.get_xyz, opacity=target.get_opacity,
            scaling=target.get_scaling, rotation=target.get_rotation,
            camera=cam, shs=target.shs, valid=target.valid,
            settings=settings)["color"]
        for _ in range(2)
    ])
    order = jnp.asarray([0, 1] * 5, jnp.int32)
    init = init_refine_state(g, capacity=128)
    iters = 10

    def run(k):
        cfg = RefineConfig(
            use_densify=True, densification_interval=4,
            densify_grad_threshold=1e-4, rebin_every=k,
        )
        return refine_run(init, cams, gts, order, jnp.zeros(3), cfg,
                          settings, jnp.float32(3.0), iters)

    exact = run(1)
    cached = run(4)
    # same gaussian set decisions (densify/prune see identical stats on
    # the first window; later steps may drift only through tiny numerics)
    np.testing.assert_array_equal(
        np.asarray(exact.gaussians.valid), np.asarray(cached.gaussians.valid))
    ex = np.asarray(exact.gaussians.xyz)
    ca = np.asarray(cached.gaussians.xyz)
    live = np.asarray(exact.gaussians.valid)
    # the trajectories agree to optimization noise (lr ~1e-3, 10 steps)
    assert np.abs(ex[live] - ca[live]).max() < 5e-3, \
        np.abs(ex[live] - ca[live]).max()
