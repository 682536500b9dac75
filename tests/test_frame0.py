"""Frame-0 RaDe-GS trainer tests: init, filter, optimization, compression."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from igs_tpu.ops.rasterize import RasterSettings, rasterize
from igs_tpu.stream.refine import init_refine_state
from igs_tpu.train.frame0 import (

    Frame0Config, compute_3d_filter, create_from_points, depth_to_normal,
    frame0_step, frame0_densify_and_prune, lightgaussian_importance,
    position_lr, prune_by_importance, reset_opacity,
)
from tests.conftest import make_camera, random_gaussians

pytestmark = pytest.mark.slow

SET = RasterSettings(
    image_height=32, image_width=32, impl="tiles",
    max_pairs=1 << 14, max_per_tile=256, chunk=64,
    # count_gaussians now always runs the Pallas tile pipeline
    pallas_interpret=True,
)


def test_create_from_points():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    g = create_from_points(pts, colors, capacity=128)
    assert g.num_capacity == 128
    assert int(g.num_valid) == 100
    # opacity ≈ 0.1 after sigmoid
    np.testing.assert_allclose(
        np.asarray(g.get_opacity[:100]), 0.1, atol=1e-5)
    # scales positive and finite
    s = np.asarray(jnp.exp(g.scaling[:100]))
    assert np.isfinite(s).all() and (s > 0).all()


def test_position_lr_schedule():
    cfg = Frame0Config()
    lr0 = float(position_lr(0, cfg, 1.0))
    lr_end = float(position_lr(cfg.position_lr_max_steps, cfg, 1.0))
    assert abs(lr0 - cfg.position_lr_init) < 1e-9
    assert abs(lr_end - cfg.position_lr_final) < 1e-9


def test_compute_3d_filter():
    g = random_gaussians(64)
    cams = [make_camera(radius=4.0), make_camera(radius=6.0)]
    filt = compute_3d_filter(g.xyz, g.valid, cams)
    f = np.asarray(filt)
    assert f.shape == (64, 1)
    assert (f > 0).all()
    # filter ≈ depth/focal·sqrt(0.2); nearest camera is at 4.0
    focal = float(cams[0].focal_x)
    expect_center = (4.0 / max(focal, float(cams[1].focal_x))) * 0.2**0.5
    assert abs(np.median(f) / expect_center - 1) < 0.5


def test_depth_to_normal_plane():
    # a fronto-parallel plane at depth 4 → normal ≈ (0,0,-1)... in the
    # convention used, dx×dy for constant z gives ±z; check unit & z-dominant
    cam = make_camera(height=32, width=32)
    depth = jnp.full((32, 32), 4.0)
    nrm = np.asarray(depth_to_normal(depth, cam))
    inner = nrm[8:-8, 8:-8]
    ln = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    assert np.abs(inner[..., 2]).min() > 0.9


def test_frame0_training_reduces_loss():
    cam = make_camera(height=32, width=32)
    target = random_gaussians(n=64, seed=0)
    gt = rasterize(
        means3d=target.get_xyz, opacity=target.get_opacity,
        scaling=target.get_scaling, rotation=target.get_rotation,
        camera=cam, shs=target.shs, valid=target.valid, settings=SET,
    )["color"]

    rng = np.random.RandomState(1)
    pts = np.asarray(target.xyz) + 0.05 * rng.normal(size=(64, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 0.8, (64, 3)).astype(np.float32)
    g = create_from_points(pts, colors, capacity=64)
    state = init_refine_state(g, capacity=64)
    filt = jnp.zeros((64, 1))
    cfg = Frame0Config()
    bg = jnp.zeros(3)

    step = jax.jit(
        lambda s, lr: frame0_step(
            s, cam, gt, bg, filt, cfg, SET, lr, reg_on=False),
    )
    losses = []
    for it in range(25):
        state, loss = step(state, position_lr(it, cfg, 1.0) * 10)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_reset_opacity():
    g = random_gaussians(16)
    state = init_refine_state(g, capacity=16)
    state = reset_opacity(state)
    assert np.asarray(state.gaussians.get_opacity).max() <= 0.01 + 1e-5


def test_densify_with_clone_and_zcull():
    g = random_gaussians(n=16, seed=4)
    g = g.replace(xyz=g.xyz.at[:, 2].add(10.0))  # all above z-cull plane
    g = g.pad_to(64)
    state = init_refine_state(g, capacity=64)
    state = state.replace(
        xyz_grad_accum=jnp.zeros(64).at[:8].set(1.0),
        denom=jnp.ones(64))
    cfg = Frame0Config(densify_grad_threshold=0.5, min_opacity=0.0,
                       percent_dense=100.0, z_cull_min=4.5)
    # percent_dense huge → everything "small" → clone fires, split doesn't
    state2 = frame0_densify_and_prune(state, cfg, extent=1.0, size_threshold=None)
    assert int(state2.gaussians.num_valid) == 16 + 8

    # now z-cull: push half below the plane
    g3 = state2.gaussians
    g3 = g3.replace(xyz=g3.xyz.at[:4, 2].set(0.0))
    state3 = state2.replace(gaussians=g3)
    cfg2 = Frame0Config(densify_grad_threshold=1e9, min_opacity=0.0,
                        z_cull_min=4.5)
    state4 = frame0_densify_and_prune(state3, cfg2, extent=1.0, size_threshold=None)
    assert int(state4.gaussians.num_valid) == 16 + 8 - 4


def test_lightgaussian_prune():
    g = random_gaussians(n=64, seed=5)
    cam = make_camera(height=32, width=32)
    filt = jnp.zeros((64, 1))
    scores = lightgaussian_importance(g, filt, [cam], SET)
    assert np.asarray(scores).shape == (64,)
    assert np.asarray(scores).max() > 0
    pruned = prune_by_importance(g, scores, 0.25)
    assert int(pruned.num_valid) == 48
    # the kept ones should have higher scores than the dropped ones
    s = np.asarray(scores)
    kept = np.asarray(pruned.valid)
    assert s[kept].min() >= s[~kept].max() - 1e-6


class TestSweepSPMD:
    """SPMD frame sweep (train/frame0_sweep.py): F frames trained in
    lockstep with the frame axis sharded over the mesh must match the
    sequential per-frame driver schedule exactly (no collectives exist;
    the program is element-wise over frames)."""

    def _frame(self, seed):
        cam1 = make_camera(height=32, width=32, radius=4.0)
        cam2 = make_camera(height=32, width=32, radius=4.5)
        cams = [cam1, cam2]
        target = random_gaussians(n=48, seed=seed)
        gts = jnp.stack([
            rasterize(
                means3d=target.get_xyz, opacity=target.get_opacity,
                scaling=target.get_scaling, rotation=target.get_rotation,
                camera=c, shs=target.shs, valid=target.valid, settings=SET,
            )["color"] for c in cams
        ])
        rng = np.random.RandomState(seed)
        pts = np.asarray(target.xyz) + 0.05 * rng.normal(
            size=(48, 3)).astype(np.float32)
        colors = rng.uniform(0.2, 0.8, (48, 3)).astype(np.float32)
        g = create_from_points(pts, colors, capacity=64)
        state = init_refine_state(g, capacity=64)
        cams_s = jax.tree.map(lambda *x: jnp.stack(x), *cams)
        return state, cams_s, gts

    def test_matches_sequential(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from igs_tpu.parallel.mesh import make_mesh
        from igs_tpu.train.frame0_sweep import (
            compute_3d_filter_stacked, sweep_run,
        )

        f = 4
        iters = 8
        frames = [self._frame(s) for s in range(f)]
        stack = lambda xs: jax.tree.map(lambda *x: jnp.stack(x), *xs)
        states = stack([fr[0] for fr in frames])
        cams = stack([fr[1] for fr in frames])
        images = jnp.stack([fr[2] for fr in frames])
        filts = jax.vmap(compute_3d_filter_stacked)(
            states.gaussians.xyz, states.gaussians.valid, cams)
        cfg = Frame0Config(
            densification_interval=4, densify_from_iter=0,
            densify_until_iter=100, densify_grad_threshold=1e-5,
            opacity_reset_interval=6,
        )
        rng = np.random.RandomState(0)
        vo = jnp.asarray(
            np.stack([rng.randint(0, 2, iters) for _ in range(f)]),
            jnp.int32)
        spatial = jnp.full((f,), 1.0)

        # sequential reference: same schedule per frame (one shared
        # jitted step — the eager per-op dispatch made this the slowest
        # test in the suite)
        jstep = jax.jit(lambda st, cam, gt, filt, lr: frame0_step(
            st, cam, gt, jnp.zeros(3), filt, cfg, SET, lr, False))
        seq_states = []
        for i in range(f):
            st = jax.tree.map(lambda x: x[i], states)
            filt = filts[i]
            cams_i = [jax.tree.map(lambda x: x[i][k], cams)
                      for k in range(2)]
            for it1 in range(1, iters + 1):
                vi = int(vo[i, it1 - 1])
                lr = position_lr(it1, cfg, 1.0)
                st, _ = jstep(st, cams_i[vi], images[i, vi], filt, lr)
                if (it1 < cfg.densify_until_iter
                        and it1 > cfg.densify_from_iter
                        and it1 % cfg.densification_interval == 0):
                    size_thr = (20.0 if it1 > cfg.opacity_reset_interval
                                else None)
                    st = frame0_densify_and_prune(st, cfg, 1.0, size_thr)
                    filt = compute_3d_filter(
                        st.gaussians.xyz, st.gaussians.valid, cams_i)
                if it1 % cfg.opacity_reset_interval == 0:
                    st = reset_opacity(st)
            seq_states.append(st)
        seq = stack(seq_states)

        # SPMD sweep on the virtual mesh
        mesh = make_mesh(data=4, tile=1, devices=jax.devices()[:4])
        shard = NamedSharding(mesh, P("data"))
        run = jax.jit(lambda st, fl, v: sweep_run(
            st, cams, images, fl, v, cfg, SET, spatial, iters))
        out, _ = run(jax.device_put(states, shard),
                     jax.device_put(filts, shard), vo)

        np.testing.assert_array_equal(
            np.asarray(out.gaussians.valid), np.asarray(seq.gaussians.valid))
        # bitwise equality is unattainable: vmap reassociates reductions
        # and Adam's mhat/sqrt(vhat) amplifies ulp differences to O(lr)
        # per step — compare at optimization-noise scale instead (the
        # schedule itself is exact: valid/densify decisions match above)
        for name in ("xyz", "opacity", "scaling", "rotation", "shs"):
            a = np.asarray(getattr(out.gaussians, name))
            b = np.asarray(getattr(seq.gaussians, name))
            bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
            # Adam's mhat/sqrt(vhat) occasionally amplifies a single
            # element's ulp difference ~3e-2; tolerate <0.5% outliers
            assert bad.mean() < 0.005, (name, bad.mean(), np.abs(a-b).max())
