"""Rasterizer tests: forward invariants, tiled↔reference parity, gradients.

Mirrors the golden-parity strategy of SURVEY.md §4: the naive reference
renderer implements the CUDA blending semantics exactly; the production
tiled path must match it to float tolerance, and gradients must match
finite differences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.ops.projection import project
from igs_tpu.ops.rasterize import RasterSettings, rasterize, count_gaussians
from tests.conftest import make_camera, random_gaussians

SET64_REF = RasterSettings(
    image_height=64, image_width=64, impl="reference", max_pairs=1 << 16
)
SET64_TILE = RasterSettings(
    image_height=64, image_width=64, impl="tiles",
    max_pairs=1 << 16, max_per_tile=512, chunk=64,
)


def _raster_args(g, cam):
    return dict(
        means3d=g.get_xyz,
        opacity=g.get_opacity,
        scaling=g.get_scaling,
        rotation=g.get_rotation,
        camera=cam,
        shs=g.shs,
    )


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("settings",))
def _jrast(args, settings, bg=None):
    """Shared jitted rasterize: compiles once per settings/shape and hits
    the persistent cache across runs — the eager per-op dispatch of the
    reference-oracle path dominated the smoke-suite wall time."""
    kw = dict(args)
    if bg is not None:
        kw["bg"] = bg
    return rasterize(**kw, settings=settings)


class TestProjection:
    def test_shapes_and_visibility(self, gaussians_small, camera64):
        g, cam = gaussians_small, camera64
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, cam, shs=g.shs)
        n = g.num_capacity
        assert proj.means2d.shape == (n, 2)
        assert proj.visible.any()
        vis = np.asarray(proj.visible)
        # all test gaussians are in front of this camera
        assert np.asarray(proj.depth)[vis].min() > 0.2

    def test_behind_camera_culled(self, camera64):
        g = random_gaussians(8)
        g = g.replace(xyz=g.xyz.at[:, 2].set(-10.0))  # behind (view z < 0)
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, camera64, shs=g.shs)
        assert not np.asarray(proj.visible).any()

    def test_center_gaussian_projects_to_center(self, camera64):
        g = random_gaussians(1)
        g = g.replace(xyz=jnp.zeros((1, 3)))
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, camera64, shs=g.shs)
        np.testing.assert_allclose(
            np.asarray(proj.means2d)[0], [31.5, 31.5], atol=1e-3
        )
        np.testing.assert_allclose(float(proj.depth[0]), 4.0, atol=1e-5)
        np.testing.assert_allclose(float(proj.t_center[0]), 4.0, atol=1e-5)

    def test_isotropic_normal_points_to_camera(self, camera64):
        # an isotropic Gaussian's RaDe-GS plane normal is along the ray
        g = random_gaussians(1)
        g = g.replace(
            xyz=jnp.zeros((1, 3)),
            scaling=jnp.full((1, 3), -3.0),
            rotation=jnp.array([[1.0, 0, 0, 0]]),
        )
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, camera64, shs=g.shs)
        # camera-space normal should be ≈ (0, 0, -1) (facing the camera)
        np.testing.assert_allclose(
            np.asarray(proj.normal)[0], [0, 0, -1.0], atol=1e-4
        )

    def test_conic_is_inverse_cov(self, gaussians_small, camera64):
        g, cam = gaussians_small, camera64
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, cam, shs=g.shs)
        # reconstruct cov2d from conic and check PSD
        c = np.asarray(proj.conic)[np.asarray(proj.visible)]
        det_inv = c[:, 0] * c[:, 2] - c[:, 1] ** 2
        assert (det_inv > 0).all()


class TestForward:
    def test_empty_scene_is_background(self, camera64):
        g = random_gaussians(4)
        g = g.replace(valid=jnp.zeros(4, dtype=bool))
        bg = jnp.array([0.25, 0.5, 0.75])
        out = _jrast(_raster_args(g, camera64), SET64_REF, bg=bg)
        img = np.asarray(out["color"])
        np.testing.assert_allclose(img, np.broadcast_to(
            np.array([0.25, 0.5, 0.75])[:, None, None], img.shape), atol=1e-6)
        assert np.asarray(out["alpha"]).max() == 0

    def test_opaque_wall_alpha_saturates(self, camera64):
        # a dense slab of opaque gaussians in front of the camera
        g = random_gaussians(512, spread=0.8)
        g = g.replace(opacity=jnp.full((512, 1), 8.0))  # σ≈1
        out = _jrast(_raster_args(g, camera64), SET64_REF)
        a = np.asarray(out["alpha"])
        assert a[24:40, 24:40].min() > 0.98

    def test_depth_matches_geometry(self, camera64):
        g = random_gaussians(1)
        g = g.replace(
            xyz=jnp.zeros((1, 3)),
            opacity=jnp.full((1, 1), 12.0),
            scaling=jnp.full((1, 3), -1.2),
        )
        out = _jrast(_raster_args(g, camera64), SET64_REF)
        d = np.asarray(out["depth"])
        md = np.asarray(out["mdepth"])
        # center pixel: expected depth ≈ distance 4.0 (flat-ish gaussian)
        assert abs(d[32, 32] - 4.0) < 0.05
        assert abs(md[32, 32] - 4.0) < 0.05

    @pytest.mark.slow
    def test_front_occludes_back(self, camera64):
        # red gaussian in front of blue gaussian, both opaque
        xyz = jnp.array([[0.0, 0, -1.0], [0.0, 0, 1.0]])  # z=-1 closer
        shs = np.zeros((2, 16, 3), np.float32)
        shs[0, 0] = [2.0, -2.0, -2.0]  # red-ish front
        shs[1, 0] = [-2.0, -2.0, 2.0]  # blue-ish back
        g = random_gaussians(2)
        g = g.replace(
            xyz=xyz, shs=jnp.asarray(shs),
            opacity=jnp.full((2, 1), 12.0),
            scaling=jnp.full((2, 3), -1.0),
            rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
        )
        out = _jrast(_raster_args(g, camera64), SET64_REF)
        img = np.asarray(out["color"])
        assert img[0, 32, 32] > 0.9 and img[2, 32, 32] < 0.1

    def test_color_in_range(self, gaussians_small, camera64):
        out = rasterize(**_raster_args(gaussians_small, camera64),
                        settings=SET64_REF)
        img = np.asarray(out["color"])
        assert np.isfinite(img).all()
        assert img.min() >= 0.0

    def test_normal_unit_or_zero(self, gaussians_small, camera64):
        out = rasterize(**_raster_args(gaussians_small, camera64),
                        settings=SET64_REF)
        nrm = np.asarray(out["normal"])
        ln = np.linalg.norm(nrm, axis=0)
        ok = (np.abs(ln - 1) < 1e-4) | (ln < 1e-6)
        assert ok.all()


@pytest.mark.slow
class TestTiledParity:
    """Production tiled path ≡ reference renderer."""

    @pytest.mark.parametrize("seed,n", [(0, 256), (1, 512), (2, 1024)])
    def test_all_outputs_match(self, seed, n):
        cam = make_camera()
        g = random_gaussians(n=n, seed=seed)
        args = _raster_args(g, cam)
        ref = rasterize(**args, settings=SET64_REF)
        til = rasterize(**args, settings=SET64_TILE)
        for k in ["color", "alpha", "coord", "mcoord", "depth", "mdepth", "normal"]:
            np.testing.assert_allclose(
                np.asarray(til[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-3,
                err_msg=f"output {k} mismatch",
            )

    def test_radii_match(self):
        cam = make_camera()
        g = random_gaussians(n=128, seed=3)
        args = _raster_args(g, cam)
        ref = rasterize(**args, settings=SET64_REF)
        til = rasterize(**args, settings=SET64_TILE)
        np.testing.assert_array_equal(np.asarray(til["radii"]), np.asarray(ref["radii"]))

    def test_nonsquare_image(self):
        cam = make_camera(height=48, width=80)
        g = random_gaussians(n=256, seed=5)
        s_ref = RasterSettings(image_height=48, image_width=80, impl="reference",
                               max_pairs=1 << 15)
        s_til = RasterSettings(image_height=48, image_width=80, impl="tiles",
                               max_pairs=1 << 15, max_per_tile=512, chunk=64)
        args = _raster_args(g, cam)
        ref = rasterize(**args, settings=s_ref)
        til = rasterize(**args, settings=s_til)
        np.testing.assert_allclose(
            np.asarray(til["color"]), np.asarray(ref["color"]), atol=2e-4, rtol=1e-3
        )

    def test_nonsquare_nonmultiple_packed(self):
        """The production output is 1014×1352 (infer_data.py defaults) —
        NOT a multiple of the 16-px tile: the packed pallas path must
        handle partial edge tiles. Shrunk to 56×72 for CPU interpret."""
        cam = make_camera(height=56, width=72)
        g = random_gaussians(n=256, seed=5)
        s_ref = RasterSettings(image_height=56, image_width=72,
                               impl="reference", max_pairs=1 << 15)
        s_pak = RasterSettings(image_height=56, image_width=72,
                               impl="pallas_packed", max_pairs=1 << 15,
                               pallas_interpret=True, outputs="color_depth")
        args = _raster_args(g, cam)
        ref = rasterize(**args, settings=s_ref)
        pak = rasterize(**args, settings=s_pak)
        np.testing.assert_allclose(
            np.asarray(pak["color"]), np.asarray(ref["color"]),
            atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(pak["depth"]), np.asarray(ref["depth"]),
            atol=2e-3, rtol=1e-3)


@pytest.mark.slow
class TestGradients:
    def _loss(self, settings):
        cam = make_camera(height=32, width=32)
        settings = settings._replace(image_height=32, image_width=32)
        g = random_gaussians(n=64, seed=7)
        target = jnp.zeros((3, 32, 32))

        def loss(xyz, op_raw, scale_raw, rot_raw, shs):
            out = rasterize(
                means3d=xyz,
                opacity=jax.nn.sigmoid(op_raw),
                scaling=jnp.exp(scale_raw),
                rotation=rot_raw / jnp.linalg.norm(rot_raw, axis=-1, keepdims=True),
                camera=cam,
                shs=shs,
                settings=settings,
            )
            return (
                jnp.mean(jnp.abs(out["color"] - target))
                + 0.1 * jnp.mean(out["depth"])
                + 0.05 * jnp.mean(out["alpha"])
                + 0.05 * jnp.mean(out["normal"])
            )

        args = (g.xyz, g.opacity, g.scaling, g.rotation, g.shs)
        return loss, args

    def test_grads_finite_and_nonzero(self):
        loss, args = self._loss(SET64_REF)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        for gr in grads:
            assert np.isfinite(np.asarray(gr)).all()
        assert np.abs(np.asarray(grads[0])).max() > 0

    def test_tiled_grads_match_reference(self):
        loss_ref, args = self._loss(SET64_REF)
        loss_til, _ = self._loss(
            SET64_TILE._replace(max_per_tile=256, chunk=64)
        )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        g_til = jax.grad(loss_til, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g_ref, g_til):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3
            )

    def test_finite_differences_xyz(self):
        loss, args = self._loss(SET64_REF)
        lf = lambda x: loss(x, *args[1:])
        g = np.asarray(jax.grad(lf)(args[0]))
        rng = np.random.RandomState(0)
        x0 = np.asarray(args[0])
        for _ in range(4):
            i, j = rng.randint(x0.shape[0]), rng.randint(3)
            if abs(g[i, j]) < 1e-6:
                continue
            eps = 1e-3
            xp, xm = x0.copy(), x0.copy()
            xp[i, j] += eps
            xm[i, j] -= eps
            fd = (float(lf(jnp.asarray(xp))) - float(lf(jnp.asarray(xm)))) / (2 * eps)
            assert abs(fd - g[i, j]) < 2e-2 * max(1.0, abs(g[i, j])), (
                f"fd {fd} vs ad {g[i, j]} at ({i},{j})"
            )

    def test_clamp_variant(self):
        cam = make_camera(height=32, width=32)
        settings = RasterSettings(
            image_height=32, image_width=32, impl="reference",
            max_pairs=1 << 14, clamp_grads=True, clamp_value=1e-5,
        )
        g = random_gaussians(n=64, seed=7)

        def loss(xyz):
            out = rasterize(
                means3d=xyz, opacity=g.get_opacity, scaling=g.get_scaling,
                rotation=g.get_rotation, camera=cam, shs=g.shs,
                settings=settings,
            )
            return 1e3 * jnp.sum(out["color"])

        grad = np.asarray(jax.grad(loss)(g.xyz))
        assert np.abs(grad).max() <= 1e-5 + 1e-9

    def test_means2d_offset_grad(self):
        """The NDC means2d-offset grad used for densification thresholds."""
        cam = make_camera(height=32, width=32)
        settings = SET64_REF._replace(image_height=32, image_width=32)
        g = random_gaussians(n=64, seed=9)
        off = jnp.zeros((64, 2))

        def loss(off):
            out = rasterize(
                means3d=g.get_xyz, opacity=g.get_opacity, scaling=g.get_scaling,
                rotation=g.get_rotation, camera=cam, shs=g.shs,
                means2d_offset=off, settings=settings,
            )
            return jnp.sum(out["color"] ** 2)

        grad = np.asarray(jax.grad(loss)(off))
        assert np.isfinite(grad).all()
        assert np.abs(grad).max() > 0


SET64_COUNT = RasterSettings(
    image_height=64, image_width=64, impl="pallas", pallas_interpret=True,
    max_pairs=1 << 16, max_per_tile=512, chunk=64,
)


@pytest.mark.slow
class TestCountMode:
    def test_counts(self, camera64):
        g = random_gaussians(n=128, seed=4)
        count, score = count_gaussians(
            g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation, camera64,
            settings=SET64_COUNT,
        )
        count, score = np.asarray(count), np.asarray(score)
        assert (count >= 0).all() and count.max() > 0
        assert (score >= 0).all()
        # score is bounded by count (opacity·coef ≤ 1 after sigmoid? no —
        # opacity ≤ 1 and coef ≤ ~1) within small slack
        assert (score <= count * 1.01 + 1e-6).all()

    def test_tiled_matches_dense_oracle(self, camera64):
        """Tile-pipeline counting ≡ the O(N·H·W) dense construction."""
        from igs_tpu.ops.rasterize import count_gaussians_dense

        g = random_gaussians(n=200, seed=11)
        args = (g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation,
                camera64)
        count_t, score_t = count_gaussians(*args, settings=SET64_COUNT)
        count_d, score_d = count_gaussians_dense(*args, settings=SET64_COUNT)
        np.testing.assert_array_equal(np.asarray(count_t),
                                      np.asarray(count_d))
        np.testing.assert_allclose(np.asarray(score_t), np.asarray(score_d),
                                   atol=1e-4, rtol=1e-4)

    def test_partial_boundary_tiles(self):
        """Non-multiple-of-16 image: out-of-image pixels must not count."""
        from igs_tpu.ops.rasterize import count_gaussians_dense

        cam = make_camera(height=40, width=56)
        s = SET64_COUNT._replace(image_height=40, image_width=56)
        g = random_gaussians(n=100, seed=12)
        args = (g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation, cam)
        count_t, _ = count_gaussians(*args, settings=s)
        count_d, _ = count_gaussians_dense(*args, settings=s)
        np.testing.assert_array_equal(np.asarray(count_t),
                                      np.asarray(count_d))


@pytest.mark.slow
class TestOverflowSurfacing:
    """VERDICT r1 weak-4: static-budget exhaustion must be reported."""

    def test_no_overflow_reports_zero(self, camera64):
        g = random_gaussians(n=64, seed=3)
        out = rasterize(**_raster_args(g, camera64), settings=SET64_TILE)
        assert int(out["overflow_tiles"]) == 0

    def test_tile_clamp_reported(self, camera64):
        # 600 large gaussians against a 4-slot per-tile budget: guaranteed
        # per-tile truncation
        g = random_gaussians(n=600, seed=5, scale_rng=(-1.5, -0.8))
        s = SET64_TILE._replace(max_per_tile=64)
        out = rasterize(**_raster_args(g, camera64), settings=s)
        assert int(out["overflow_tiles"]) > 0

    def test_pair_budget_overflow_flagged(self, camera64):
        g = random_gaussians(n=600, seed=5, scale_rng=(-1.5, -0.8))
        s = SET64_TILE._replace(max_pairs=256)
        out = rasterize(**_raster_args(g, camera64), settings=s)
        # global pair overflow sets the high bit (1<<20)
        assert int(out["overflow_tiles"]) >= (1 << 20)


class TestOpacityAwareCulling:
    """The shrunk (alpha ≥ 1/255 support) tile rects must be EXACTLY
    output- and gradient-equivalent to the reference's 3σ rects — any
    pixel they exclude fails the blend kernels' _MIN_ALPHA skip anyway."""

    @staticmethod
    def _widen_to_3sigma(proj, width, height):
        """Recompute rects from the reported (3σ) radius, undoing culling."""
        from igs_tpu.ops.projection import TILE_X, TILE_Y
        gx = (width + TILE_X - 1) // TILE_X
        gy = (height + TILE_Y - 1) // TILE_Y
        px, py = proj.means2d[:, 0], proj.means2d[:, 1]
        rf = proj.radius.astype(jnp.float32)
        rxmin = jnp.clip(((px - rf) / TILE_X).astype(jnp.int32), 0, gx)
        rymin = jnp.clip(((py - rf) / TILE_Y).astype(jnp.int32), 0, gy)
        rxmax = jnp.clip(
            ((px + rf + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, gx)
        rymax = jnp.clip(
            ((py + rf + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, gy)
        return proj._replace(
            rect_min=jnp.stack([rxmin, rymin], -1),
            rect_max=jnp.stack([rxmax, rymax], -1),
            tiles_touched=jnp.where(
                proj.visible, (rxmax - rxmin) * (rymax - rymin), 0),
        )

    def _render_pair(self, raw_opacity_shift):
        """Render a low-opacity scene with culled vs widened rects."""
        from igs_tpu.ops.raster_ref import render_reference

        cam = make_camera()
        g = random_gaussians(n=192, seed=7)
        # push opacities low: sigmoid(U(-1,3) + shift); shift=-6 puts many
        # below 1/255 (the dead path), shift=-2 in the shrink regime
        g = g.replace(opacity=g.opacity + raw_opacity_shift)

        def render(xyz, opac, widen):
            proj = project(xyz, g.get_scaling, g.get_rotation,
                           jax.nn.sigmoid(opac).reshape(-1), cam, shs=g.shs)
            if widen:
                proj = self._widen_to_3sigma(proj, 64, 64)
            return render_reference(proj, 64, 64, cam.focal_x, cam.focal_y,
                                    jnp.zeros(3))

        return g, render

    @pytest.mark.parametrize("shift", [-2.0, -6.0])
    def test_outputs_exact(self, shift):
        g, render = self._render_pair(shift)
        culled = render(g.xyz, g.opacity, False)
        wide = render(g.xyz, g.opacity, True)
        # culling shrinks coverage only where alpha < 1/255 → identical
        for k in ["color", "alpha", "depth", "mdepth", "normal"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(culled, k)), np.asarray(getattr(wide, k)),
                err_msg=f"culling changed output {k}")

    @pytest.mark.slow
    @pytest.mark.parametrize("shift", [-2.0, -6.0])
    def test_grads_exact(self, shift):
        g, render = self._render_pair(shift)

        def loss(xyz, opac, widen):
            out = render(xyz, opac, widen)
            return jnp.sum(out.color ** 2) + jnp.sum(out.alpha)

        gc = jax.grad(loss, argnums=(0, 1))(g.xyz, g.opacity, False)
        gw = jax.grad(loss, argnums=(0, 1))(g.xyz, g.opacity, True)
        for a, b, name in [(gc[0], gw[0], "xyz"), (gc[1], gw[1], "opacity")]:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"culling changed {name} grads")


class TestStripRendering:
    """strip_row0 mode: a tile-row strip equals the matching rows of the
    full render (cross-chip refine sharding building block). With the
    unaligned packed pair list a tile's chunk grouping depends on its
    segment's global offset, so strips match to float accuracy (last-ulp
    associativity drift in the prefix dots), not bit-for-bit."""

    def test_strip_rows_exact(self):
        cam = make_camera()
        g = random_gaussians(n=256, seed=1)
        args = _raster_args(g, cam)
        full_set = RasterSettings(
            image_height=64, image_width=64, impl="pallas_packed",
            max_pairs=1 << 16, pallas_interpret=True, outputs="color")
        strip_set = full_set._replace(image_height=32)
        full = rasterize(**args, settings=full_set)["color"]
        s0 = rasterize(**args, settings=strip_set,
                       strip_row0=jnp.int32(0))["color"]
        s1 = rasterize(**args, settings=strip_set,
                       strip_row0=jnp.int32(2))["color"]
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(full[:, :32]), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(full[:, 32:]), atol=2e-6)

    def test_clamp_applies_through_pairs_override(self):
        """clamp_grads must clamp on the pairs_override path too (the old
        routing silently fell back to the unclamped VJP — round-4
        advisor finding)."""
        from igs_tpu.ops.rasterize import build_pairs_packed

        cam = make_camera()
        g = random_gaussians(n=128, seed=3)
        args = _raster_args(g, cam)
        settings = RasterSettings(
            image_height=64, image_width=64, impl="pallas_packed",
            max_pairs=1 << 15, pallas_interpret=True, outputs="color",
            clamp_grads=True, clamp_value=1e-5)
        pairs = build_pairs_packed(
            g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation, cam,
            settings=settings)

        def loss(xyz):
            out = rasterize(**{**args, "means3d": xyz}, settings=settings,
                            pairs_override=pairs)
            return 1e3 * jnp.sum(out["color"])

        grad = np.asarray(jax.grad(loss)(g.get_xyz))
        assert np.abs(grad).max() <= 1e-5 + 1e-9
        assert np.abs(grad).max() > 0  # not vacuously zero

    @pytest.mark.slow
    def test_strip_grads_sum_to_full(self):
        cam = make_camera()
        g = random_gaussians(n=128, seed=2)
        args = _raster_args(g, cam)
        full_set = RasterSettings(
            image_height=64, image_width=64, impl="pallas_packed",
            max_pairs=1 << 15, pallas_interpret=True, outputs="color")
        strip_set = full_set._replace(image_height=32)

        def lf(x):
            return jnp.sum(rasterize(
                **{**args, "means3d": x}, settings=full_set)["color"] ** 2)

        def ls(x):
            a = rasterize(**{**args, "means3d": x}, settings=strip_set,
                          strip_row0=jnp.int32(0))["color"]
            b = rasterize(**{**args, "means3d": x}, settings=strip_set,
                          strip_row0=jnp.int32(2))["color"]
            return jnp.sum(a ** 2) + jnp.sum(b ** 2)

        gf = np.asarray(jax.grad(lf)(g.get_xyz))
        gs = np.asarray(jax.grad(ls)(g.get_xyz))
        np.testing.assert_allclose(gs, gf, atol=1e-4, rtol=1e-5)


class TestNormalGeometry:
    """Round-4 audit regression: the camera-space normal is the
    TRANSPOSED-Jacobian transform nJ·rnv with glm's column-major nJ
    (forward.cu:176-260; constructor semantics confirmed by the
    reference's own printf test at forward.cu:127-132). Independent
    geometric check — no transcription in the loop: a thin-disc
    Gaussian's depth-gradient normal must align with the disc's plane
    normal in camera space."""

    def test_thin_disc_normal_matches_plane(self):
        from igs_tpu.core.quaternion import quat_to_rotmat
        from tests.conftest import make_camera

        rng = np.random.RandomState(0)
        n = 16
        xyz = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = np.full((n, 3), 0.3, np.float32)
        scale[:, 2] = 1e-4  # thin disc: normal = rotated 3rd axis
        cam = make_camera()
        proj = project(
            jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(q),
            jnp.full((n,), 0.9), cam,
            colors_precomp=jnp.zeros((n, 3)))
        r = np.asarray(quat_to_rotmat(jnp.asarray(q), normalize=False))
        wvt = np.asarray(cam.world_view_transform)
        disc_cam = r[:, :, 2] @ wvt[:3, :3]  # R_view·n_world
        disc_cam /= np.linalg.norm(disc_cam, axis=1, keepdims=True)
        cos = np.abs(np.sum(np.asarray(proj.normal) * disc_cam, axis=1))
        # fov-clamped off-axis points deviate slightly; the pre-fix
        # (row-major) reading bottomed out at 0.50 on this exact set
        assert cos.min() > 0.98, cos


class TestAuditCorners:
    """Round-4 audit corner tests (VERDICT r3 weak-3): kernel_size > 0,
    scale_modifier != 1, and both Vrk conditioning branches — previously
    untested (all runs use the IGS defaults kernel_size=0, modifier=1)."""

    def test_mip_coef_isotropic_analytic(self):
        """For a centered isotropic Gaussian the EWA cov2d is a·I with
        a = (f·s/z)², so coef = sqrt(det0/det1) = a/(a+k) — checked
        against that analytic value, not a transcription.
        (forward.cu:117-124; conic stays UN-blurred in RaDe-GS,
        forward.cu:384-390 uses the raw cov2D.)"""
        from tests.conftest import make_camera

        cam = make_camera()  # z = 4, fov 0.8
        s = 0.05
        k = 0.1
        g = random_gaussians(1)
        g = g.replace(
            xyz=jnp.zeros((1, 3)),
            scaling=jnp.full((1, 3), float(np.log(s))),
            rotation=jnp.array([[1.0, 0, 0, 0]]),
        )
        proj0 = project(g.get_xyz, g.get_scaling, g.get_rotation,
                        g.get_opacity, cam, shs=g.shs, kernel_size=0.0)
        projk = project(g.get_xyz, g.get_scaling, g.get_rotation,
                        g.get_opacity, cam, shs=g.shs, kernel_size=k)
        a = (float(cam.focal_x) * s / 4.0) ** 2
        coef_expected = a / (a + k)  # sqrt(a²/(a+k)²)
        got = float(projk.opacity[0] / proj0.opacity[0])
        np.testing.assert_allclose(got, coef_expected, rtol=1e-3)
        # RaDe-GS does NOT blur the conic with the kernel (unlike
        # mip-splatting): conic must be unchanged
        np.testing.assert_allclose(
            np.asarray(projk.conic), np.asarray(proj0.conic), rtol=1e-6)
        # and the 3σ radius is kernel-independent too
        assert int(projk.radius[0]) == int(proj0.radius[0])

    def test_mip_coef_zero_for_degenerate_det(self):
        """det ≤ 1e-6 (a collapsed Gaussian) must zero the coef → zero
        effective opacity (forward.cu:122-124)."""
        from tests.conftest import make_camera

        cam = make_camera()
        g = random_gaussians(1)
        g = g.replace(
            xyz=jnp.zeros((1, 3)),
            scaling=jnp.full((1, 3), -12.0),  # ~6e-6 world scale
            rotation=jnp.array([[1.0, 0, 0, 0]]),
        )
        proj = project(g.get_xyz, g.get_scaling, g.get_rotation,
                       g.get_opacity, cam, shs=g.shs, kernel_size=0.2)
        assert float(proj.opacity[0]) == 0.0

    def test_scale_modifier_equals_scaled_input(self):
        """render(scale_modifier=m) ≡ render(scaling·m) — computeCov3D
        multiplies mod into the scale matrix (forward.cu:273-277) and the
        plane chain reuses the modified Σ (forward.cu:108+)."""
        from tests.conftest import make_camera

        cam = make_camera()
        g = random_gaussians(64, seed=3)
        m = 0.7
        settings = RasterSettings(
            image_height=64, image_width=64, impl="tiles",
            max_pairs=1 << 13, max_per_tile=256, chunk=64,
            scale_modifier=m)
        base = RasterSettings(
            image_height=64, image_width=64, impl="tiles",
            max_pairs=1 << 13, max_per_tile=256, chunk=64)
        out_mod = _jrast(_raster_args(g, cam), settings)
        args_scaled = _raster_args(g, cam)
        args_scaled["scaling"] = g.get_scaling * m
        out_scaled = _jrast(args_scaled, base)
        for key in ("color", "alpha", "depth", "normal"):
            np.testing.assert_allclose(
                np.asarray(out_mod[key]), np.asarray(out_scaled[key]),
                atol=1e-6, err_msg=key)

    def test_rank1_vrk_branch_normal(self):
        """scale 1e-6 → s² = 1e-12 < 1e-8: the ill-conditioned rank-1
        Vrk⁻¹ branch (forward.cu:141-157 / projection.py:287-293). The
        depth-gradient normal of the degenerate disc must still align
        with its plane normal and all outputs stay finite."""
        from igs_tpu.core.quaternion import quat_to_rotmat
        from tests.conftest import make_camera

        rng = np.random.RandomState(1)
        n = 8
        xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = np.full((n, 3), 0.3, np.float32)
        scale[:, 1] = 1e-6  # degenerate mid axis → rank-1 branch
        cam = make_camera()
        proj = project(
            jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(q),
            jnp.full((n,), 0.9), cam, colors_precomp=jnp.zeros((n, 3)))
        assert np.isfinite(np.asarray(proj.normal)).all()
        assert np.isfinite(np.asarray(proj.camera_plane)).all()
        assert np.isfinite(np.asarray(proj.ray_plane)).all()
        r = np.asarray(quat_to_rotmat(jnp.asarray(q), normalize=False))
        wvt = np.asarray(cam.world_view_transform)
        disc_cam = r[:, :, 1] @ wvt[:3, :3]
        disc_cam /= np.linalg.norm(disc_cam, axis=1, keepdims=True)
        cos = np.abs(np.sum(np.asarray(proj.normal) * disc_cam, axis=1))
        assert cos.min() > 0.98, cos

    def test_well_conditioned_thin_disc(self):
        """scale 3e-4 (s² = 9e-8 > 1e-8) stays on the full-inverse
        branch; normal geometry must agree with the rank-1 limit."""
        from igs_tpu.core.quaternion import quat_to_rotmat
        from tests.conftest import make_camera

        rng = np.random.RandomState(2)
        n = 8
        xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = np.full((n, 3), 0.3, np.float32)
        scale[:, 0] = 3e-4
        cam = make_camera()
        proj = project(
            jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(q),
            jnp.full((n,), 0.9), cam, colors_precomp=jnp.zeros((n, 3)))
        r = np.asarray(quat_to_rotmat(jnp.asarray(q), normalize=False))
        wvt = np.asarray(cam.world_view_transform)
        disc_cam = r[:, :, 0] @ wvt[:3, :3]
        disc_cam /= np.linalg.norm(disc_cam, axis=1, keepdims=True)
        cos = np.abs(np.sum(np.asarray(proj.normal) * disc_cam, axis=1))
        assert cos.min() > 0.98, cos

    def test_ray_plane_slope_matches_intersection(self):
        """Round-4 audit fix #2 (AUDIT.md §planes): plane = nJ_inv·w keeps
        the third-column terms (−u·w2, −v·w2), forward.cu:181-244.
        Independent witness: for a thin disc, dt/dpixel from ray_plane
        must match the finite-difference slope of the exact ray-plane
        intersection distance. The q2-less (row-major) transcription errs
        up to 9.3% on this exact set; the fixed one ≤0.8%."""
        from igs_tpu.core.quaternion import quat_to_rotmat
        from tests.conftest import make_camera

        rng = np.random.RandomState(0)
        n = 10
        xyz = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = np.full((n, 3), 0.3, np.float32)
        scale[:, 2] = 1e-5
        H = W = 256
        cam = make_camera(height=H, width=W, fov=0.9)
        proj = project(
            jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(q),
            jnp.full((n,), 0.9), cam, colors_precomp=jnp.zeros((n, 3)))
        fx, fy = float(cam.focal_x), float(cam.focal_y)
        wvt = np.asarray(cam.world_view_transform)
        rv = wvt[:3, :3].T
        r = np.asarray(quat_to_rotmat(jnp.asarray(q), normalize=False))
        p_cam = xyz @ rv.T + wvt[3, :3]
        n_cam = r[:, :, 2] @ rv.T
        m2d = np.asarray(proj.means2d)
        rp = np.asarray(proj.ray_plane)

        def exact_t(i, px, py):
            u = (px - (W - 1) / 2) / fx
            v = (py - (H - 1) / 2) / fy
            d = np.array([u, v, 1.0])
            return (np.dot(n_cam[i], p_cam[i]) * np.linalg.norm(d)
                    / np.dot(n_cam[i], d))

        h = 1e-3
        for i in range(n):
            sx = (exact_t(i, m2d[i, 0] + h, m2d[i, 1])
                  - exact_t(i, m2d[i, 0] - h, m2d[i, 1])) / (2 * h)
            sy = (exact_t(i, m2d[i, 0], m2d[i, 1] + h)
                  - exact_t(i, m2d[i, 0], m2d[i, 1] - h)) / (2 * h)
            # t = t_center + ray_plane·d with d = center − pixel
            err = max(abs(-rp[i, 0] - sx), abs(-rp[i, 1] - sy))
            assert err / max(abs(sx), abs(sy), 1e-6) < 0.015, (i, err)
