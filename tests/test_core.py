"""Unit tests for core math: quaternions, SH, cameras, gaussian pytree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.core.quaternion import quat_to_rotmat, quat_multiply, quat_normalize
from igs_tpu.core.sh import eval_sh_color, rsh_cart_3, sh_basis, SH_C0
from igs_tpu.core.camera import Camera, get_projection_matrix, world_to_view
from igs_tpu.core.gaussians import Gaussians, fuse_3d_filter, select_points_bbox
from tests.conftest import make_camera, random_gaussians


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        r = quat_to_rotmat(q)
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_rotmat_orthonormal(self):
        rng = np.random.RandomState(0)
        q = rng.normal(size=(32, 4)).astype(np.float32)
        r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), np.ones(32), atol=1e-5)

    def test_multiply_matches_rotation_composition(self):
        rng = np.random.RandomState(1)
        q1 = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        q2 = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        r12 = quat_to_rotmat(quat_multiply(q1, q2))
        r1r2 = jnp.einsum("nij,njk->nik", quat_to_rotmat(q1), quat_to_rotmat(q2))
        np.testing.assert_allclose(np.asarray(r12), np.asarray(r1r2), atol=1e-5)

    def test_90deg_z(self):
        # rotation by 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        s = np.sqrt(0.5).astype(np.float32)
        r = np.asarray(quat_to_rotmat(jnp.array([[s, 0, 0, s]])))[0]
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


class TestSH:
    def test_dc_only(self):
        shs = np.zeros((4, 16, 3), np.float32)
        shs[:, 0, :] = 1.0
        color, clamped = eval_sh_color(
            jnp.asarray(shs), jnp.zeros((4, 3)), jnp.array([0.0, 0, -3])
        )
        np.testing.assert_allclose(np.asarray(color), SH_C0 * 1.0 + 0.5, atol=1e-6)
        assert not np.asarray(clamped).any()

    def test_clamp(self):
        shs = np.zeros((1, 16, 3), np.float32)
        shs[:, 0, :] = -10.0
        color, clamped = eval_sh_color(
            jnp.asarray(shs), jnp.zeros((1, 3)), jnp.array([0.0, 0, -3])
        )
        assert (np.asarray(color) == 0).all()
        assert np.asarray(clamped).all()

    def test_basis_orthogonality(self):
        # SH basis should be orthonormal under uniform sphere sampling
        rng = np.random.RandomState(0)
        d = rng.normal(size=(200000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        b = np.asarray(sh_basis(jnp.asarray(d, jnp.float32), 3))
        gram = 4 * np.pi * b.T @ b / d.shape[0]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_rsh_cart_3_dc(self):
        out = np.asarray(rsh_cart_3(jnp.array([[0.0, 0.0, 1.0]])))
        assert out.shape == (1, 16)
        np.testing.assert_allclose(out[0, 0], 0.282094791773878, atol=1e-6)


class TestCamera:
    def test_view_transform_roundtrip(self):
        cam = make_camera(radius=4.0)
        # world origin should sit at view-space (0, 0, 4)
        p = jnp.zeros((1, 3))
        wvt = cam.world_view_transform
        pv = p @ wvt[:3, :3] + wvt[3, :3]
        np.testing.assert_allclose(np.asarray(pv)[0], [0, 0, 4.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.camera_center), [0, 0, -4.0], atol=1e-5)

    def test_projection_center(self):
        cam = make_camera()
        p = jnp.array([[0.0, 0.0, 0.0]])
        fpt = cam.full_proj_transform
        ph = p @ fpt[:3, :] + fpt[3, :]
        ndc = np.asarray(ph[0, :3] / ph[0, 3])
        np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)

    def test_projection_fov_edge(self):
        fov = 0.8
        cam = make_camera(fov=fov, radius=4.0)
        # a point at x = z*tan(fov/2) should project to ndc x = 1
        x = 4.0 * np.tan(fov / 2)
        p = jnp.array([[x, 0.0, 0.0]])
        fpt = cam.full_proj_transform
        ph = p @ fpt[:3, :] + fpt[3, :]
        np.testing.assert_allclose(float(ph[0, 0] / ph[0, 3]), 1.0, atol=1e-5)

    def test_focal(self):
        cam = make_camera(height=64, width=128, fov=0.8)
        assert abs(float(cam.focal_x) - 128 / (2 * np.tan(0.4))) < 1e-3


class TestGaussians:
    def test_activations(self):
        g = random_gaussians(16)
        assert np.asarray(g.get_opacity).min() >= 0
        assert np.asarray(g.get_opacity).max() <= 1
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(g.get_rotation), axis=1), 1.0, atol=1e-5
        )

    def test_deform_masked(self):
        g = random_gaussians(16)
        mask = jnp.arange(16) < 8
        res_xyz = jnp.ones((16, 3))
        g2 = g.deform(res_xyz, mask=mask)
        np.testing.assert_allclose(
            np.asarray(g2.xyz[:8]), np.asarray(g.xyz[:8]) + 1.0, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(g2.xyz[8:]), np.asarray(g.xyz[8:]))

    def test_deform_rotation_is_quat_product(self):
        g = random_gaussians(4)
        res_rot = jnp.tile(jnp.array([[0.9, 0.1, 0.0, 0.0]]), (4, 1))
        g2 = g.deform(jnp.zeros((4, 3)), res_rotation=res_rot)
        expect = quat_multiply(g.rotation, res_rot)
        np.testing.assert_allclose(np.asarray(g2.rotation), np.asarray(expect), atol=1e-6)

    def test_pad_dead_rows(self):
        g = random_gaussians(16)
        g2 = g.pad_to(32)
        assert g2.num_capacity == 32
        assert int(g2.num_valid) == 16
        assert np.asarray(g2.get_opacity[16:]).max() == 0.0

    def test_fuse_3d_filter(self):
        # filter=0 → identity on activated params
        scaling = jnp.log(jnp.full((4, 3), 0.1))
        opacity = jnp.zeros((4, 1))
        s, o = fuse_3d_filter(scaling, opacity, jnp.zeros((4, 1)))
        np.testing.assert_allclose(np.asarray(s), 0.1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o), 0.5, atol=1e-6)
        # large filter swells scale and shrinks opacity
        s2, o2 = fuse_3d_filter(scaling, opacity, jnp.full((4, 1), 0.2))
        assert np.asarray(s2).min() > 0.2
        assert np.asarray(o2).max() < 0.1

    def test_select_points_bbox(self):
        pts = jnp.array([[0.0, 0, 0], [2.0, 0, 0], [-0.5, 0.5, 0.5]])
        bbox = jnp.array([[-1.0, -1, -1], [1.0, 1, 1]])
        m = np.asarray(select_points_bbox(pts, bbox))
        assert m.tolist() == [True, False, True]
