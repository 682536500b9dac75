"""Model-stack tests: shapes, init semantics, swin invariants, end-to-end AGM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.models.backbone import CNNEncoder
from igs_tpu.models.swin import (
    FeatureTransformer, FeatureTransformerMy, split_feature, merge_splits,
    position_embedding_sine, window_attention,
)
from igs_tpu.models.unimatch import UniMatch
from igs_tpu.models.transformer1d import Transformer1D
from igs_tpu.models.grid_encoder import GridEncoder
from igs_tpu.models.networks import MLP, ModLN
from igs_tpu.models.renderer import ResidualDecoder
from igs_tpu.ops.grid_sample import grid_sample_points

KEY = jax.random.PRNGKey(0)


class TestBackbone:
    def test_shapes(self):
        m = CNNEncoder(output_dim=128)
        x = jnp.zeros((2, 3, 64, 64))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == (2, 128, 8, 8)

    def test_instance_norm_batch_independence(self):
        # InstanceNorm (not BatchNorm): each sample's features are
        # independent of what else is in the batch
        m = CNNEncoder(output_dim=32)
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.normal(size=(1, 3, 64, 64)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 3, 64, 64)), jnp.float32)
        params = m.init(KEY, a)
        ya = m.apply(params, a)
        yab = m.apply(params, jnp.concatenate([a, b], axis=0))
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yab[:1]), atol=1e-5)


class TestSwin:
    def test_split_merge_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 8, 8, 4)),
                        jnp.float32)
        y = merge_splits(split_feature(x, 2), 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_position_embedding_shape(self):
        pos = position_embedding_sine(8, 8, 64)
        assert pos.shape == (128, 8, 8)
        assert np.abs(pos).max() <= 1.0 + 1e-6

    def test_window_attention_identity_value(self):
        # uniform q,k → attention = window mean of v
        rng = np.random.RandomState(0)
        v = jnp.asarray(rng.normal(size=(1, 64, 8)), jnp.float32)
        q = jnp.zeros((1, 64, 8))
        out = window_attention(q, q, v, num_splits=2, h=8, w=8)
        v_img = np.asarray(v).reshape(8, 8, 8)
        expect = v_img[:4, :4].mean(axis=(0, 1))
        np.testing.assert_allclose(np.asarray(out).reshape(8, 8, 8)[0, 0],
                                   expect, atol=1e-5)

    def test_feature_transformer_shapes(self):
        m = FeatureTransformer(num_layers=2, d_model=32)
        f0 = jnp.zeros((2, 32, 8, 8))
        params = m.init(KEY, f0, f0)
        a, b = m.apply(params, f0, f0)
        assert a.shape == b.shape == (2, 32, 8, 8)

    def test_feature_transformer_my_shapes(self):
        m = FeatureTransformerMy(num_layers=1, d_model=32)
        f0 = jnp.ones((1, 32, 8, 8))
        params = m.init(KEY, f0, f0)
        out = m.apply(params, f0, f0)
        assert out.shape == (1, 32, 8, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestTransformer1D:
    def test_residual_at_zero_proj(self):
        m = Transformer1D(in_channels=64, num_attention_heads=4,
                          attention_head_dim=16, num_layers=2,
                          norm_num_groups=32)
        x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 64, 100)),
                        jnp.float32)
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == (2, 64, 100)
        assert np.isfinite(np.asarray(y)).all()


class TestGridSample:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        feat = rng.normal(size=(1, 5, 7, 9)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, size=(1, 1, 20, 2)).astype(np.float32)
        ref = F.grid_sample(
            torch.from_numpy(feat), torch.from_numpy(grid),
            align_corners=False, padding_mode="zeros", mode="bilinear",
        ).numpy()[0, :, 0, :]  # (C, N)
        out = grid_sample_points(jnp.asarray(feat[0]), jnp.asarray(grid[0, 0]))
        np.testing.assert_allclose(np.asarray(out).T, ref, atol=1e-5)


class TestGridEncoder:
    def test_shapes(self):
        m = GridEncoder(in_channels=32, num_attention_heads=2,
                        attention_head_dim=16, num_layers=1)
        b, v, a = 2, 3, 64
        motion = jnp.asarray(
            np.random.RandomState(0).normal(size=(b * v, 32, 8, 8)), jnp.float32)
        anchors = jnp.asarray(
            np.random.RandomState(1).uniform(-1, 1, size=(b, a, 3)), jnp.float32)
        fov = jnp.full((b, 2), 0.8)
        c2w = jnp.tile(jnp.eye(4)[None, None], (b, v, 1, 1))
        c2w = c2w.at[:, :, 2, 3].set(-4.0)
        params = m.init(KEY, motion, anchors, fov, c2w)
        out = m.apply(params, motion, anchors, fov, c2w)
        assert out.shape == (b, a, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestDecoder:
    def test_zero_init_heads(self):
        m = ResidualDecoder(in_channels=32, n_neurons=32)
        x = jnp.asarray(np.random.RandomState(0).normal(size=(10, 32)),
                        jnp.float32)
        params = m.init(KEY, x)
        out = m.apply(params, x)
        np.testing.assert_allclose(np.asarray(out["xyz"]), 0.0, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out["rotation"]),
            np.tile([1.0, 1e-2, 1e-2, 1e-2], (10, 1)), atol=1e-7,
        )


class TestModLN:
    def test_shapes(self):
        m = ModLN(inner_dim=16)
        x = jnp.ones((2, 4, 4, 16))
        cond = jnp.ones((2, 4, 4, 4))
        params = m.init(KEY, x, cond)
        y = m.apply(params, x, cond)
        assert y.shape == x.shape


class TestUniMatch:
    def test_backbone_mode(self):
        m = UniMatch(feature_channels=32, num_transformer_layers=1)
        img = jnp.ones((1, 3, 32, 32))
        params = m.init(KEY, img, img)
        f0, f1 = m.apply(params, img, img)
        assert f0.shape == (1, 32, 4, 4)
        assert f1.shape == (1, 32, 4, 4)


def test_render_flow():
    """render_flow parity semantics (gs.py:659-713): pre-deform Gaussians
    splatted with camera-frame residual xy scaled by focal/world-z."""
    import jax.numpy as jnp
    from igs_tpu.core.camera import Camera
    from igs_tpu.models.renderer import render_flow
    from igs_tpu.ops.rasterize import RasterSettings
    from tests.conftest import random_gaussians

    g = random_gaussians(n=1, seed=0)
    g = g.replace(
        xyz=jnp.array([[0.0, 0.0, 2.0]]),  # world z = 2 (the quirk divisor)
        opacity=jnp.full((1, 1), 12.0),
        scaling=jnp.full((1, 3), -1.0),
        rotation=jnp.array([[1.0, 0, 0, 0]]),
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0  # camera at world z=-2 → gaussian at view z=4
    cam = Camera.from_w2c(w2c, 0.8, 0.8, height=32, width=32)
    dxyz = jnp.array([[0.05, -0.02, 0.0]])
    deformed = g.deform(res_xyz=dxyz, mask=jnp.ones(1, bool))
    settings = RasterSettings(
        image_height=32, image_width=32, impl="tiles",
        max_pairs=1 << 12, max_per_tile=64, chunk=64, clamp_grads=True,
    )
    out = render_flow(g, deformed, cam, jnp.zeros(3), settings)
    assert out["flow_pred"].shape == (2, 32, 32)
    assert out["flow_mask"].shape == (32, 32)
    # at the gaussian's center pixel: flow ≈ (fx·dx/z_world, fy·dy/z_world)
    # (identity w2c rotation → camera frame == world frame)
    fx = float(cam.focal_x)
    got = np.asarray(out["flow_pred"][:, 16, 16])
    want = np.array([fx * 0.05 / 2.0, fx * -0.02 / 2.0])
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_cnn_encoder_bf16_close_to_f32():
    """cnn_bf16 flag: bf16-compute encoder (f32 IN stats) stays within
    bf16 tolerance of the f32 path; params are shared/identical."""
    from igs_tpu.models.backbone import CNNEncoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-2, 2, (2, 3, 64, 64)), jnp.float32)
    enc32 = CNNEncoder(output_dim=32)
    p = enc32.init(jax.random.PRNGKey(0), x)
    y32 = enc32.apply(p, x)
    y16 = CNNEncoder(output_dim=32, dtype=jnp.bfloat16).apply(p, x)
    assert y16.dtype == jnp.float32  # output returns to f32
    rel = np.abs(np.asarray(y16 - y32)).max() / (
        np.abs(np.asarray(y32)).max() + 1e-9)
    assert rel < 0.05, rel
