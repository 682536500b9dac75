"""End-to-end AGM-Net test: anchors → motion features → residuals → render."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from igs_tpu.models.agm import AGMNet
from igs_tpu.ops.anchors import select_anchors
from igs_tpu.ops.rasterize import RasterSettings
from tests.conftest import random_gaussians


pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def tiny_batch(b=1, v=2, vout=2, hw=32, n=128, a=32):
    rng = np.random.RandomState(0)
    g = random_gaussians(n=n, seed=1)
    gaussians = jax.tree.map(lambda x: jnp.stack([x] * b), g)

    bbox = jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]])
    state1 = select_anchors(g.xyz, bbox, valid=g.valid, anchor_size=a, k=4)
    state = jax.tree.map(lambda x: jnp.stack([x] * b), state1)

    c2w = np.tile(np.eye(4, dtype=np.float32), (b, max(v, vout), 1, 1))
    c2w[:, :, 2, 3] = -4.0  # camera at z=-4 (looks toward +z in 3DGS frame)

    h8 = hw // 8 * 2  # up_sample=True doubles the feature res
    batch = {
        "cur_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, v, 3, hw, hw)), jnp.float32),
        "next_images_input": jnp.asarray(
            rng.uniform(0, 1, (b, v, 3, hw, hw)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(2, 6, (b, v, hw, hw)), jnp.float32),
        "local_rays": jnp.asarray(
            rng.normal(size=(b, h8, h8, 3)), jnp.float32),
        "FOV": jnp.full((b, 2), 0.8),
        "c2w_input": jnp.asarray(c2w[:, :v]),
        "c2w_output": jnp.asarray(c2w[:, :vout]),
        "background_color": jnp.zeros((b, 3)),
    }
    return batch, state, gaussians


def test_agm_forward_shapes():
    b, vout, hw = 1, 2, 32
    batch, state, gaussians = tiny_batch(b=b, vout=vout, hw=hw)
    settings = RasterSettings(
        image_height=hw, image_width=hw, impl="tiles",
        max_pairs=1 << 14, max_per_tile=256, chunk=64,
    )
    model = AGMNet(feature_channels=32, backbone_layers=1, encoder_layers=1,
                   encoder_heads=2, encoder_head_dim=16)
    params = model.init(KEY, batch, state, gaussians, settings)
    out = model.apply(params, batch, state, gaussians, settings)
    assert out["images_pred"].shape == (b, vout, 3, hw, hw)
    assert out["depth_pred"].shape == (b, vout, hw, hw)
    assert np.isfinite(np.asarray(out["images_pred"])).all()
    # at zero-init heads, xyz residual is 0 → deformed xyz == original
    np.testing.assert_allclose(
        np.asarray(out["3dgs"].xyz), np.asarray(gaussians.xyz), atol=1e-6
    )
    # rotation residual is the near-identity bias → small rotation applied
    d = np.abs(np.asarray(out["3dgs"].rotation) - np.asarray(gaussians.rotation))
    assert d.max() > 0  # applied
    assert d.max() < 0.1  # near-identity


def test_agm_gradients_flow_and_backbone_frozen():
    hw = 32
    batch, state, gaussians = tiny_batch(hw=hw)
    settings = RasterSettings(
        image_height=hw, image_width=hw, impl="tiles",
        max_pairs=1 << 14, max_per_tile=256, chunk=64, clamp_grads=True,
    )
    model = AGMNet(feature_channels=32, backbone_layers=1, encoder_layers=1,
                   encoder_heads=2, encoder_head_dim=16)
    params = model.init(KEY, batch, state, gaussians, settings)
    # zero-init heads gate upstream grads at step 0 (by design); nudge the
    # head kernels so gradient flow through the whole stack is observable.
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    k = jax.random.PRNGKey(1)
    for path in list(flat):
        if "head_" in "/".join(map(str, path)) and path[-1] == "kernel":
            k, sub = jax.random.split(k)
            flat[path] = 0.01 * jax.random.normal(sub, flat[path].shape)
    params = flax.traverse_util.unflatten_dict(flat)
    target = jnp.zeros((1, 2, 3, hw, hw))

    def loss(p):
        out = model.apply(p, batch, state, gaussians, settings)
        return jnp.mean(jnp.abs(out["images_pred"] - target))

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    saw_nonzero = {}
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        finite = np.isfinite(np.asarray(g)).all()
        assert finite, f"non-finite grad at {name}"
        top = name.split("'")[3] if "'" in name else name
        saw_nonzero.setdefault(top, 0.0)
        saw_nonzero[top] = max(saw_nonzero[top], float(np.abs(np.asarray(g)).max()))
    # backbone frozen by stop_gradient
    assert saw_nonzero.get("backbone", 0.0) == 0.0
    # trainable parts receive gradient
    assert saw_nonzero.get("render", 0.0) > 0
    assert saw_nonzero.get("transformer", 0.0) > 0


def test_agm_render_flow_output():
    """cfg.render_flow surfaces flow_pred/flow_mask from the forward
    (gs.py:526-528,846; flow rendered at flow_height/width with the
    pre-deform gaussians)."""
    from igs_tpu.models.agm import AGMNet
    from igs_tpu.ops.rasterize import RasterSettings

    batch, state, gaussians = tiny_batch(b=1, v=2, vout=2, hw=32, n=128, a=32)
    settings = RasterSettings(
        image_height=32, image_width=32, impl="tiles",
        max_pairs=1 << 13, max_per_tile=128, chunk=64, clamp_grads=True,
    )
    model = AGMNet(render_flow=True, flow_height=16, flow_width=48)
    params = model.init(
        jax.random.PRNGKey(0), batch, state, gaussians, settings)
    out = model.apply(params, batch, state, gaussians, settings)
    assert out["flow_pred"].shape == (1, 2, 2, 16, 48)  # (B, V, 2, fh, fw)
    assert out["flow_mask"].shape[-2:] == (16, 48)
    assert bool(jnp.all(jnp.isfinite(out["flow_pred"])))


def test_shared_cur_cnn_matches_per_item():
    """shared_cur=True (key-frame CNN computed once per window,
    UniMatch.img0_tile) must equal the per-item forward exactly when
    every batch item shares cur_images_input (streaming windows do —
    one cur_frame per window in the pairs json)."""
    b, hw = 3, 32
    batch, state, gaussians = tiny_batch(b=b, v=2, vout=1, hw=hw, n=64, a=32)
    # make cur identical across the batch (as in streaming)
    batch["cur_images_input"] = jnp.broadcast_to(
        batch["cur_images_input"][:1], batch["cur_images_input"].shape)
    settings = RasterSettings(
        image_height=hw, image_width=hw, impl="tiles",
        max_pairs=1 << 13, max_per_tile=128, chunk=64,
    )
    model = AGMNet(feature_channels=32, backbone_layers=1, encoder_layers=1,
                   encoder_heads=2, encoder_head_dim=16)
    params = model.init(KEY, batch, state, gaussians, settings)
    ref = model.apply(params, batch, state, gaussians, settings)
    out = model.apply(params, batch, state, gaussians, settings,
                      shared_cur=True)
    np.testing.assert_allclose(
        np.asarray(out["images_pred"]), np.asarray(ref["images_pred"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["depth_pred"]), np.asarray(ref["depth_pred"]),
        atol=1e-5)
