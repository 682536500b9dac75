"""Training-loss wiring: LPIPS term (main.py:267-275) and
save-state-on-failure (main.py:278-287)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.train.driver import (
    OptConfig, compute_loss, load_checkpoint, run_guarded_step,
)


def test_lpips_downsample_matches_torch_interpolate():
    """The reference downsamples to 256² with F.interpolate bilinear
    align_corners=False (main.py:270-273); jax.image.resize's half-pixel
    bilinear must reproduce it."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (2, 3, 37, 53)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(img) * 2 - 1, (256, 256), mode="bilinear",
        align_corners=False,
    ).numpy()
    out = jax.image.resize(
        jnp.asarray(img) * 2 - 1, (2, 3, 256, 256), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_compute_loss_applies_lambda_lpips():
    """loss must include lambda_lpips · mean(lpips(prep(gt), prep(pred)))
    on the 256², ×2−1 images — checked with a stub metric so the term's
    inputs are verifiable."""
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 32, 32)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 32, 32)), jnp.float32)

    seen = {}

    def stub_lpips(x, y):  # (B·V, 3, 256, 256) each, in [-1, 1]
        seen["shapes"] = (x.shape, y.shape)
        seen["range"] = (float(jnp.min(x)), float(jnp.max(x)))
        return jnp.mean((x - y) ** 2, axis=(1, 2, 3))

    cfg0 = OptConfig(lambda_lpips=0.0)
    base, m0 = compute_loss({"images_pred": pred}, gt, cfg0,
                            lpips_fn=stub_lpips)
    assert "loss_lpips" not in m0  # gated on the lambda, not the fn

    lam = 0.7
    cfg = OptConfig(lambda_lpips=lam)
    loss, m = compute_loss({"images_pred": pred}, gt, cfg,
                           lpips_fn=stub_lpips)
    assert seen["shapes"] == ((2, 3, 256, 256), (2, 3, 256, 256))
    assert -1.01 <= seen["range"][0] and seen["range"][1] <= 1.01

    def prep(img):
        flat = img.reshape(2, 3, 32, 32) * 2.0 - 1.0
        return jax.image.resize(flat, (2, 3, 256, 256), method="bilinear")

    expected = float(jnp.mean(stub_lpips(prep(gt), prep(pred))))
    np.testing.assert_allclose(float(m["loss_lpips"]), expected, rtol=1e-6)
    np.testing.assert_allclose(
        float(loss), float(base) + lam * expected, rtol=1e-6)


@pytest.mark.slow
def test_train_step_smoke_with_lpips(monkeypatch):
    """make_train_step with lambda_lpips > 0 runs end-to-end (random VGG
    weights, warning expected) and produces a finite loss + param update."""
    from igs_tpu.models.agm import AGMNet
    from igs_tpu.ops.rasterize import RasterSettings
    import igs_tpu.train.driver as driver_mod
    from igs_tpu.train.driver import make_optimizer, make_train_step
    from tests.test_agm import tiny_batch

    # wiring test, not a VGG benchmark: shrink the LPIPS input res
    monkeypatch.setattr(driver_mod, "LPIPS_RES", 64)
    hw = 32
    batch, state, gaussians = tiny_batch(b=1, v=2, vout=1, hw=hw, n=64, a=32)
    batch["images_output"] = jnp.asarray(
        np.random.RandomState(2).uniform(0, 1, (1, 1, 3, hw, hw)),
        jnp.float32)
    settings = RasterSettings(
        image_height=hw, image_width=hw, impl="tiles",
        max_pairs=1 << 13, max_per_tile=128, chunk=64, clamp_grads=True,
    )
    model = AGMNet(feature_channels=32, backbone_layers=1, encoder_layers=1,
                   encoder_heads=2, encoder_head_dim=16)
    params = model.init(jax.random.PRNGKey(0), batch, state, gaussians,
                        settings)
    cfg = OptConfig(warmup_steps=1, lambda_lpips=0.5)
    tx, _ = make_optimizer(params, cfg, total_steps=10)
    with pytest.warns(UserWarning, match="lambda_lpips"):
        step = make_train_step(model, tx, cfg, settings)
    p0 = jax.tree.map(jnp.copy, params)
    p1, _, m = step(params, tx.init(p0), batch, state, gaussians)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_lpips"]))
    # the LPIPS term contributes to the gradient: at least one trainable
    # (non-backbone) param moved
    moved = [
        bool(jnp.any(a != b))
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p0),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p1),
                   key=lambda t: str(t[0])),
        )
        if "backbone" not in str(ka)
    ]
    assert any(moved)


def test_crash_save_and_resume(tmp_path):
    """A failing step saves params/opt_state/step to <workspace>/crash/
    and the checkpoint resumes (VERDICT r3 item 6)."""
    params = {"w": jnp.arange(4.0)}
    opt_state = {"m": jnp.ones(4)}

    def failing_step(p, o, b):
        raise RuntimeError("injected failure")

    ws = str(tmp_path)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_guarded_step(failing_step, ws, 17, params, opt_state, None)

    ckpt = os.path.join(ws, "crash", "params.msgpack")
    assert os.path.exists(ckpt)
    assert os.path.exists(ckpt + ".opt")
    restored, step = load_checkpoint(ckpt, params)
    assert step == 17
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))


def test_guarded_step_passthrough():
    """Success path returns the step results unchanged, no crash dir."""

    def ok_step(p, o, b):
        return p, o, {"loss": jnp.float32(1.5)}

    p, o, m = run_guarded_step(ok_step, "/tmp/_no_ws", 0, {"w": jnp.ones(2)},
                               {}, None)
    assert float(m["loss"]) == 1.5
    assert not os.path.exists("/tmp/_no_ws/crash")


def test_crash_save_falls_back_to_shadow(tmp_path):
    """Device-side failures invalidate donated live buffers; the guard
    must then save the shadow snapshot (round-4 review finding)."""
    import jax

    live = {"w": jnp.arange(4.0)}

    class Deleted:
        def __init__(self, x):
            self._x = x

        def __jax_array__(self):
            raise RuntimeError("buffer was donated")

    def failing_step(p, o, b):
        raise RuntimeError("device error")

    shadow = ({"w": np.full(4, 5.0, np.float32)}, {"m": np.zeros(4)}, 42)
    ws = str(tmp_path)
    with pytest.raises(RuntimeError, match="device error"):
        run_guarded_step(
            failing_step, ws, 99,
            {"w": Deleted(live["w"])}, {"m": Deleted(live["w"])}, None,
            shadow=shadow)
    ckpt = os.path.join(ws, "crash", "params.msgpack")
    assert os.path.exists(ckpt)
    restored, step = load_checkpoint(ckpt, {"w": jnp.zeros(4)})
    assert step == 42
    np.testing.assert_allclose(np.asarray(restored["w"]), 5.0)


def test_ssim_convs_pin_full_precision():
    """TPU convs default to bf16 inputs; the sigma^2 = blur(x^2) - mu^2
    cancellation then swamps the C2 stabilizer and the SSIM map blows
    past +-1, making 1-SSIM NEGATIVE — this poisoned the 256^2 training
    loss on real hardware (round 5). The blur convs must pin
    precision=HIGHEST; assert it survives in the jaxpr (a CPU run can't
    reproduce the TPU default-precision failure directly)."""
    import jax
    import jax.numpy as jnp

    from igs_tpu.train.losses import ssim

    a = jnp.zeros((3, 32, 32))
    jaxpr = str(jax.make_jaxpr(lambda x, y: ssim(x, y)[0])(a, a))
    n_convs = jaxpr.count("conv_general_dilated")
    assert n_convs >= 2
    assert jaxpr.count("HIGHEST") >= n_convs, jaxpr[:2000]
