"""Tests for losses, saving, profiling, config, and LPIPS scaffolding."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from igs_tpu.train.losses import l1_loss, psnr, quaternion_loss, ssim
from igs_tpu.utils.saving import (
    save_image, save_image_grid, save_depth_mm, to_uint8_image, dump_json,
)
from igs_tpu.utils.profiling import (
    JsonlLogger, StepTimer, debug_dump_on_nonfinite,
)
from igs_tpu.config import load_config


class TestSSIM:
    def test_matches_torch_impl(self):
        # parity vs the reference's gaussian-window SSIM computed in torch
        import torch
        import torch.nn.functional as F
        from math import exp

        rng = np.random.RandomState(0)
        a = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)

        def gaussian(ws, sigma):
            g = torch.Tensor([
                exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)
            ])
            return g / g.sum()

        w1 = gaussian(11, 1.5).unsqueeze(1)
        win = (w1 @ w1.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        mu1 = F.conv2d(ta, win, padding=5, groups=3)
        mu2 = F.conv2d(tb, win, padding=5, groups=3)
        s1 = F.conv2d(ta * ta, win, padding=5, groups=3) - mu1**2
        s2 = F.conv2d(tb * tb, win, padding=5, groups=3) - mu2**2
        s12 = F.conv2d(ta * tb, win, padding=5, groups=3) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
               / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))).mean().item()

        ours, _ = ssim(jnp.asarray(a), jnp.asarray(b))
        assert abs(float(ours) - ref) < 1e-5

    def test_identical_images(self):
        a = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (3, 16, 16)),
                        jnp.float32)
        s, m = ssim(a, a)
        assert float(s) > 0.99

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)

    def test_quaternion_loss(self):
        q = jnp.asarray(np.random.RandomState(0).normal(size=(8, 4)),
                        jnp.float32)
        assert float(quaternion_loss(q, q)) < 1e-3
        assert float(quaternion_loss(q, -q)) < 1e-3  # antipodal = same rot


class TestSaving:
    def test_uint8_conversion(self):
        img = np.random.RandomState(0).uniform(0, 1, (3, 8, 8))
        u8 = to_uint8_image(img)
        assert u8.shape == (8, 8, 3) and u8.dtype == np.uint8

    def test_save_and_grid(self, tmp_path):
        imgs = [np.random.RandomState(i).uniform(0, 1, (3, 8, 8))
                for i in range(5)]
        save_image(str(tmp_path / "a.png"), imgs[0])
        save_image_grid(str(tmp_path / "grid.png"), imgs, cols=3)
        from PIL import Image

        grid = np.asarray(Image.open(tmp_path / "grid.png"))
        assert grid.shape == (16, 24, 3)

    def test_depth_mm_roundtrip(self, tmp_path):
        from PIL import Image

        d = np.random.RandomState(0).uniform(0.5, 10, (8, 8)).astype(np.float32)
        save_depth_mm(str(tmp_path / "d.png"), d)
        back = np.asarray(Image.open(tmp_path / "d.png")) / 1000.0
        np.testing.assert_allclose(back, d, atol=1e-3)


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        t.start()
        t.stop(jnp.ones(4))
        assert t.summary()["count"] == 1

    def test_debug_dump(self, tmp_path):
        ok = debug_dump_on_nonfinite(str(tmp_path), "fw", x=np.ones(3))
        assert not ok
        bad = debug_dump_on_nonfinite(
            str(tmp_path), "fw", x=np.array([1.0, np.nan]))
        assert bad
        assert os.path.exists(tmp_path / "snapshot_fw.npz")

    def test_jsonl_logger(self, tmp_path):
        lg = JsonlLogger(str(tmp_path / "log.jsonl"))
        lg.log(1, loss=0.5)
        lg.log(2, loss=0.25)
        lines = open(tmp_path / "log.jsonl").read().strip().split("\n")
        assert len(lines) == 2
        assert json.loads(lines[1])["loss"] == 0.25


class TestConfigExtras:
    def test_dotlist_override(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("opt:\n  lr: 1e-3\n  name: base\n")
        cfg = load_config(str(p), cli_args=["opt.lr=5e-4", "opt.extra.x=2"])
        assert cfg.opt["lr"] == 5e-4
        assert cfg.opt["extra"]["x"] == 2

    def test_extends(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("opt:\n  a: 1\n  b: 2\n")
        child = tmp_path / "child.yaml"
        child.write_text(f"extends: {base}\nopt:\n  b: 3\n")
        cfg = load_config(str(child))
        assert cfg.opt == {"a": 1, "b": 3}


@pytest.mark.slow
class TestLPIPS:
    def test_structure(self):
        from igs_tpu.train.lpips import make_lpips

        fn, available = make_lpips(None)
        assert not available  # no weights offline
        a = jnp.zeros((1, 3, 32, 32))
        b = jnp.ones((1, 3, 32, 32)) * 0.5
        out = fn(a, b)
        assert out.shape == (1,)
        assert float(fn(a, a)[0]) < 1e-6  # identical inputs → 0 distance


def test_nested_resolver_interpolation_keeps_type():
    """${gt0:${opt.x}} must resolve to a native bool, not the string
    "False" (train.yaml:222 render_flow wiring)."""
    import yaml
    from igs_tpu.config import load_config

    p = "/tmp/_cfg_nested.yaml"
    with open(p, "w") as f:
        f.write("opt:\n  lam: 0\n  lam2: 2\n"
                "system:\n  a: ${gt0:${opt.lam}}\n  b: ${gt0:${opt.lam2}}\n"
                "data: {}\n")
    cfg = load_config(p)
    assert cfg.system["a"] is False
    assert cfg.system["b"] is True


def test_reference_train_yaml_render_flow_off():
    """The shipped train.yaml has lambda_render_flow: 0 → renderer
    render_flow must come out False (was the string 'False')."""
    from igs_tpu.config import load_config
    from igs_tpu.builders import build_model

    cfg = load_config("/root/reference/configs/train.yaml")
    assert cfg.system["renderer"]["render_flow"] is False
    assert build_model(cfg.system).render_flow is False


def test_reference_train_yaml_local_ray_honored():
    """The shipped train.yaml sets local_ray: False (train.yaml:74) — the
    built model must route condition3D through the Plücker path."""
    from igs_tpu.config import load_config
    from igs_tpu.builders import build_model

    cfg = load_config("/root/reference/configs/train.yaml")
    assert cfg.system["local_ray"] is False
    assert build_model(cfg.system).local_ray is False
