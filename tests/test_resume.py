"""Checkpoint overlay (utils/resume.py) — round-4 regression: a msgpack
resume was silently discarded by a stale flat-dict rebuild, so streaming
ran with random-init weights while printing 'loaded native checkpoint'."""

import numpy as np
import jax
import jax.numpy as jnp

from igs_tpu.train.driver import save_checkpoint
from igs_tpu.utils.resume import load_params_with_overlays


def _params(val):
    return {"params": {"render": {"w": jnp.full((4, 4), val)},
                       "backbone": {"b": jnp.zeros(3)}}}


def test_msgpack_resume_actually_loads(tmp_path):
    ckpt = str(tmp_path / "params.msgpack")
    save_checkpoint(ckpt, _params(7.0), step=5)
    out = load_params_with_overlays(
        _params(0.0), {}, {"resume": ckpt})
    np.testing.assert_allclose(
        np.asarray(out["params"]["render"]["w"]), 7.0)


def test_missing_resume_is_noop(tmp_path):
    out = load_params_with_overlays(
        _params(1.0), {}, {"resume": str(tmp_path / "nope.msgpack")})
    np.testing.assert_allclose(
        np.asarray(out["params"]["render"]["w"]), 1.0)
