"""Test configuration: force CPU with 8 virtual devices.

Per the build contract, multi-chip sharding is validated on a virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8); all numeric
tests run on CPU for determinism and speed of iteration. The real-TPU
smoke/bench paths live in bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's register() forces jax_platforms="axon,cpu" from
# sitecustomize; override AFTER import so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: full-suite reruns drop from ~15 min to ~2
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from igs_tpu.core.camera import Camera  # noqa: E402
from igs_tpu.core.gaussians import Gaussians  # noqa: E402


def make_camera(height=64, width=64, fov=0.8, radius=4.0):
    """A simple camera at z=-radius looking at the origin (+z forward)."""
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = radius  # world origin → view z = +radius
    return Camera.from_w2c(w2c, fov, fov, height=height, width=width)


def random_gaussians(n=256, seed=0, spread=1.0, scale_rng=(-3.2, -1.8)):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    opacity = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    scaling = rng.uniform(*scale_rng, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    shs[:, 1:] = 0.12 * rng.normal(size=(n, 15, 3))
    return Gaussians.create(xyz, opacity, rot, scaling, shs)


@pytest.fixture
def camera64():
    return make_camera()


@pytest.fixture
def gaussians_small():
    return random_gaussians(n=256)
