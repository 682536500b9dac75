"""Pallas blend kernel parity (interpret mode on CPU) vs XLA tiled path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igs_tpu.ops.rasterize import RasterSettings, rasterize
from tests.conftest import make_camera, random_gaussians


pytestmark = pytest.mark.slow

XLA = RasterSettings(
    image_height=64, image_width=64, impl="tiles",
    max_pairs=1 << 16, max_per_tile=512, chunk=64,
)
PALLAS = XLA._replace(impl="pallas", pallas_interpret=True)


def _args(g, cam):
    return dict(
        means3d=g.get_xyz, opacity=g.get_opacity, scaling=g.get_scaling,
        rotation=g.get_rotation, camera=cam, shs=g.shs,
    )


@pytest.mark.parametrize("seed,n", [(0, 256), (2, 768)])
def test_pallas_forward_parity(seed, n):
    cam = make_camera()
    g = random_gaussians(n=n, seed=seed)
    ref = rasterize(**_args(g, cam), settings=XLA)
    pal = rasterize(**_args(g, cam), settings=PALLAS)
    for k in ["color", "alpha", "coord", "mcoord", "depth", "mdepth", "normal"]:
        np.testing.assert_allclose(
            np.asarray(pal[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-3,
            err_msg=f"{k} mismatch",
        )
    np.testing.assert_array_equal(
        np.asarray(pal["n_contrib"]), np.asarray(ref["n_contrib"]))


def test_pallas_gradients_match_xla():
    cam = make_camera(height=32, width=32)
    g = random_gaussians(n=128, seed=1)
    sx = XLA._replace(image_height=32, image_width=32, max_per_tile=256)
    sp = sx._replace(impl="pallas", pallas_interpret=True)

    def loss(xyz, settings):
        out = rasterize(
            means3d=xyz, opacity=g.get_opacity, scaling=g.get_scaling,
            rotation=g.get_rotation, camera=cam, shs=g.shs, settings=settings,
        )
        return jnp.mean(jnp.abs(out["color"])) + 0.1 * jnp.mean(out["depth"])

    g_ref = jax.grad(lambda x: loss(x, sx))(g.xyz)
    g_pal = jax.grad(lambda x: loss(x, sp))(g.xyz)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_pallas_with_bg():
    cam = make_camera()
    g = random_gaussians(n=64, seed=3)
    bg = jnp.array([0.2, 0.4, 0.6])
    ref = rasterize(**_args(g, cam), bg=bg, settings=XLA)
    pal = rasterize(**_args(g, cam), bg=bg, settings=PALLAS)
    np.testing.assert_allclose(
        np.asarray(pal["color"]), np.asarray(ref["color"]),
        atol=2e-4, rtol=1e-3)


def test_pallas_full_gradient_parity_all_outputs():
    """Grads of a loss touching ALL outputs (incl. median) for all params."""
    cam = make_camera(height=32, width=32)
    g = random_gaussians(n=96, seed=5)
    sx = XLA._replace(image_height=32, image_width=32, max_per_tile=256)
    sp = sx._replace(impl="pallas", pallas_interpret=True)

    def loss(args, settings):
        xyz, op, sc, ro, shs = args
        out = rasterize(
            means3d=xyz, opacity=jax.nn.sigmoid(op), scaling=jnp.exp(sc),
            rotation=ro / jnp.linalg.norm(ro, axis=-1, keepdims=True),
            camera=cam, shs=shs, bg=jnp.array([0.1, 0.2, 0.3]),
            settings=settings,
        )
        return (
            jnp.mean(jnp.abs(out["color"]))
            + 0.2 * jnp.mean(out["depth"])
            + 0.1 * jnp.mean(out["mdepth"])
            + 0.1 * jnp.mean(out["mcoord"])
            + 0.05 * jnp.mean(out["alpha"])
            + 0.05 * jnp.mean(out["normal"])
            + 0.05 * jnp.mean(out["coord"])
        )

    args = (g.xyz, g.opacity, g.scaling, g.rotation, g.shs)
    g_ref = jax.grad(lambda a: loss(a, sx))(args)
    g_pal = jax.grad(lambda a: loss(a, sp))(args)
    for name, a, b in zip(("xyz", "op", "sc", "ro", "shs"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-3,
            err_msg=f"grad {name}")


def test_color_and_depth_modes():
    cam = make_camera()
    g = random_gaussians(n=256, seed=7)
    full = rasterize(**_args(g, cam), settings=PALLAS)
    col = rasterize(**_args(g, cam),
                    settings=PALLAS._replace(outputs="color"))
    cd = rasterize(**_args(g, cam),
                   settings=PALLAS._replace(outputs="color_depth"))
    np.testing.assert_allclose(np.asarray(col["color"]),
                               np.asarray(full["color"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd["color"]),
                               np.asarray(full["color"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd["depth"]),
                               np.asarray(full["depth"]), atol=1e-5)
    assert np.asarray(col["depth"]).max() == 0  # not computed

    # color-mode gradients equal full-mode gradients for a color loss
    def loss(xyz, settings):
        return jnp.mean(rasterize(
            means3d=xyz, opacity=g.get_opacity, scaling=g.get_scaling,
            rotation=g.get_rotation, camera=cam, shs=g.shs,
            settings=settings)["color"] ** 2)

    g_full = jax.grad(lambda x: loss(x, PALLAS))(g.xyz)
    g_col = jax.grad(
        lambda x: loss(x, PALLAS._replace(outputs="color")))(g.xyz)
    np.testing.assert_allclose(np.asarray(g_col), np.asarray(g_full),
                               atol=1e-6)


# --- packed-pair path (aligned segments, in-kernel DMA) ---

PACKED = XLA._replace(impl="pallas_packed", pallas_interpret=True)


@pytest.mark.parametrize("seed,n", [(0, 256), (2, 768)])
def test_packed_forward_parity(seed, n):
    cam = make_camera()
    g = random_gaussians(n=n, seed=seed)
    ref = rasterize(**_args(g, cam), settings=XLA)
    pal = rasterize(**_args(g, cam), settings=PACKED)
    for k in ["color", "alpha", "coord", "mcoord", "depth", "mdepth",
              "normal"]:
        np.testing.assert_allclose(
            np.asarray(pal[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-3,
            err_msg=f"{k} mismatch",
        )
    np.testing.assert_array_equal(
        np.asarray(pal["n_contrib"]), np.asarray(ref["n_contrib"]))


def test_packed_full_gradient_parity():
    cam = make_camera(height=32, width=32)
    g = random_gaussians(n=96, seed=5)
    sx = XLA._replace(image_height=32, image_width=32, max_per_tile=256)
    sp = sx._replace(impl="pallas_packed", pallas_interpret=True)

    def loss(args, settings):
        xyz, op, sc, ro, shs = args
        out = rasterize(
            means3d=xyz, opacity=jax.nn.sigmoid(op), scaling=jnp.exp(sc),
            rotation=ro / jnp.linalg.norm(ro, axis=-1, keepdims=True),
            camera=cam, shs=shs, bg=jnp.array([0.1, 0.2, 0.3]),
            settings=settings,
        )
        return (
            jnp.mean(jnp.abs(out["color"]))
            + 0.2 * jnp.mean(out["depth"])
            + 0.1 * jnp.mean(out["mdepth"])
            + 0.1 * jnp.mean(out["mcoord"])
            + 0.05 * jnp.mean(out["alpha"])
            + 0.05 * jnp.mean(out["normal"])
            + 0.05 * jnp.mean(out["coord"])
        )

    args = (g.xyz, g.opacity, g.scaling, g.rotation, g.shs)
    g_ref = jax.grad(lambda a: loss(a, sx))(args)
    g_pal = jax.grad(lambda a: loss(a, sp))(args)
    for name, a, b in zip(("xyz", "op", "sc", "ro", "shs"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-3,
            err_msg=f"grad {name}")


def test_packed_color_mode_gradients():
    cam = make_camera()
    g = random_gaussians(n=256, seed=7)

    def loss(xyz, settings):
        return jnp.mean(rasterize(
            means3d=xyz, opacity=g.get_opacity, scaling=g.get_scaling,
            rotation=g.get_rotation, camera=cam, shs=g.shs,
            settings=settings)["color"] ** 2)

    g_full = jax.grad(lambda x: loss(x, PALLAS))(g.xyz)
    g_col = jax.grad(
        lambda x: loss(x, PACKED._replace(outputs="color")))(g.xyz)
    np.testing.assert_allclose(np.asarray(g_col), np.asarray(g_full),
                               atol=1e-5)


def test_packed_early_termination_parity():
    """Saturating scene: every pixel hits the transmittance floor well
    before its tile's pair list is exhausted, exercising the packed
    forward's early-exit path and its in-flight-DMA drain (a stale
    semaphore there corrupts the NEXT tile's reads on hardware)."""
    cam = make_camera()
    g = random_gaussians(n=768, seed=7)
    # near-opaque, enlarged gaussians -> alpha saturates in the first
    # chunk or two while counts stay high
    g = g.replace(
        opacity=jnp.full_like(g.opacity, 6.0),       # sigmoid -> 0.998
        scaling=g.scaling + 1.5,
    )
    ref = rasterize(**_args(g, cam), settings=XLA)
    pal = rasterize(**_args(g, cam), settings=PACKED)
    assert float(np.asarray(pal["alpha"]).min()) > 0.95  # truly saturated
    for k in ["color", "alpha", "depth", "normal"]:
        np.testing.assert_allclose(
            np.asarray(pal[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-3,
            err_msg=f"{k} mismatch",
        )
    # the 2-pass tri-dot can flip the termination test on pixels sitting
    # exactly at the transmittance floor -- allow off-by-one there
    np.testing.assert_allclose(
        np.asarray(pal["n_contrib"]), np.asarray(ref["n_contrib"]),
        atol=1)
