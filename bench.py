"""Benchmark: differentiable rasterizer fwd+bwd throughput at 512² (1 chip).

This is the north-star kernel metric from BASELINE.json ("Mpix/s fwd+bwd
rasterize per chip at 512²"). A realistic N3DV-scale synthetic scene
(100k visible Gaussians) is rendered with the full RaDe-GS output set
(color/depth/median/normal/alpha) and gradients to every Gaussian
parameter.

vs_baseline is measured against the BASELINE.md streaming target of
≥1 frame/sec at 512² (= 0.262 Mpix/s of fwd+bwd rasterization): the
rasterizer must clear that bar with large headroom to leave budget for the
AGM network.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import threading
import time

import numpy as np


def _watchdog(seconds=900):
    """Emit an explicit error line if the device never answers — a wedged
    axon tunnel otherwise hangs jax.devices() forever and the driver's
    bench record would show nothing at all."""
    def fire():
        print(json.dumps({
            "metric": "rasterize_fwd_bwd_mpix_per_s_512", "value": 0.0,
            "unit": "Mpix/s", "vs_baseline": 0.0,
            "error": f"accelerator unreachable for {seconds}s",
        }), flush=True)
        import os
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    wd = _watchdog()
    import jax
    import jax.numpy as jnp

    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.core.camera import Camera
    from igs_tpu.ops.rasterize import RasterSettings, rasterize

    n = 100_000
    h = w = 512
    rng = np.random.RandomState(0)
    # mimic a compressed N3DV frame: points in a room-scale shell around
    # the origin, small anisotropic scales, mixed opacities
    xyz = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    opacity = rng.uniform(-2.0, 4.0, (n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    scaling = rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1, 2, (n, 3))
    shs[:, 1:] = 0.05 * rng.normal(size=(n, 15, 3)).astype(np.float32)
    g = Gaussians.create(xyz, opacity, rot, scaling, shs)

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 5.0
    cam = Camera.from_w2c(w2c, 0.9, 0.9, height=h, width=w)

    settings = RasterSettings(
        image_height=h, image_width=w, impl="pallas_packed",
        max_pairs=1 << 19, max_per_tile=1024, chunk=128,
    )
    # deployment-style budget: measured pair count × 1.25 headroom (the
    # ceiling budget above is ~2× this scene's need and every
    # budget-sized stage pays for the STATIC size; overflow stays
    # surfaced if the calibrated budget is ever exceeded)
    from igs_tpu.ops.rasterize import calibrate_pair_budget

    settings, measured_pairs = calibrate_pair_budget(
        g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation, cam,
        valid=g.valid, settings=settings)

    def loss_fn(xyz, op_raw, scale_raw, rot_raw, shs):
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
            jnp.mean(jnp.abs(out["color"]))
            + 0.1 * jnp.mean(out["depth"])
            + 0.01 * jnp.mean(out["alpha"])
        )

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))
    args = (g.xyz, g.opacity, g.scaling, g.rotation, g.shs)

    # timeit_device: K on-device salted repetitions per dispatch +
    # host-fetch completion (block_until_ready does NOT block through the
    # axon tunnel and identical calls return cached results — see
    # igs_tpu/utils/devtime.py)
    from igs_tpu.utils.devtime import timeit_device

    dt = timeit_device(grad_fn, *args, K=32, iters=5)
    mpix_s = h * w / dt / 1e6
    target_mpix_s = h * w * 1.0 / 1e6  # ≥1 streamed frame/sec @ 512²
    wd.cancel()
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s_512",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / target_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
