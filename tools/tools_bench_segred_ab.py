"""A/B: pair→gaussian grad reduction — scatter-add vs segred (ops/segred.py).

Times the full rasterize fwd+bwd (bench.py workload, full + color modes)
with the production segred VJP, then with the plain gather (whose AD
transpose is the microcoded scatter-add).

Usage: python tools_bench_segred_ab.py
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.ops import segred
    from igs_tpu.ops.rasterize import RasterSettings, rasterize
    from igs_tpu.utils.devtime import timeit_device

    n, h = 150_000, 512
    rng = np.random.RandomState(0)
    g = Gaussians.create(
        rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        rng.uniform(-2, 4, (n, 1)).astype(np.float32),
        (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
            rng.normal(size=(n, 4)).astype(np.float32)),
        rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32),
        np.concatenate([
            rng.uniform(-1, 2, (n, 1, 3)),
            0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32),
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 5.0
    cam = Camera.from_w2c(w2c, 0.9, 0.9, height=h, width=h)

    def plain(feats, gauss_id, *a):
        return feats[jnp.maximum(gauss_id, 0)]

    for mode in ("color", "full"):
        settings = RasterSettings(
            image_height=h, image_width=h, impl="pallas_packed",
            max_pairs=1 << 19, max_per_tile=1024, outputs=mode)

        def loss(x, op, sc, ro, sh):
            out = rasterize(means3d=x, opacity=op, scaling=sc, rotation=ro,
                            camera=cam, shs=sh, settings=settings)
            t = jnp.mean(jnp.abs(out["color"]))
            if mode == "full":
                t = t + 0.1 * jnp.mean(out["depth"])
            return t

        gf = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        args = (g.xyz, g.get_opacity, g.get_scaling, g.get_rotation, g.shs)

        t_seg = timeit_device(gf, *args, K=48)
        print(f"{mode}: segred  {t_seg*1e3:.2f} ms", flush=True)

        orig = segred.gather_pairs
        try:
            segred.gather_pairs = plain
            t_sc = timeit_device(gf, *args, K=48)
        finally:
            segred.gather_pairs = orig
        print(f"{mode}: scatter {t_sc*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
