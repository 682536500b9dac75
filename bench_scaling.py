"""Scaling-efficiency harness: per-chip throughput at 1/2/4/8 devices.

BASELINE.md target: ≥80% multi-host scaling efficiency. Measures the
data-parallel AGM train step (the production distributed workload) at
increasing device counts over the available mesh and reports per-device
scenes/sec plus efficiency vs the single-device run.

Runs anywhere:
  * real pod slice: `python bench_scaling.py` after
    `init_distributed()` (multi-host: every host runs this binary).
  * virtual validation: XLA_FLAGS=--xla_force_host_platform_device_count=8
    with --force-cpu validates the sharding/collective construction
    (numbers are CPU-meaningless but the efficiency plumbing is real).

Writes bench_scaling.json: {n_devices: {sec_per_step, scenes_per_sec,
per_device, efficiency}}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=128, help="input resolution")
    ap.add_argument("--n-gaussians", type=int, default=8192)
    ap.add_argument("--anchors", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--what", default="train", choices=["train", "refine",
                                                        "all"])
    ap.add_argument("--out", default="bench_scaling.json")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import jax.numpy as jnp

    from igs_tpu.parallel.distributed import init_distributed
    from igs_tpu.parallel.mesh import make_mesh, shard_batch
    from igs_tpu.train.driver import (
        OptConfig, make_optimizer, make_train_step)
    from igs_tpu.ops.rasterize import RasterSettings
    from igs_tpu.models.agm import AGMNet
    from igs_tpu.ops.anchors import select_anchors
    from igs_tpu.core.gaussians import Gaussians

    init_distributed()
    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]

    hw = args.hw
    n, a = args.n_gaussians, args.anchors
    rng = np.random.RandomState(0)

    def make_inputs(b):
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        g = Gaussians.create(
            xyz,
            rng.uniform(-1, 3, (n, 1)).astype(np.float32),
            (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
                rng.normal(size=(n, 4)).astype(np.float32)),
            rng.uniform(-4.5, -3.0, (n, 3)).astype(np.float32),
            np.concatenate([
                rng.uniform(-1, 2, (n, 1, 3)),
                0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32),
        )
        bbox = jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]])
        st = select_anchors(g.xyz, bbox, valid=g.valid, anchor_size=a, k=8)
        state = jax.tree.map(lambda x: jnp.stack([x] * b), st)
        gb = jax.tree.map(lambda x: jnp.stack([x] * b), g)
        c2w = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1))
        c2w[:, :, 2, 3] = -4.0
        h8 = hw // 8 * 2
        batch = {
            "cur_images_input": jnp.asarray(
                rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
            "next_images_input": jnp.asarray(
                rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
            "depth": jnp.asarray(
                rng.uniform(2, 6, (b, 4, hw, hw)), jnp.float32),
            "local_rays": jnp.asarray(
                rng.normal(size=(b, h8, h8, 3)), jnp.float32),
            "FOV": jnp.full((b, 2), 0.9),
            "c2w_input": jnp.asarray(c2w),
            "c2w_output": jnp.asarray(c2w[:, :2]),
            "background_color": jnp.zeros((b, 3)),
            "images_output": jnp.asarray(
                rng.uniform(0, 1, (b, 2, 3, hw, hw)), jnp.float32),
        }
        return batch, state, gb

    settings = RasterSettings(
        image_height=hw, image_width=hw,
        impl="pallas" if jax.default_backend() == "tpu" else "tiles",
        max_pairs=1 << 16, max_per_tile=512, chunk=128, clamp_grads=True,
        outputs="color",
    )
    model = AGMNet()
    cfg = OptConfig(warmup_steps=1)
    results = {}
    base_per_dev = None

    if args.what in ("refine", "all"):
        # strong scaling of the key-frame refine loop: FIXED image/scene,
        # render+backward strip-sharded over the tile axis
        # (stream/refine.py refine_run_sharded) — the streaming window's
        # dominant block.
        from igs_tpu.core.camera import Camera
        from igs_tpu.stream.refine import (
            RefineConfig, init_refine_state, refine_run, refine_run_sharded,
        )

        res = max(hw, 64)
        _, _, gb1 = make_inputs(1)
        g1 = jax.tree.map(lambda x: x[0], gb1)
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 4.0
        cam = Camera.from_w2c(w2c, 0.9, 0.9, height=res, width=res)
        cams = jax.tree.map(lambda *x: jnp.stack(x), *[cam, cam])
        gts = jnp.asarray(rng.uniform(0, 1, (2, 3, res, res)), jnp.float32)
        riters = 10
        order = jnp.asarray(np.arange(riters) % 2, jnp.int32)
        rcfg = RefineConfig()
        rset = RasterSettings(
            image_height=res, image_width=res,
            impl="pallas_packed", max_pairs=1 << 17, outputs="color",
            clamp_grads=False,
            pallas_interpret=jax.default_backend() != "tpu",
        )
        state0 = init_refine_state(g1, capacity=n)
        rcounts = [c for c in counts if (res // 16) % c == 0]
        base = None
        for c in rcounts:
            if c == 1:
                fn = jax.jit(lambda st: refine_run(
                    st, cams, gts, order, jnp.zeros(3), rcfg, rset,
                    jnp.float32(3.0), riters))
            else:
                mesh = make_mesh(data=1, tile=c, devices=devices[:c])
                fn = jax.jit(lambda st, m=mesh: refine_run_sharded(
                    st, cams, gts, order, jnp.zeros(3), rcfg, rset,
                    jnp.float32(3.0), riters, m))
            out = fn(state0)
            jax.block_until_ready(out.gaussians.xyz)
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                jax.block_until_ready(fn(state0).gaussians.xyz)
                ts.append(time.time() - t0)
            sec = float(np.median(ts)) / riters
            base = sec if base is None else base
            results[f"refine_{c}"] = {
                "sec_per_iter": sec,
                "speedup": base / sec,
                "efficiency": base / sec / c,
            }
            print(f"refine x{c}", results[f"refine_{c}"])

    if args.what == "refine":
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        return

    for c in counts:
        b = c  # one scene per device — fixed per-device work
        batch, state, gb = make_inputs(b)
        params = jax.jit(lambda r: model.init(
            r, batch, state, gb, settings))(jax.random.PRNGKey(0))
        tx, _ = make_optimizer(params, cfg, total_steps=100)
        mesh = make_mesh(data=c, tile=1, devices=devices[:c])
        step = make_train_step(model, tx, cfg, settings, mesh=mesh)
        bs = shard_batch(mesh, batch)
        ss = shard_batch(mesh, state)
        gs = shard_batch(mesh, gb)
        opt_state = tx.init(params)
        p2, o2, m = step(params, opt_state, bs, ss, gs)  # compile
        jax.block_until_ready(m["loss"])
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            p2, o2, m = step(p2, o2, bs, ss, gs)
            jax.block_until_ready(m["loss"])
            ts.append(time.time() - t0)
        sec = float(np.median(ts))
        per_dev = b / sec / c
        if base_per_dev is None:
            base_per_dev = per_dev
        results[str(c)] = {
            "sec_per_step": sec,
            "scenes_per_sec": b / sec,
            "per_device": per_dev,
            "efficiency": per_dev / base_per_dev,
        }
        print(c, results[str(c)])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
