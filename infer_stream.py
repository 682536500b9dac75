"""Streaming reconstruction — reference parity: infer_batch.py.

Usage:
    python infer_stream.py --config configs/demo.yaml [dot.list=overrides]

Loads the starting Gaussians + eval stream, runs batched key→candidate
AGM inference with per-key-frame refinement, writes results.json and
predicted eval-view PNGs into opt.workspace.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-batches", type=int, default=None)
    args, extras = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from igs_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from igs_tpu.builders import (
        build_dataset, build_model, build_raster_settings, build_stream_configs,
    )
    from igs_tpu.config import load_config
    from igs_tpu.ops.anchors import select_anchors
    from igs_tpu.stream.pipeline import StreamingPipeline

    cfg = load_config(args.config, cli_args=extras)
    # merge resume_cfg's system section if present (infer_batch.py:443-446)
    resume_cfg = cfg.opt.get("resume_cfg")
    if resume_cfg and os.path.exists(resume_cfg):
        sys_cfg = load_config(resume_cfg).system
        sys_cfg.update(cfg.system or {})
        cfg.system.update(sys_cfg)
    cfg.data["data"]["up_sample"] = cfg.system.get("up_sample", True)

    ds = build_dataset(cfg.data, training=False)
    model = build_model(
        cfg.system, bf16_default=jax.default_backend() == "tpu")
    stream_cfg, refine_cfg = build_stream_configs(cfg.opt)
    out_h = int(cfg.data["data"].get("output_height", 1014))
    out_w = int(cfg.data["data"].get("output_width", 1352))
    settings = build_raster_settings(out_h, out_w, clamp=True)

    # init params with a representative batch, then overlay checkpoints
    items = [ds[i] for i in range(stream_cfg.eval_batch_size)]
    batch = ds.collate(items)
    g0 = batch["gs"][0].pad_to(stream_cfg.max_num)
    state1 = select_anchors(
        g0.xyz, jnp.asarray(batch["bounding_box"][0]), valid=g0.valid,
        anchor_size=stream_cfg.anchor_size, k=stream_cfg.neighbor_k)
    b = stream_cfg.eval_batch_size
    state = jax.tree.map(lambda x: jnp.stack([x] * b), state1)
    gb = jax.tree.map(lambda x: jnp.stack([x] * b), g0)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    params = jax.jit(
        lambda r: model.init(r, jbatch, state, gb, settings)
    )(jax.random.PRNGKey(0))

    from igs_tpu.utils.resume import load_params_with_overlays

    params = load_params_with_overlays(params, cfg.system, cfg.opt)

    pipe = StreamingPipeline(model, params, ds, stream_cfg, refine_cfg, settings)
    results = pipe.run(max_batches=args.max_batches)
    print(
        f"avg PSNR {results['avg']:.2f}  "
        f"sec/frame {results['sec/frame']:.3f}  fps(render) {results['fps']:.1f}"
    )


if __name__ == "__main__":
    main()
