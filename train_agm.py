"""Train AGM-Net — reference parity: main.py (SURVEY.md §3.4).

Usage:
    python train_agm.py --config configs/train.yaml [dot.list=overrides]

Data-parallel over all local devices via the (data, tile) mesh; AdamW +
OneCycle with a frozen GMFlow backbone; per-epoch checkpoints + eval PSNR;
losses logged to <workspace>/log.jsonl (replacing TensorBoard scalars,
main.py:321-322).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=None,
                    help="static Gaussian capacity (default: round up max N)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (.msgpack or torch "
                         ".bin/.pth; shape-checked partial load)")
    args, extras = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from igs_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from igs_tpu.builders import (
        build_dataset, build_model, build_opt_config, build_raster_settings,
    )
    from igs_tpu.config import load_config, dump_config
    from igs_tpu.models.torch_convert import (
        convert_gmflow_checkpoint, load_torch_file,
    )
    from igs_tpu.ops.anchors import select_anchors
    from igs_tpu.parallel.mesh import make_mesh, shard_batch
    from igs_tpu.train.driver import (
        host_snapshot, make_optimizer, make_train_step, run_guarded_step,
        save_checkpoint,
    )

    cfg = load_config(args.config, cli_args=extras)
    opt = cfg.opt
    workspace = opt.get("workspace", "logs/igs_tpu/train")
    os.makedirs(workspace, exist_ok=True)
    dump_config(os.path.join(workspace, "experiment_config.yaml"), cfg)
    # source snapshot for reproducibility (saveRuntimeCode, main.py:36-59)
    from igs_tpu.utils.saving import save_runtime_code

    save_runtime_code(workspace)

    train_ds = build_dataset(cfg.data, training=True)
    model = build_model(cfg.system)
    ocfg = build_opt_config(opt)

    out_h = int(cfg.data["data"].get("output_height", 1014))
    out_w = int(cfg.data["data"].get("output_width", 1352))
    settings = build_raster_settings(out_h, out_w, clamp=True)

    anchor_size = int(opt.get("anchor_size", 8192))
    neighbor_k = int(opt.get("neighbor_k", 8))

    import math

    batch_size = int(opt.get("batch_size", 4))
    devices = jax.devices()
    # the data axis must divide the batch; use the largest such device count
    n_data = math.gcd(batch_size, len(devices))
    mesh = (
        make_mesh(data=n_data, tile=1, devices=devices[:n_data])
        if n_data > 1 else None
    )

    def prep_batch(items, cap=None):
        batch = train_ds.collate(items)
        caps = [g.num_capacity for g in batch["gs"]]
        cap = cap or args.capacity or (max(caps) + 8191) // 8192 * 8192
        gs = [g.pad_to(cap) for g in batch["gs"]]
        gaussians = jax.tree.map(lambda *x: jnp.stack(x), *gs)
        states = [
            select_anchors(
                g.xyz, jnp.asarray(b), valid=g.valid,
                anchor_size=anchor_size, k=neighbor_k)
            for g, b in zip(gs, batch["bounding_box"])
        ]
        anchor_state = jax.tree.map(lambda *x: jnp.stack(x), *states)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        return jbatch, anchor_state, gaussians

    # per-item prep cache for small datasets: PNG decode + PLY load +
    # anchor KNN per item cost ~2-3 s/host — on a many-epoch run over a
    # few dozen items that dwarfs the 0.6 s device step. The reference's
    # DataLoader workers amortize the same cost (main.py num_workers).
    _item_cache: dict = {}
    cache_items = len(train_ds) <= int(opt.get("prep_cache_max_items", 64))

    def prep_batch_cached(idxs, cap):
        if not cache_items:
            return prep_batch([train_ds[int(i)] for i in idxs], cap=cap)
        for i in idxs:
            i = int(i)
            if i not in _item_cache:
                # fixed cap across the cache so batches concatenate; an
                # item needing more raises in pad_to — set --capacity
                _item_cache[i] = prep_batch([train_ds[i]], cap=cap)
        parts = [_item_cache[int(i)] for i in idxs]
        cat = lambda xs: (
            None if xs[0] is None else jnp.concatenate(xs, axis=0))
        jbatch = {k: cat([p[0][k] for p in parts]) for k in parts[0][0]}
        state = jax.tree.map(lambda *x: cat(list(x)), *[p[1] for p in parts])
        gaussians = jax.tree.map(
            lambda *x: cat(list(x)), *[p[2] for p in parts])
        return jbatch, state, gaussians

    # init params (and optionally load the GMFlow backbone weights)
    first = prep_batch([train_ds[i] for i in range(batch_size)])
    train_cap = int(first[2].xyz.shape[1])  # fixed capacity for the cache
    params = jax.jit(
        lambda r: model.init(r, *first, settings)
    )(jax.random.PRNGKey(0))
    import flax

    def merge_shape_checked(params, conv_params, prefix=()):
        """Reference-style lenient partial load: copy matching-shape
        tensors, warn on mismatch/unknown (main.py:131-149)."""
        flat = flax.traverse_util.flatten_dict(params["params"])
        cflat = flax.traverse_util.flatten_dict(conv_params)
        loaded = skipped = 0
        for k, v in cflat.items():
            key = prefix + k
            if key in flat and flat[key].shape == v.shape:
                flat[key] = jnp.asarray(v)
                loaded += 1
            else:
                skipped += 1
                print(f"[WARN] skipping param {'.'.join(key)}: "
                      f"{getattr(v, 'shape', '?')}")
        return {"params": flax.traverse_util.unflatten_dict(flat)}, loaded

    gmflow_path = cfg.system.get("backbone", {}).get(
        "pretrained_model_name_or_path", "")
    if gmflow_path and os.path.exists(gmflow_path):
        conv = convert_gmflow_checkpoint(load_torch_file(gmflow_path))
        params, loaded = merge_shape_checked(
            params, conv["params"], prefix=("backbone",))
        print(f"loaded {loaded} GMFlow tensors from {gmflow_path}")

    # --resume / opt.resume: shape-checked partial weight load from either
    # a framework .msgpack or a reference torch checkpoint (main.py:131-149)
    start_epoch = int(opt.get("start_epoch", 0))
    resume_path = args.resume or opt.get("resume", "")
    if resume_path and os.path.exists(resume_path):
        if resume_path.endswith((".bin", ".pth", ".pt")):
            from igs_tpu.models.torch_convert import (
                convert_igs_checkpoint, fix_mlp_output_layer,
            )

            conv = convert_igs_checkpoint(load_torch_file(resume_path))
            cparams = fix_mlp_output_layer(conv["params"])
            # weights_ignore_modules (IGS.py:64-68 / misc.py:29-58):
            # drop listed top-level module subtrees before the overlay
            ignore = list(cfg.system.get("weights_ignore_modules", []) or [])
            if ignore:
                import flax as _flax

                cf = _flax.traverse_util.flatten_dict(cparams)
                cf = {k: v for k, v in cf.items()
                      if not any(".".join(k).startswith(m) for m in ignore)}
                cparams = _flax.traverse_util.unflatten_dict(cf)
                print(f"ignoring modules on resume: {ignore}")
            params, loaded = merge_shape_checked(params, cparams)
            print(f"resumed {loaded} tensors from torch ckpt {resume_path}")
        else:
            from igs_tpu.train.driver import load_checkpoint

            params, ckpt_step = load_checkpoint(resume_path, params)
            print(f"resumed params from {resume_path} (step {ckpt_step})")

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    total_steps = ocfg.num_epochs * steps_per_epoch
    grad_accum = int(opt.get("gradient_accumulation_steps", 1))
    tx, sched = make_optimizer(params, ocfg, total_steps,
                               grad_accum=grad_accum,
                               train_backbone=model.train_backbone)
    opt_state = tx.init(params)
    # optimizer-state restore (main.py:196-201 resume_opt)
    resume_opt = opt.get("resume_opt", "")
    if resume_path and os.path.exists(resume_path + ".opt"):
        resume_opt = resume_path + ".opt"
    if resume_opt and os.path.exists(resume_opt):
        from flax import serialization

        with open(resume_opt, "rb") as f:
            opt_state = serialization.from_bytes(opt_state, f.read())
        print(f"restored optimizer state from {resume_opt}")
    # kiui-LPIPS training term (main.py:216-219): converted VGG weights
    # from opt.lpips_weights (torch state_dict), frozen, closed over
    lpips_params = None
    if ocfg.lambda_lpips > 0:
        from igs_tpu.train.lpips import LPIPS, load_torch_lpips

        lp_model = LPIPS()
        dummy = jnp.zeros((1, 3, 64, 64))
        lpips_params = lp_model.init(jax.random.PRNGKey(0), dummy, dummy)
        lp_path = opt.get("lpips_weights", "")
        if lp_path and os.path.exists(lp_path):
            lpips_params, n_lp = load_torch_lpips(
                lpips_params, load_torch_file(lp_path))
            print(f"loaded {n_lp} LPIPS tensors from {lp_path}")
        else:
            print("[WARN] lambda_lpips > 0 but no opt.lpips_weights — "
                  "LPIPS uses a random VGG")
    step_fn = make_train_step(model, tx, ocfg, settings, mesh=mesh,
                              lpips_params=lpips_params)

    log_path = os.path.join(workspace, "log.jsonl")
    global_step = start_epoch * steps_per_epoch
    # shadow snapshot for crash-saves: the jitted step donates its
    # params/opt_state buffers, so a device-side failure invalidates the
    # live state — refresh a host copy every N steps as the fallback
    snapshot_every = int(opt.get("crash_snapshot_every", 100))
    shadow = None
    eval_apply = jax.jit(
        lambda p, b, st, g: model.apply(p, b, st, g, settings))
    rng = np.random.RandomState(0)
    for epoch in range(start_epoch, ocfg.num_epochs):
        order = rng.permutation(len(train_ds))
        for it in range(steps_per_epoch):
            idxs = order[it * batch_size: (it + 1) * batch_size]
            if len(idxs) < batch_size:
                break
            batch, anchor_state, gaussians = prep_batch_cached(
                idxs, train_cap)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
                anchor_state = shard_batch(mesh, anchor_state)
                gaussians = shard_batch(mesh, gaussians)
            t0 = time.time()
            if snapshot_every and global_step % snapshot_every == 0:
                shadow = host_snapshot(params, opt_state, global_step)
            # save-state-on-failure (main.py:278-287) inside the guard
            params, opt_state, metrics = run_guarded_step(
                step_fn, workspace, global_step,
                params, opt_state, batch, anchor_state, gaussians,
                shadow=shadow)
            global_step += 1
            if global_step % 10 == 0 or global_step == 1:
                rec = {
                    "step": global_step, "epoch": epoch,
                    "loss": float(metrics["loss"]),
                    "psnr": float(metrics["psnr"]),
                    "lr": float(sched(global_step)),
                    "sec/step": time.time() - t0,
                }
                print(rec)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if args.max_steps and global_step >= args.max_steps:
                break
        # opt.save_every (epochs) thins per-epoch checkpoints for
        # many-epoch runs; the final epoch always saves
        save_every = int(opt.get("save_every", 1))
        if (epoch % save_every) == 0 or epoch == ocfg.num_epochs - 1 or (
                args.max_steps and global_step >= args.max_steps):
            save_checkpoint(
                os.path.join(workspace, str(epoch), "params.msgpack"),
                params, opt_state, step=global_step)

        # per-epoch eval over the FULL test loader (main.py:378-432 walks
        # the whole test set with gather_for_metrics) + image dump.
        # opt.eval_every (epochs) thins it for many-epoch small-dataset
        # runs; the final epoch always evals.
        eval_every = int(opt.get("eval_every", 1))
        if (epoch % eval_every) and epoch != ocfg.num_epochs - 1:
            if args.max_steps and global_step >= args.max_steps:
                break
            continue
        try:
            # eval needs per-item gaussians even from the infer-style
            # dataset (load_gs_per_item; train-dataset classes ignore it)
            eval_data_cfg = dict(cfg.data)
            eval_data_cfg["data"] = dict(
                cfg.data["data"], load_gs_per_item=True)
            test_ds = build_dataset(eval_data_cfg, training=False)
            from igs_tpu.train.losses import psnr as psnr_fn
            from igs_tpu.utils.saving import save_image

            n_eval = len(test_ds)
            psnrs = []
            for i0 in range(0, n_eval, batch_size):
                n_real = min(i0 + batch_size, n_eval) - i0
                items = [test_ds[i] for i in range(i0, i0 + n_real)]
                while len(items) < batch_size:  # pad ragged tail batch
                    items.append(items[-1])
                ebatch, estate, egs = prep_batch(items)
                out = eval_apply(params, ebatch, estate, egs)
                pred = np.clip(np.asarray(out["images_pred"]), 0, 1)
                gt = np.asarray(ebatch["images_output"])
                mse = ((pred - gt) ** 2).mean(axis=(1, 2, 3, 4))
                psnrs.extend((-10 * np.log10(mse))[:n_real].tolist())
                if i0 == 0:
                    save_image(
                        os.path.join(workspace, str(epoch), "eval_pred.png"),
                        np.asarray(out["images_pred"][0, 0]))
                    save_image(
                        os.path.join(workspace, str(epoch), "eval_gt.png"),
                        np.asarray(ebatch["images_output"][0, 0]))
            if psnrs:
                rec = {"epoch": epoch, "eval_psnr": float(np.mean(psnrs))}
                print(rec)
                with open(log_path, "a") as f:
                    f.write(json.dumps({"step": global_step, **rec}) + "\n")
        except Exception as e:  # eval must not kill training
            print(f"eval skipped: {e}")

        if args.max_steps and global_step >= args.max_steps:
            break
    print("training done:", global_step, "steps")


if __name__ == "__main__":
    main()
