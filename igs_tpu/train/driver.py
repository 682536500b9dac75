"""AGM-Net training driver: AdamW + OneCycle, data-parallel over a mesh.

Reference parity: main.py (SURVEY.md §3.4):
  * AdamW(lr 4e-4, wd 0.05, betas (0.9, 0.95)) over trainable params only
    (backbone frozen), OneCycleLR with 3000-step warmup (main.py:176-194).
  * loss = λ_rgb·L1 + λ_ssim·(1−SSIM) [+ λ_lpips·LPIPS] (main.py:252-275).
  * grad-clip global norm 1.0 (main.py:293-298).
  * DP gradient all-reduce — here implicit: the batch is sharded over the
    mesh ``data`` axis and params are replicated, so XLA emits the psum
    over ICI during backward (replacing accelerate/DDP/NCCL).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from igs_tpu.models.agm import AGMNet
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.train.losses import l1_loss, psnr as psnr_fn, ssim

# main.py:270 downsamples LPIPS inputs to 256² ("downsampled to at most
# 256 to reduce memory cost"); module-level so tests can shrink it
LPIPS_RES = 256


@dataclass
class OptConfig:
    """Parity: main.py OptConfig defaults (main.py:62-116)."""

    lr: float = 4e-4
    weight_decay: float = 0.05
    beta1: float = 0.9
    beta2: float = 0.95
    num_epochs: int = 30
    warmup_steps: int = 3000
    gradient_clip: float = 1.0
    lambda_rgb: float = 1.0
    lambda_ssim: float = 0.2
    lambda_lpips: float = 0.0
    # "no" | "fp16" | "bf16": network activations in half precision with
    # the rasterizer pinned f32 (reference: configs/train.yaml:32 +
    # custom_fwd(cast_inputs=float32), igs/utils/ops.py:49-59). On TPU
    # fp16 is mapped to bf16 (the MXU's native half type).
    mixed_precision: str = "no"


def onecycle_schedule(max_lr: float, total_steps: int, warmup_steps: int = 3000):
    """torch OneCycleLR parity: cosine anneal up then down.

    pct_start = warmup/total (main.py:192); initial lr = max_lr/25,
    final lr = max_lr/1e4 (torch defaults div_factor=25,
    final_div_factor=1e4).
    """
    warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
    up = optax.cosine_onecycle_schedule  # matches torch's cos annealing
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=warmup_steps / total_steps,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def trainable_mask(params) -> Any:
    """Freeze the GMFlow backbone (IGS.py:75-77, state_dict strips it)."""
    def mask_fn(path, _):
        return "backbone" not in jax.tree_util.keystr(path)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(params, cfg: OptConfig, total_steps: int,
                   grad_accum: int = 1, train_backbone: bool = False):
    sched = onecycle_schedule(cfg.lr, total_steps, cfg.warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.beta1,
            b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
        ),
    )
    if not train_backbone:
        # reference parity: the GMFlow backbone is frozen (IGS.py:75-77);
        # with system.train_backbone the whole net optimizes end-to-end
        # (the no-pretrained-weights regime — see AGMNet.train_backbone)
        tx = optax.masked(tx, trainable_mask(params))
    if grad_accum > 1:
        # accelerator.accumulate parity (main.py:231)
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx, sched


def compute_loss(out: Dict, gt_images: jnp.ndarray, cfg: OptConfig,
                 lpips_fn=None):
    """main.py:252-275."""
    pred = out["images_pred"]  # (B, V, 3, H, W)
    loss = 0.0
    metrics = {}
    if cfg.lambda_rgb > 0:
        # parity quirk: the reference logs the L1 under the key "loss_mse"
        # (main.py:256) — kept verbatim so log schemas line up; do NOT
        # "fix" this into an actual MSE.
        lm = l1_loss(pred, gt_images)
        metrics["loss_mse"] = lm
        loss = loss + cfg.lambda_rgb * lm
    if cfg.lambda_ssim > 0:
        b, v = pred.shape[:2]
        s, _ = ssim(pred.reshape(b * v, *pred.shape[2:]),
                    gt_images.reshape(b * v, *gt_images.shape[2:]))
        metrics["loss_ssim"] = 1.0 - s
        loss = loss + cfg.lambda_ssim * (1.0 - s)
    if cfg.lambda_lpips > 0 and lpips_fn is not None:
        # main.py:267-275: both images ×2−1, bilinear-downsampled to 256²
        # (align_corners=False ≡ jax.image.resize half-pixel centers),
        # VGG-LPIPS, mean over (B·V).
        b, v = pred.shape[:2]
        def prep(img):
            flat = img.reshape(b * v, *img.shape[2:]) * 2.0 - 1.0
            return jax.image.resize(
                flat, (b * v, flat.shape[1], LPIPS_RES, LPIPS_RES),
                method="bilinear")
        ll = jnp.mean(lpips_fn(prep(gt_images), prep(pred)))
        metrics["loss_lpips"] = ll
        loss = loss + cfg.lambda_lpips * ll
    metrics["psnr"] = psnr_fn(jax.lax.stop_gradient(pred), gt_images)
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    model: AGMNet,
    tx,
    cfg: OptConfig,
    settings: RasterSettings,
    mesh=None,
    lpips_params=None,
):
    """Build the jitted DP train step.

    With a mesh, the batch/anchors/gaussians carry a leading ``data``-sharded
    axis and params are replicated; XLA inserts the gradient all-reduce.

    ``lpips_params``: frozen flax LPIPS params (train/lpips.py), required
    when cfg.lambda_lpips > 0. They are closed over (never trained,
    main.py:216-219 requires_grad_(False)) and initialized randomly with a
    warning if omitted — metric-grade LPIPS needs converted VGG weights.
    """

    half = (
        jnp.bfloat16 if cfg.mixed_precision in ("fp16", "bf16") else None
    )

    lpips_fn = None
    if cfg.lambda_lpips > 0:
        from igs_tpu.train.lpips import LPIPS

        lpips_model = LPIPS()
        if lpips_params is None:
            import warnings

            warnings.warn(
                "lambda_lpips > 0 without lpips_params: using randomly "
                "initialized VGG — pass converted weights for a real LPIPS")
            dummy = jnp.zeros((1, 3, 64, 64))
            lpips_params = lpips_model.init(
                jax.random.PRNGKey(0), dummy, dummy)
        frozen_lp = jax.tree.map(jax.lax.stop_gradient, lpips_params)
        lpips_fn = lambda x, y: lpips_model.apply(frozen_lp, x, y)

    def step(params, opt_state, batch, anchor_state, gaussians):
        def loss_fn(p):
            b = batch
            if half is not None:
                # bf16 network compute: params + image inputs cast for the
                # forward (master params stay f32 in the optimizer); the
                # render path casts back to f32 inside AGMNet. jax.grad
                # through the cast accumulates gradients in f32.
                p = jax.tree.map(
                    lambda x: x.astype(half)
                    if x.dtype == jnp.float32 else x, p)
                b = dict(batch)
                for k in ("cur_images_input", "next_images_input"):
                    b[k] = batch[k].astype(half)
            out = model.apply(p, b, anchor_state, gaussians, settings)
            return compute_loss(out, batch["images_output"], cfg,
                                lpips_fn=lpips_fn)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    repl = NamedSharding(mesh, P())
    # params/opt_state replicated; batch/anchors/gaussians keep whatever
    # (data[, tile]) placement the caller chose — XLA inserts the psum.
    return jax.jit(
        step,
        in_shardings=(repl, repl, None, None, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def run_guarded_step(step_fn, workspace: str, global_step: int,
                     params, opt_state, *step_args, shadow=None):
    """Run one train step; on failure save state to <workspace>/crash/.

    Parity: the reference wraps ``accelerator.backward`` and saves full
    trainer state to ``<workspace>/error`` before re-raising
    (main.py:278-287). ``--resume <workspace>/crash/params.msgpack``
    restores it.

    ``shadow``: optional host-side (params, opt_state, step) snapshot.
    The step jits with donate_argnums, so a DEVICE-side failure (OOM,
    NaN assert) surfaces only after the live input buffers were donated
    — the live save then fails and the shadow (refreshed periodically by
    the driver) is saved instead. Without a shadow only pre-dispatch
    (trace-time) failures can be saved.
    """
    import os

    try:
        params, opt_state, metrics = step_fn(params, opt_state, *step_args)
        jax.block_until_ready(metrics["loss"])
        return params, opt_state, metrics
    except Exception:
        crash_dir = os.path.join(workspace, "crash")
        print(f"train step failed at step {global_step}; "
              f"saving state to {crash_dir}")
        try:
            save_checkpoint(
                os.path.join(crash_dir, "params.msgpack"),
                params, opt_state, step=global_step)
        except Exception as se:  # donated buffers are gone
            print(f"live crash-save failed ({se})")
            if shadow is not None:
                s_params, s_opt, s_step = shadow
                save_checkpoint(
                    os.path.join(crash_dir, "params.msgpack"),
                    s_params, s_opt, step=s_step)
                print(f"saved shadow snapshot from step {s_step}")
        raise


def host_snapshot(params, opt_state, step: int):
    """Host-side copy of the trainer state (shadow for run_guarded_step —
    survives donated-buffer invalidation on device-side step failures)."""
    return (jax.device_get(params), jax.device_get(opt_state), step)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0):
    """Orbax-free checkpointing: a single msgpack via flax serialization."""
    import os

    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes({"params": params, "step": step}))
    if opt_state is not None:
        with open(path + ".opt", "wb") as f:
            f.write(serialization.to_bytes(opt_state))


def load_checkpoint(path: str, params_template):
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.from_bytes(
            {"params": params_template, "step": 0}, f.read()
        )
    return blob["params"], blob["step"]
