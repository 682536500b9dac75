"""Builders: reference YAML config sections → framework objects.

Bridges the reference's class-string wiring (configs/train.yaml,
configs/demo.yaml) to this framework's modules so the original configs run
unmodified: system.* → AGMNet, data.* → datasets, opt.* → optimizer /
stream / refine configs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import igs_tpu
from igs_tpu.config import ExperimentConfig
from igs_tpu.models.agm import AGMNet
from igs_tpu.ops.rasterize import RasterSettings
from igs_tpu.stream.pipeline import StreamConfig
from igs_tpu.stream.refine import RefineConfig
from igs_tpu.train.driver import OptConfig


def build_model(system: Dict[str, Any], encoder_bf16: bool = False,
                bf16_default: bool = False) -> AGMNet:
    """system section (configs/train.yaml) → AGMNet.

    ``bf16_default``: default for the per-module bf16 compute flags
    (params stay f32). The INFERENCE entry point passes True on real
    TPUs (A/B'd PSNR-neutral at the production shape,
    tools_bench_agm_bf16.py: AGM forward 309 → 268 ms); training keeps
    the exact f32 path unless the config opts in (system.ft_bf16 etc.) —
    the speed A/B is inference-only evidence and must not silently
    change training numerics.
    """
    backbone = system.get("backbone", {})
    transformer = system.get("transformer", {})
    enc = system.get("triplane_encoder", {})
    enc_unet = enc.get("unet", {})
    renderer = system.get("renderer", {})
    return AGMNet(
        encoder_bf16=bool(system.get(
            "encoder_bf16", encoder_bf16 or bf16_default)),
        cnn_bf16=bool(system.get("cnn_bf16", bf16_default)),
        ft_bf16=bool(system.get("ft_bf16", bf16_default)),
        feature_channels=backbone.get("feature_channels", 128),
        backbone_layers=backbone.get("transformer", {}).get("num_layers", 6),
        motion_layers=transformer.get("num_layers", 1),
        up_sample=system.get("up_sample", True),
        use_condition3d=system.get("use_condition3d", True),
        local_ray=system.get("local_ray", True),
        fine_tune_backbone=system.get("fine_tune_backbone", True),
        train_backbone=bool(system.get("train_backbone", False)),
        encoder_heads=enc_unet.get("num_attention_heads", 8),
        encoder_head_dim=enc_unet.get("attention_head_dim", 64),
        encoder_layers=enc_unet.get("num_layers", 4),
        render_flow=bool(renderer.get("render_flow", False)),
        flow_height=int(renderer.get("flow_height", 1024)),
        flow_width=int(renderer.get("flow_width", 1352)),
    )


def build_dataset(data_cfg: Dict[str, Any], training: bool):
    cls = igs_tpu.find(data_cfg.get("data_cls", "igs.data.data.N3dDataset"))
    return cls(data_cfg["data"], training=training)


def build_raster_settings(
    height: int, width: int, clamp: bool = True,
    max_pairs: int = 0, max_per_tile: int = 4096,
    impl: str = "auto",
) -> RasterSettings:
    if impl == "auto":
        import jax

        # fused packed-pair Pallas kernels on TPU (no per-tile budget,
        # least HBM traffic — fwd+bwd 47.9 vs 58.8 ms at 512²/150k vs the
        # windowed path, PERF.md §round-2); XLA path elsewhere (CPU tests
        # can opt into interpret mode explicitly)
        impl = "pallas_packed" if jax.default_backend() == "tpu" else "tiles"
    if max_pairs <= 0:
        # default pair budget ~2 blended contributions per pixel,
        # power-of-two, clamped to [2^15, 2^21]. 2/px = 1<<19 at 512² is
        # the budget every production measurement runs at (roofline: the
        # 150k-gaussian N3DV-scale scene uses 82% of it); a FIXED 2^21
        # budget OOM'd small-image training and taxed every
        # budget-proportional stage ~2×. Denser scenes overflow LOUDLY
        # (overflow_events / rasterize warnings) — set opt-level
        # max_pairs or use ops.rasterize.calibrate_pair_budget then.
        import math

        max_pairs = 1 << min(
            21, max(15, math.ceil(math.log2(max(height * width * 2, 1)))))
    return RasterSettings(
        image_height=height, image_width=width, impl=impl,
        max_pairs=max_pairs, max_per_tile=max_per_tile,
        clamp_grads=clamp,
    )


def build_opt_config(opt: Dict[str, Any]) -> OptConfig:
    """opt section → OptConfig.

    The reference hardcodes AdamW(wd=0.05, betas=(0.9, 0.95)) and OneCycle
    warmup 3000 (main.py:185-194); YAML keys override when present.
    ``mixed_precision`` mirrors configs/train.yaml:32 (fp16 via accelerate)
    — on TPU the bf16 flavor applies to the network compute dtype, with
    the rasterizer pinned f32 like the reference's custom_fwd cast.
    """
    return OptConfig(
        lr=float(opt.get("lr", 4e-4)),
        weight_decay=float(opt.get("weight_decay", 0.05)),
        beta1=float(opt.get("beta1", 0.9)),
        beta2=float(opt.get("beta2", 0.95)),
        num_epochs=int(opt.get("num_epochs", 30)),
        warmup_steps=int(opt.get("warmup_steps", 3000)),
        gradient_clip=float(opt.get("gradient_clip", 1.0)),
        lambda_rgb=float(opt.get("lambda_rgb", 1.0)),
        lambda_ssim=float(opt.get("lambda_ssim", 0.2)),
        lambda_lpips=float(opt.get("lambda_lpips", 0.0)),
        mixed_precision=str(opt.get("mixed_precision", "no")),
    )


def build_stream_configs(
    opt: Dict[str, Any]
) -> Tuple[StreamConfig, RefineConfig]:
    lrs = opt.get("training_lr", {})
    item = opt.get("refine_item", {})
    stream = StreamConfig(
        eval_batch_size=int(opt.get("eval_batch_size", 5)),
        refine_gs=bool(opt.get("refine_gs", True)),
        refine_iterations=int(opt.get("refine_iterations", 50)),
        use_densify=bool(opt.get("use_densify", True)),
        max_num=int(opt.get("max_num", 150_000)),
        free_view=bool(opt.get("free_view", False)),
        workspace=str(opt.get("workspace", "logs/igs_tpu/stream")),
        data_parallel=int(opt.get("data_parallel", 1)),
        refine_parallel=int(opt.get("refine_parallel", 1)),
        shared_cur_cnn=bool(opt.get("shared_cur_cnn", True)),
        depth_view_res=int(opt.get("depth_view_res", 128)),
        exact_knn=bool(opt.get("exact_knn", False)),
        fps_buckets=int(opt.get("fps_buckets", 64)),
        shared_window_pairs=bool(opt.get("shared_window_pairs", True)),
        shared_pairs_drift_px=float(opt.get("shared_pairs_drift_px", 8.0)),
        shared_pairs_drift_frac=float(
            opt.get("shared_pairs_drift_frac", 0.01)),
    )
    refine = RefineConfig(
        position_lr=float(lrs.get("position_lr_init", 0.0016)),
        feature_lr=float(lrs.get("feature_lr", 0.0025)),
        opacity_lr=float(lrs.get("opacity_lr", 0.05)),
        scaling_lr=float(lrs.get("scaling_lr", 0.005)),
        rotation_lr=float(lrs.get("rotation_lr", 0.01)),
        lambda_l1=float(opt.get("lambda_l1", 0.8)),
        no_shs=bool(item.get("no_shs", False)),
        no_opacity=bool(item.get("no_opacity", False)),
        no_scaling=bool(item.get("no_scaling", False)),
        use_mask=bool(item.get("use_mask", False)),
        use_new_shs=bool(item.get("use_new_shs", False)),
        use_densify=bool(opt.get("use_densify", True)),
        densify_until_iter=int(opt.get("densify_until_iter", 100)),
        densify_from_iter=int(opt.get("densify_from_iter", 0)),
        densification_interval=int(opt.get("densification_interval", 20)),
        densify_grad_threshold=float(opt.get("densify_grad_threshold", 0.00015)),
        rebin_every=int(opt.get("rebin_every", 1)),
    )
    return stream, refine
