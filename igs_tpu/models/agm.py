"""AGM-Net — the anchor-driven Gaussian motion system module.

Reference parity: IGS (/root/reference/igs/IGS.py:22-257), active config
path (_forward_v3): frozen GMFlow backbone → 1-layer motion transformer →
2× upsample conv → ModLN 3D conditioning on (local rays, depth) → anchor
projection + Transformer1D (GridEncoder) → residual decode → deform →
rasterize output views.

TPU-first: one jitted graph per (B, V, N, A, resolution) signature; the
anchor precompute (FPS/KNN — IGS.py:223, gs.py:966-1011) is a separate
jitted function whose outputs (AnchorState) are STATIC inputs here, exactly
like the reference's streaming ``pre_compute_states`` caching
(IGS.py:212-217,176-178) — but also reused under jit during training.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.models.grid_encoder import GridEncoder
from igs_tpu.models.networks import ModLN
from igs_tpu.models.renderer import ResidualDecoder, deform_and_render, interpolate_residuals
from igs_tpu.models.swin import FeatureTransformerMy
from igs_tpu.models.unimatch import UniMatch
from igs_tpu.ops.anchors import AnchorState
from igs_tpu.ops.rasterize import RasterSettings


class AGMNet(nn.Module):
    """The full IGS system module."""

    feature_channels: int = 128
    backbone_layers: int = 6
    motion_layers: int = 1
    up_sample: bool = True
    use_condition3d: bool = True
    local_ray: bool = True
    fine_tune_backbone: bool = True  # = train the motion transformer
    # train the GMFlow backbone end-to-end instead of freezing it
    # (IGS.py:76 requires_grad_(False)). The reference freezes because it
    # loads PRETRAINED GMFlow weights; without them (no checkpoint
    # reachable) a frozen RANDOM backbone leaves the system almost
    # nothing to learn from — the 256² convergence runs plateau at the
    # identity baseline. Off by default (reference parity).
    train_backbone: bool = False
    encoder_heads: int = 8
    encoder_head_dim: int = 64
    encoder_layers: int = 4
    attn_splits: int = 2
    # bf16 compute for the anchor transformer (reference trains fp16;
    # params stay f32)
    encoder_bf16: bool = False
    # bf16 compute for the (HBM-bound) CNN encoder; IN stats stay f32
    cnn_bf16: bool = False
    # bf16 Dense matmuls in the frozen 6-layer feature transformer (the
    # f32 default runs them as 3-pass MXU splits; reference infers fp16)
    ft_bf16: bool = False
    # predicted-motion flow rendering (GS3DRenderer cfg, gs.py:526-528);
    # off in every shipped reference config (lambda_flow: 0)
    render_flow: bool = False
    flow_height: int = 1024
    flow_width: int = 1352

    def setup(self):
        self.backbone = UniMatch(
            feature_channels=self.feature_channels,
            num_transformer_layers=self.backbone_layers,
            attn_splits=self.attn_splits,
            cnn_dtype=jnp.bfloat16 if self.cnn_bf16 else None,
            ft_dtype=jnp.bfloat16 if self.ft_bf16 else None,
            name="backbone",
        )
        if self.fine_tune_backbone:
            self.transformer = FeatureTransformerMy(
                num_layers=self.motion_layers,
                d_model=self.feature_channels,
                name="transformer",
            )
        if self.up_sample:
            self.upsample = nn.Conv(
                self.feature_channels, (3, 3), padding=1, name="upsample"
            )
        if self.use_condition3d:
            # mod dim (4 local / 33 plucker, IGS.py:91-95) is implied by
            # the condition built in condition3d — ModLN is nn.compact
            self.modln = ModLN(self.feature_channels, name="ModLN")
        self.triplane_encoder = GridEncoder(
            in_channels=self.feature_channels,
            num_attention_heads=self.encoder_heads,
            attention_head_dim=self.encoder_head_dim,
            num_layers=self.encoder_layers,
            dtype=jnp.bfloat16 if self.encoder_bf16 else None,
            name="triplane_encoder",
        )
        self.decoder = ResidualDecoder(
            in_channels=self.feature_channels,
            n_neurons=self.feature_channels,
            name="render",
        )

    def motion_features(self, cur_images, next_images, cur_tile: int = 1):
        """(B·V, 3, H, W) ×2 → motion feature (B·V, C, h, w).

        Parity: IGS.py:123-134 (backbone frozen via stop_gradient, motion
        transformer, optional 2× upsample + 3×3 conv). ``cur_tile``: see
        UniMatch.__call__ — shared-cur CNN dedup for streaming windows.
        """
        f0, f1 = self.backbone(cur_images, next_images, img0_tile=cur_tile)
        if not self.train_backbone:
            f0 = jax.lax.stop_gradient(f0)
            f1 = jax.lax.stop_gradient(f1)
        if self.fine_tune_backbone:
            motion = self.transformer(f0, f1, attn_num_splits=self.attn_splits)
        else:
            motion = f0
        if self.up_sample:
            b, c, h, w = motion.shape
            motion = jax.image.resize(
                motion, (b, c, 2 * h, 2 * w), method="bilinear"
            )
            motion = self.upsample(motion.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return motion

    def condition3d(self, motion_feature, rays, depth):
        """ModLN(motion | rays+depth). Parity: IGS.py:185-210.

        motion_feature (B·V, C, h, w); depth (B, V, H, W) full-res →
        bilinear to (h, w). ``rays``: with ``local_ray=True`` the shared
        camera-local dirs (B, h, w, 3) repeated across views; with
        ``local_ray=False`` (the shipped train.yaml:74 path) per-view
        WORLD rays (B, V, h, w, 6) → Plücker (IGS.py:286-295) → degree-3
        real-SH features of direction and moment (IGS.py:195-199),
        a 32-channel ray code + depth = the 33-dim ModLN condition.
        """
        bv, c, h, w = motion_feature.shape
        b, v = depth.shape[:2]
        if self.local_ray:
            ray = jnp.repeat(rays, v, axis=0)  # (B·V, h, w, 3)
        else:
            from igs_tpu.core.camera import ray_to_plucker
            from igs_tpu.core.sh import rsh_cart_3

            plucker = ray_to_plucker(rays)  # (B, V, h, w, 6)
            ray = jnp.concatenate(
                [rsh_cart_3(plucker[..., :3]),
                 rsh_cart_3(plucker[..., 3:6])], axis=-1)
            ray = ray.reshape(bv, h, w, 32)
        # antialias=False: torch F.interpolate(bilinear, align_corners=False)
        # semantics (IGS.py:201) — jax's default antialiasing diverges on
        # downsample (caught by test_upsample_resize_parity).
        d = jax.image.resize(
            depth.reshape(bv, *depth.shape[2:]), (bv, h, w),
            method="bilinear", antialias=False,
        )
        # condition follows the network compute dtype (depth arrives f32;
        # an f32 leaf would re-promote everything downstream under bf16)
        cond = jnp.concatenate([ray, d[..., None]], axis=-1).astype(
            motion_feature.dtype)
        x = motion_feature.transpose(0, 2, 3, 1)  # B H W C
        x = self.modln(x, cond)
        return x.transpose(0, 3, 1, 2)

    def __call__(
        self,
        batch: Dict[str, Any],
        anchor_state: AnchorState,  # batched (B leading axis)
        gaussians: Gaussians,  # batched (B leading axis)
        settings: RasterSettings,
        depth_settings: Optional[RasterSettings] = None,
        shared_cur: bool = False,
        shared_window_pairs: bool = False,
        shared_pairs_drift_px: float = 8.0,
    ) -> Dict[str, Any]:
        """Run AGM-Net on a batch. Parity: _forward_v3 (IGS.py:114-181).

        batch keys (shapes as the reference dataset, SURVEY §2.2):
          cur_images_input/next_images_input (B, V, 3, H, W) in [0,1],
          depth (B, V, H, W), local_rays (B, h, w, 3), FOV (B, 2),
          c2w_input (B, V, 4, 4), c2w_output (B, Vout, 4, 4),
          background_color (B, 3), resolution static via ``settings``.
        """
        b, v, c, hh, ww = batch["cur_images_input"].shape
        nxt = batch["next_images_input"].reshape(-1, c, hh, ww)

        if shared_cur and b > 1:
            # streaming window: every candidate shares the key frame as
            # cur — run its CNN once (UniMatch.img0_tile)
            cur = batch["cur_images_input"][0]
            motion = self.motion_features(cur, nxt, cur_tile=b)
        else:
            cur = batch["cur_images_input"].reshape(-1, c, hh, ww)
            motion = self.motion_features(cur, nxt)
        if self.use_condition3d:
            # IGS.py:167 — world rays feed the Plücker path, local dirs
            # the local_ray path
            ray_key = "local_rays" if self.local_ray else "rays"
            motion = self.condition3d(motion, batch[ray_key], batch["depth"])

        triplane = self.triplane_encoder(
            motion, anchor_state.anchor_points, batch["FOV"], batch["c2w_input"]
        )  # (B, A, C)

        # per-gaussian features then residual decode (interpolate_first=True)
        feats = jax.vmap(interpolate_residuals)(triplane, anchor_state)
        residuals = self.decoder(feats)  # dict of (B, N, ·)
        # rasterization is pinned f32 regardless of network compute dtype
        # (reference: custom_fwd(cast_inputs=float32), igs/utils/ops.py:49-59)
        residuals = jax.tree.map(
            lambda x: x.astype(jnp.float32), residuals)

        fovx = batch["FOV"][:, 0]
        fovy = batch["FOV"][:, 1]
        bgs = batch.get("background_color", jnp.zeros((b, 3), jnp.float32))

        flow_settings = None
        if self.render_flow:
            # flow renders via the clamp rasterizer at flow resolution
            # (gs.py:659-713; forward_single_batch keeps the pre-deform
            # gaussians when cfg.render_flow, gs.py:846)
            flow_settings = settings._replace(
                image_height=self.flow_height, image_width=self.flow_width,
                outputs="color", clamp_grads=True)

        if depth_settings is None:
            def render_scene(gs, res, mask, c2ws, fx, fy, bg):
                cams = jax.vmap(
                    lambda c2w: Camera.from_c2w(
                        c2w, (fx, fy),
                        (settings.image_height, settings.image_width),
                    )
                )(c2ws)
                flow_cams = None
                if flow_settings is not None:
                    flow_cams = jax.vmap(
                        lambda c2w: Camera.from_c2w(
                            c2w, (fx, fy),
                            (self.flow_height, self.flow_width),
                        )
                    )(c2ws)
                return deform_and_render(gs, res, mask, cams, bg, settings,
                                         flow_settings=flow_settings,
                                         flow_cameras=flow_cams)

            out = jax.vmap(render_scene)(
                gaussians, residuals, anchor_state.mask,
                batch["c2w_output"], fovx, fovy, bgs,
            )
        else:
            # streaming split: view 0 (eval) at full resolution, the rest
            # (depth-carry views) at depth_settings' resolution — they only
            # feed the /8-res ModLN conditioning (IGS.py:201), so low-res
            # rendering is lossless for the pipeline and ~V× cheaper.
            def deform_one(gs, res, mask):
                return gs.deform(
                    res_xyz=res["xyz"],
                    res_rotation=res.get("rotation"),
                    mask=mask,
                )

            gdefs = jax.vmap(deform_one)(
                gaussians, residuals, anchor_state.mask)

            shared_pairs = None
            if (shared_window_pairs and b > 1
                    and settings.impl == "pallas_packed"):
                # the window's candidates share the eval camera and
                # differ only by intra-window motion; candidate 0's tile
                # pair list serves all 5 eval renders (per-candidate
                # FEATURES stay fresh — only tile assignment/depth order
                # carry the within-window drift). Quality-gated on the
                # synthetic stream (PERF.md r4).
                from igs_tpu.ops.rasterize import build_pairs_packed

                g0 = jax.tree.map(
                    lambda x: x[0] if x is not None else None, gdefs)
                cam0 = Camera.from_c2w(
                    batch["c2w_output"][0, 0], (fovx[0], fovy[0]),
                    (settings.image_height, settings.image_width))
                shared_pairs = build_pairs_packed(
                    g0.get_xyz, g0.get_opacity, g0.get_scaling,
                    g0.get_rotation, cam0, valid=g0.valid,
                    settings=settings)

                # runtime staleness signal (round-4 verdict weak-3): the
                # pair list goes stale as candidates drift from candidate
                # 0. Report, per candidate, the fraction of valid
                # gaussians whose eval-view pixel position moved more
                # than ``shared_pairs_drift_px`` (default half a 16-px
                # tile — the scale at which tile assignment changes).
                # The pipeline trips on this and rebuilds exact pairs.
                fpt = cam0.full_proj_transform

                def pix_xy(xyz):
                    ph = xyz @ fpt[:3, :] + fpt[3, :]
                    p = ph[:, :2] / (ph[:, 3:4] + 1e-7)
                    return jnp.stack(
                        [((p[:, 0] + 1) * settings.image_width - 1) * 0.5,
                         ((p[:, 1] + 1) * settings.image_height - 1) * 0.5],
                        -1)

                xy = jax.vmap(lambda g: pix_xy(g.get_xyz))(gdefs)
                drift = jnp.linalg.norm(xy - xy[:1], axis=-1)  # (B, N)
                vmask = gdefs.valid
                if vmask is None:
                    vmask = jnp.ones(drift.shape, bool)
                moved = (drift > shared_pairs_drift_px) & vmask
                pair_drift_frac = (
                    moved.sum(-1) / jnp.maximum(1, vmask.sum(-1)))

            if shared_pairs is not None:
                # the vmapped pallas kernel needs ALL operands batched
                # (mixed batched/unbatched HBM refs fail Mosaic's ANY-
                # space lowering) — broadcast the single pair list; the
                # win is building it once, not storing it once
                shared_pairs = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (b,) + x.shape),
                    shared_pairs)

            def render_split(gdef, pv, c2ws, fx, fy, bg):
                from igs_tpu.models.renderer import render_views

                cam0 = Camera.from_c2w(
                    c2ws[0], (fx, fy),
                    (settings.image_height, settings.image_width))
                cams0 = jax.tree.map(lambda x: jnp.asarray(x)[None], cam0)
                out0 = render_views(gdef, cams0, bg, settings,
                                    pairs_override=pv)
                camsd = jax.vmap(
                    lambda c2w: Camera.from_c2w(
                        c2w, (fx, fy),
                        (depth_settings.image_height,
                         depth_settings.image_width),
                    )
                )(c2ws[1:])
                # small depth-carry views: one batched launch over the 4
                # views (vmap) instead of 4 sequential 128² renders
                outd = render_views(gdef, camsd, bg, depth_settings,
                                    parallel=True)
                return {
                    "images_pred": out0["images_pred"],
                    "depth_pred_eval": out0["depth_pred"],
                    "depth_pred": outd["depth_pred"],
                    "3dgs": gdef,
                    "overflow_tiles": jnp.maximum(
                        jnp.max(out0["overflow_tiles"]),
                        jnp.max(outd["overflow_tiles"])),
                }

            out = jax.vmap(
                render_split,
                in_axes=(0, None if shared_pairs is None else 0,
                         0, 0, 0, 0),
            )(gdefs, shared_pairs, batch["c2w_output"], fovx, fovy, bgs)
            if shared_pairs is not None:
                out["pair_drift_frac"] = pair_drift_frac
        out["motion_feature"] = triplane
        return out
