"""Frame-0 per-scene 3DGS optimization (RaDe-GS) + LightGaussian compression.

Reference parity (SURVEY.md §3.5, submodules/RaDe-GS):
  * training loop train.py:61-256 — rgb L1 + λ_dssim·(1−SSIM), optional
    depth-normal consistency (expected & median depth → normals, ratio 0.6)
    from regularization_from_iter; densify/prune every 100 iters with
    per-loader z-culling; 3D smoothing filter recompute; SH warmup /1000;
    opacity reset /3000.
  * per-param Adam with the 3DGS lr schedule (position lr exponential decay,
    arguments/__init__.py:82-101; get_expon_lr_func general_utils.py:30-63).
  * compute_3D_filter scene/gaussian_model.py:181-235 — min camera-space z
    over covering cameras → filter = dist/focal·√0.2.
  * LightGaussian: accumulate count_render importance over train views
    (prune.py:133-157), v_imp_score = (vol/vol_90pct)^v_pow · imp
    (prune.py:112-129), prune percentile, fine-tune (compress.py:66-100).

TPU-first: fixed-capacity Gaussians (like the streaming refine engine),
one jitted step; densification reuses the static scatter machinery of
igs_tpu.stream.refine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians, inverse_sigmoid
from igs_tpu.core.quaternion import quat_to_rotmat
from igs_tpu.ops.knn import knn
from igs_tpu.ops.rasterize import RasterSettings, count_gaussians, rasterize
from igs_tpu.stream.refine import (
    RefineConfig, RefineState, _scatter_rows, init_refine_state,
)
from igs_tpu.train.losses import l1_loss, ssim


class Frame0Config(NamedTuple):
    """RaDe-GS defaults (arguments/__init__.py:61-101)."""

    iterations: int = 6000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lambda_dssim: float = 0.2
    lambda_depth_normal: float = 0.05
    regularization_from_iter: int = 10_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densification_interval: int = 100
    densify_grad_threshold: float = 0.0002
    opacity_reset_interval: int = 3000
    min_opacity: float = 0.05
    percent_dense: float = 0.01
    kernel_size: float = 0.0
    sh_warmup_interval: int = 1000
    z_cull_min: Optional[float] = 4.5  # N3D loader z-cull (train.py:196-199)


def position_lr(step, cfg: Frame0Config, spatial_lr_scale: float):
    """get_expon_lr_func parity (general_utils.py:30-63)."""
    t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
    init = cfg.position_lr_init * spatial_lr_scale
    final = cfg.position_lr_final * spatial_lr_scale
    return jnp.exp(jnp.log(init) * (1 - t) + jnp.log(final) * t)


def create_from_points(
    points: np.ndarray, colors: np.ndarray, capacity: int
) -> Gaussians:
    """3DGS init from a sparse point cloud.

    Parity: create_from_pcd (scene/gaussian_model.py) — scale = log of the
    mean distance to the 3 nearest neighbors (simple-knn distCUDA2 here via
    the exact TPU KNN), opacity logit of 0.1, identity rotations, SH dc from
    colors.
    """
    from igs_tpu.core.sh import rgb_to_sh

    if points.shape[0] > capacity:
        # more init points than the static budget: keep a uniform subset
        # (the reference grows dynamically; a fixed-capacity build must
        # downsample instead of failing)
        sel = np.linspace(0, points.shape[0] - 1, capacity).astype(int)
        points = np.asarray(points)[sel]
        colors = np.asarray(colors)[sel]
    n = points.shape[0]
    pts = jnp.asarray(points, jnp.float32)
    d, _ = knn(pts, pts, 4)  # self + 3 neighbors
    dist2 = jnp.mean(jnp.square(d[:, 1:]), axis=1).clip(1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
    opacity = jnp.full((n, 1), inverse_sigmoid(0.1), jnp.float32)
    shs = jnp.zeros((n, 16, 3), jnp.float32)
    shs = shs.at[:, 0, :].set(rgb_to_sh(jnp.asarray(colors, jnp.float32)))
    g = Gaussians.create(pts, opacity, rot, scales, shs)
    return g.pad_to(capacity)


def compute_3d_filter(
    xyz: jnp.ndarray, valid: jnp.ndarray, cameras: Sequence[Camera]
) -> jnp.ndarray:
    """Per-Gaussian low-pass filter size (scene/gaussian_model.py:181-235)."""
    n = xyz.shape[0]
    distance = jnp.full(n, 1e5, jnp.float32)
    valid_pt = jnp.zeros(n, bool)
    focal_max = 0.0
    for cam in cameras:
        wvt = cam.world_view_transform
        pc = xyz @ wvt[:3, :3] + wvt[3, :3]
        z = jnp.maximum(pc[:, 2], 0.001)
        fx, fy = cam.focal_x, cam.focal_y
        x = pc[:, 0] / z * fx + cam.width / 2.0
        y = pc[:, 1] / z * fy + cam.height / 2.0
        in_screen = (
            (x >= -0.15 * cam.width) & (x <= 1.15 * cam.width)
            & (y >= -0.15 * cam.height) & (y <= 1.15 * cam.height)
        )
        ok = (pc[:, 2] > 0.2) & in_screen
        distance = jnp.where(ok, jnp.minimum(distance, z), distance)
        valid_pt = valid_pt | ok
        focal_max = jnp.maximum(focal_max, fx)
    far = jnp.max(jnp.where(valid_pt & valid, distance, -1e5))
    distance = jnp.where(valid_pt, distance, far)
    return (distance / focal_max * (0.2**0.5))[:, None]


def fused_render_args(g: Gaussians, filter_3d: jnp.ndarray):
    """RaDe-GS renders with the filter fused at call time
    (scene/gaussian_model.py get_scaling_with_3D_filter)."""
    from igs_tpu.core.gaussians import fuse_3d_filter

    scales, opacity = fuse_3d_filter(g.scaling, g.opacity, filter_3d)
    opacity = jnp.where(g.valid[:, None], opacity, 0.0)
    return scales, opacity


def depth_to_normal(depth: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Camera-space normal map from a (ray) depth map via cross products.

    Parity: depth_double_to_normal (RaDe-GS utils) — unproject each pixel
    with its ray direction, normals from central differences.
    """
    h, w = depth.shape
    fx, fy = camera.focal_x, camera.focal_y
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    dirx = (xs - w / 2.0) / fx
    diry = (ys - h / 2.0) / fy
    ln = jnp.sqrt(dirx**2 + diry**2 + 1.0)
    # rasterizer depth output is t/ln ⇒ z = depth; points = dir*z
    pts = jnp.stack([dirx * depth, diry * depth, depth], -1)
    dx = pts[:, 2:, :] - pts[:, :-2, :]
    dy = pts[2:, :, :] - pts[:-2, :, :]
    nrm = jnp.cross(dx[1:-1], dy[:, 1:-1])
    from igs_tpu.utils.safe_math import safe_normalize

    nrm = safe_normalize(nrm)
    return jnp.pad(nrm, ((1, 1), (1, 1), (0, 0)))


def frame0_step(
    state: RefineState,
    camera: Camera,
    gt_image: jnp.ndarray,
    bg: jnp.ndarray,
    filter_3d: jnp.ndarray,
    cfg: Frame0Config,
    settings: RasterSettings,
    step_pos_lr,
    reg_on: bool,
    spatial_lr_scale: float = 1.0,
):
    """One RaDe-GS optimization iteration (train.py:113-258)."""
    g = state.gaussians
    n = g.num_capacity
    m2o = jnp.zeros((n, 2), jnp.float32)
    params = {k: getattr(g, k) for k in
              ("xyz", "rotation", "shs", "opacity", "scaling")}

    def loss_fn(params, m2o):
        gg = g.replace(**params)
        scales, opacity = fused_render_args(gg, filter_3d)
        out = rasterize(
            means3d=gg.xyz, opacity=opacity, scaling=scales,
            rotation=gg.get_rotation, camera=camera, shs=gg.shs, bg=bg,
            means2d_offset=m2o, valid=gg.valid, settings=settings,
        )
        img = out["color"]
        s, _ = ssim(img, gt_image)
        loss = (1 - cfg.lambda_dssim) * l1_loss(img, gt_image) + \
            cfg.lambda_dssim * (1.0 - s)
        if reg_on:
            n_exp = depth_to_normal(out["depth"], camera)
            n_med = depth_to_normal(out["mdepth"], camera)
            rn = out["normal"].transpose(1, 2, 0)
            err_e = 1.0 - jnp.sum(rn * n_exp, -1)
            err_m = 1.0 - jnp.sum(rn * n_med, -1)
            depth_normal = 0.4 * jnp.mean(err_e) + 0.6 * jnp.mean(err_m)
            loss = loss + cfg.lambda_depth_normal * depth_normal
        return loss, out["radii"]

    (loss, radii), (grads, g_m2o) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, m2o)

    lrs = {
        "xyz": step_pos_lr,
        "rotation": cfg.rotation_lr,
        "shs": cfg.feature_lr,
        "opacity": cfg.opacity_lr,
        "scaling": cfg.scaling_lr,
    }
    gate = g.valid.astype(jnp.float32)
    step = state.step + 1
    t = step.astype(jnp.float32)
    new_params, new_m, new_v = {}, {}, {}
    for name, p in params.items():
        gr = grads[name] * gate.reshape((-1,) + (1,) * (p.ndim - 1))
        # SH warmup: zero grads of higher bands before their unlock step
        if name == "shs":
            deg_step = jnp.minimum(step // cfg.sh_warmup_interval, 3)
            band = jnp.asarray([0] + [1] * 3 + [2] * 5 + [3] * 7, jnp.int32)
            gr = jnp.where((band <= deg_step)[None, :, None], gr, 0.0)
        m = 0.9 * state.adam_m[name] + 0.1 * gr
        v = 0.999 * state.adam_v[name] + 0.001 * gr * gr
        mhat = m / (1 - 0.9**t)
        vhat = v / (1 - 0.999**t)
        new_params[name] = p - lrs[name] * mhat / (jnp.sqrt(vhat) + 1e-15)
        new_m[name] = m
        new_v[name] = v

    vis = (radii > 0) & g.valid
    max_radii = jnp.where(
        vis, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
        state.max_radii2d)
    gnorm = jnp.linalg.norm(g_m2o, axis=-1)
    return state.replace(
        gaussians=g.replace(**new_params),
        adam_m=new_m, adam_v=new_v, step=step,
        max_radii2d=max_radii,
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
    ), loss


def reset_opacity(state: RefineState) -> RefineState:
    """reset_opacity parity: opacity ← min(opacity, 0.01) (in σ space)."""
    g = state.gaussians
    new_op = jnp.minimum(g.opacity, inverse_sigmoid(0.01))
    m = dict(state.adam_m)
    v = dict(state.adam_v)
    m["opacity"] = jnp.zeros_like(m["opacity"])
    v["opacity"] = jnp.zeros_like(v["opacity"])
    return state.replace(
        gaussians=g.replace(opacity=new_op), adam_m=m, adam_v=v)


def frame0_densify_and_prune(
    state: RefineState,
    cfg: Frame0Config,
    extent,
    size_threshold: Optional[float],
) -> RefineState:
    """Standard 3DGS densify (clone small + split big) + prune.

    Unlike the streaming refine (percent_dense=0), frame-0 uses
    percent_dense=0.01 so BOTH clone and split fire; prune removes low
    opacity, oversized screen radii and huge world-space scales, and the
    N3D z-cull (train.py:196-199).
    """
    rcfg = RefineConfig(
        densify_grad_threshold=cfg.densify_grad_threshold,
        min_opacity=cfg.min_opacity,
        percent_dense=cfg.percent_dense,
    )
    from igs_tpu.stream.refine import densify_and_prune

    state = densify_and_prune(state, rcfg, jnp.float32(extent))
    g = state.gaussians
    keep = jnp.ones(g.num_capacity, bool)
    if size_threshold is not None:
        keep &= state.max_radii2d <= size_threshold
        keep &= jnp.max(g.get_scaling, axis=1) <= 0.1 * extent
    if cfg.z_cull_min is not None:
        keep &= g.xyz[:, 2] >= cfg.z_cull_min
    return state.replace(gaussians=g.replace(valid=g.valid & keep))


def lightgaussian_importance(
    g: Gaussians,
    filter_3d: jnp.ndarray,
    cameras: Sequence[Camera],
    settings: RasterSettings,
    v_pow: float = 0.1,
) -> jnp.ndarray:
    """v_imp_score over all train views (prune.py:112-157)."""
    scales, opacity = fused_render_args(g, filter_3d)
    imp = jnp.zeros(g.num_capacity, jnp.float32)
    for cam in cameras:
        _, score = count_gaussians(
            g.xyz, opacity, scales, g.get_rotation, cam,
            valid=g.valid, settings=settings)
        imp = imp + score
    volume = jnp.prod(scales, axis=1)
    sorted_v = jnp.sort(jnp.where(g.valid, volume, 0.0))
    n_valid = jnp.sum(g.valid)
    k90 = jnp.clip(
        g.num_capacity - n_valid + (0.9 * n_valid).astype(jnp.int32),
        0, g.num_capacity - 1)
    v90 = jnp.maximum(sorted_v[k90], 1e-12)
    return jnp.power(volume / v90, v_pow) * imp


def prune_by_importance(
    g: Gaussians, scores: jnp.ndarray, prune_percent: float
) -> Gaussians:
    """Drop the lowest prune_percent of valid Gaussians by score."""
    n_valid = jnp.sum(g.valid)
    k = (prune_percent * n_valid).astype(jnp.int32)
    masked = jnp.where(g.valid, scores, jnp.inf)
    order = jnp.argsort(masked)
    kill = jnp.zeros(g.num_capacity, bool).at[order].set(
        jnp.arange(g.num_capacity) < k)
    return g.replace(valid=g.valid & ~kill)
