"""Per-Gaussian projection ("preprocess") — pure vectorized JAX.

Computes, for every Gaussian: view/NDC/pixel positions, 3D and EWA 2D
covariance, conic, screen radius and tile rectangle, SH color, and the
RaDe-GS extras (camera planes, ray plane, per-Gaussian camera-space normal,
ray distance t).

Reference parity (math transcribed, conventions converted from glm
column-major):
  * computeCov3D            cuda_rasterizer/forward.cu:270-304
  * computeCov2D (+planes)  cuda_rasterizer/forward.cu:77-264
  * preprocessCUDA          cuda_rasterizer/forward.cu:307-423
  * in_frustum / ndc2Pix / getRect   cuda_rasterizer/auxiliary.h:57-180

TPU-first notes: this stage is pure elementwise/small-matrix math over N
Gaussians — XLA fuses it into a handful of VPU loops; no Pallas needed.
Culled Gaussians are masked (``visible``), never compacted: static shapes.
The analytic eigen-structure of Σ = R S² Rᵀ replaces the reference's
iterative 3×3 eigensolver (auxiliary.h:218-401) — exact and branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from igs_tpu.core.quaternion import quat_to_rotmat
from igs_tpu.core.sh import eval_sh_color
from igs_tpu.utils.safe_math import safe_norm, safe_normalize

NEAR_PLANE = 0.2  # auxiliary.h:21
TILE_X = 16
TILE_Y = 16


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian raster inputs, all shape (N, ...)."""

    means2d: jnp.ndarray  # (N, 2) pixel coords
    conic: jnp.ndarray  # (N, 3) upper-tri inverse 2D cov
    opacity: jnp.ndarray  # (N,) opacity * mip coef
    color: jnp.ndarray  # (N, C)
    depth: jnp.ndarray  # (N,) view z (sort key)
    view_point: jnp.ndarray  # (N, 3) camera-space position
    t_center: jnp.ndarray  # (N,) ray distance ‖p_view‖
    camera_plane: jnp.ndarray  # (N, 6)
    ray_plane: jnp.ndarray  # (N, 2)
    normal: jnp.ndarray  # (N, 3) camera-space
    radius: jnp.ndarray  # (N,) int32 pixel radius
    rect_min: jnp.ndarray  # (N, 2) int32 tile rect (x, y)
    rect_max: jnp.ndarray  # (N, 2) int32
    tiles_touched: jnp.ndarray  # (N,) int32
    visible: jnp.ndarray  # (N,) bool


def compute_cov3d(scaling: jnp.ndarray, rotation: jnp.ndarray, modifier: float = 1.0):
    """Σ = R S² Rᵀ (world). scaling is ACTIVATED (exp'd); rotation normalized.

    Parity: computeCov3D (forward.cu:270-304) — glm's column-major
    construction makes its M = S·R_glm satisfy MᵀM = R S² Rᵀ with R the
    standard rotation matrix.
    """
    r = quat_to_rotmat(rotation, normalize=False)  # (N,3,3)
    s2 = jnp.square(modifier * scaling)  # (N,3)
    # explicit Σ_ij = Σ_k r_ik s²_k r_jk — pure VPU math; the batched-3×3
    # einsum form lowers to padded tiny dot_generals on TPU (slow).
    rs = r * s2[:, None, :]  # (N,3,3) r_ik·s²_k
    return _sym_outer(rs, r)


def _sym_outer(a, b):
    """(N,3,3)·(N,3,3)ᵀ contracted over last axis, componentwise."""
    out = [
        [jnp.sum(a[:, i, :] * b[:, j, :], axis=-1) for j in range(3)]
        for i in range(3)
    ]
    return jnp.stack([jnp.stack(row, -1) for row in out], -2)


def project(
    means3d: jnp.ndarray,
    scaling: jnp.ndarray,  # activated scales (N,3)
    rotation: jnp.ndarray,  # normalized quats (N,4)
    opacity: jnp.ndarray,  # activated opacities (N,) or (N,1)
    camera,
    shs: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    sh_degree: int = 3,
    kernel_size: float = 0.0,
    scale_modifier: float = 1.0,
    valid: jnp.ndarray | None = None,
    geometry: bool = True,
) -> ProjectedGaussians:
    n = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    opacity = opacity.reshape(n).astype(f32)
    w, h = camera.width, camera.height
    fx, fy = camera.focal_x, camera.focal_y
    tanfovx, tanfovy = camera.tanfovx, camera.tanfovy
    wvt = camera.world_view_transform  # transposed w2c (row-vector layout)
    fpt = camera.full_proj_transform

    # --- frustum / projection (preprocessCUDA, forward.cu:350-358) -------
    p_view = means3d @ wvt[:3, :3] + wvt[3, :3]
    p_hom = means3d @ fpt[:3, :] + fpt[3, :]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    in_front = p_view[:, 2] > NEAR_PLANE

    # --- cov3D ------------------------------------------------------------
    cov3d = compute_cov3d(scaling, rotation, scale_modifier)

    # --- cov2D: EWA with fov clamp (computeCov2D, forward.cu:85-124) ------
    tz = p_view[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) > 1e-8, tz, 1e-8)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx, ty = txtz * tz, tytz * tz  # clamped camera coords

    r_view = wvt[:3, :3].T  # w2c rotation, math convention
    # sandwich with a shared 3×3 in broadcast form (VPU, no dot_general)
    tmp = jnp.sum(r_view[None, :, :, None] * cov3d[:, None, :, :], axis=2)
    sigma_cam = jnp.sum(tmp[:, :, None, :] * r_view[None, None, :, :], axis=3)

    inv_tz = 1.0 / tz_safe
    inv_tz2 = inv_tz * inv_tz
    # J2 = [[fx/tz, 0, -fx*tx/tz²], [0, fy/tz, -fy*ty/tz²]]
    j00 = fx * inv_tz
    j02 = -fx * tx * inv_tz2
    j11 = fy * inv_tz
    j12 = -fy * ty * inv_tz2
    s = sigma_cam
    # cov2d = J2 Σcam J2ᵀ, expanded (row of J2 has 2 nonzeros)
    a_xx = (
        j00 * (j00 * s[:, 0, 0] + j02 * s[:, 2, 0])
        + j02 * (j00 * s[:, 0, 2] + j02 * s[:, 2, 2])
    )
    a_xy = (
        j11 * (j00 * s[:, 0, 1] + j02 * s[:, 2, 1])
        + j12 * (j00 * s[:, 0, 2] + j02 * s[:, 2, 2])
    )
    a_yy = (
        j11 * (j11 * s[:, 1, 1] + j12 * s[:, 2, 1])
        + j12 * (j11 * s[:, 1, 2] + j12 * s[:, 2, 2])
    )

    det0 = jnp.maximum(1e-6, a_xx * a_yy - a_xy * a_xy)
    det1 = jnp.maximum(
        1e-6, (a_xx + kernel_size) * (a_yy + kernel_size) - a_xy * a_xy
    )
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    raw_det0 = a_xx * a_yy - a_xy * a_xy
    raw_det1 = (a_xx + kernel_size) * (a_yy + kernel_size) - a_xy * a_xy
    coef = jnp.where((raw_det0 <= 1e-6) | (raw_det1 <= 1e-6), 0.0, coef)

    # --- RaDe-GS geometry extras (forward.cu:135-262) ---------------------
    # Skipped in color-only rendering (``geometry=False``): the 16-lane
    # color pack never reads camera/ray planes or normals, so this whole
    # chain — and its AD transpose in the refine backward — is dead there.
    if geometry:
        camera_plane, ray_plane, normal = _geometry_extras(
            rotation, scaling, scale_modifier, r_view, txtz, tytz,
            tx, ty, tz, inv_tz, inv_tz2, fx, fy)
    else:
        camera_plane = jnp.zeros((n, 6), f32)
        ray_plane = jnp.zeros((n, 2), f32)
        normal = jnp.zeros((n, 3), f32)

    # --- conic, radius, tile rect (forward.cu:384-422) ---------------------
    det = raw_det0
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([a_yy * det_inv, -a_xy * det_inv, a_xx * det_inv], -1)

    mid = 0.5 * (a_xx + a_yy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sqrt_l1 = jnp.sqrt(jnp.maximum(mid + disc, mid - disc))
    radius_f = jnp.ceil(3.0 * sqrt_l1)

    # Opacity-aware tile rect (EXACT culling): the blend kernels skip any
    # contribution with alpha < 1/255 (forward.cu:499 / _MIN_ALPHA in
    # pallas_blend), and alpha ≤ o_eff·exp(-d²/(2λ₁)) at pixel distance d,
    # so pixels beyond d* = √(2·ln(255·o_eff))·√λ₁ can never pass the skip
    # — in the forward OR the backward (backward.cu:635 re-applies it).
    # Binning rects shrink to min(3σ, d*); the reported radius / visible
    # flag keep the reference's 3σ semantics (they feed densify stats and
    # visibility masks, not the blend).
    o_eff = opacity * coef
    ln_t = jnp.log(255.0 * jnp.maximum(o_eff, 1e-12))
    aware_f = jnp.ceil(jnp.sqrt(2.0 * jnp.maximum(ln_t, 0.0)) * sqrt_l1)
    rect_radius = jnp.minimum(radius_f, aware_f)
    dead = o_eff < 1.0 / 255.0  # can never reach the alpha skip anywhere

    def ndc2pix(x, size):
        return ((x + 1.0) * size - 1.0) * 0.5

    px = ndc2pix(p_proj[:, 0], w)
    py = ndc2pix(p_proj[:, 1], h)
    means2d = jnp.stack([px, py], -1)

    grid_x = (w + TILE_X - 1) // TILE_X
    grid_y = (h + TILE_Y - 1) // TILE_Y

    # getRect (auxiliary.h:62-72): int truncation of possibly-negative
    # floats matches CUDA's (int) cast (toward zero) then clamp at 0.
    def tile_rect(rf):
        xmin = jnp.clip(((px - rf) / TILE_X).astype(jnp.int32), 0, grid_x)
        ymin = jnp.clip(((py - rf) / TILE_Y).astype(jnp.int32), 0, grid_y)
        xmax = jnp.clip(
            ((px + rf + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, grid_x
        )
        ymax = jnp.clip(
            ((py + rf + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, grid_y
        )
        return xmin, ymin, xmax, ymax

    # The 3σ rect uses the reference formula verbatim — including its
    # quantization quirk: ``(p + r + 15)/16`` as the exclusive max drops
    # the topmost pixel column whenever frac(p + r) < 1, so it can clip a
    # still-contributing boundary pixel. Reproducing that bit-for-bit is
    # parity; the AWARE rect must instead be strictly conservative (its
    # radius is tight, there is no ceil slack to hide in), so its max side
    # rounds outward (+TILE) and the result intersects with the 3σ rect —
    # never covering more than the reference, never less than the support.
    x0, y0, x1, y1 = tile_rect(radius_f)
    ax_max = jnp.clip(
        ((px + rect_radius + TILE_X) / TILE_X).astype(jnp.int32), 0, grid_x)
    ay_max = jnp.clip(
        ((py + rect_radius + TILE_Y) / TILE_Y).astype(jnp.int32), 0, grid_y)
    ax_min = jnp.clip(((px - rect_radius) / TILE_X).astype(jnp.int32), 0, grid_x)
    ay_min = jnp.clip(((py - rect_radius) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rxmin = jnp.maximum(x0, ax_min)
    rymin = jnp.maximum(y0, ay_min)
    rxmax = jnp.minimum(x1, ax_max)
    rymax = jnp.minimum(y1, ay_max)
    rxmax = jnp.where(dead, rxmin, jnp.maximum(rxmax, rxmin))
    rymax = jnp.where(dead, rymin, jnp.maximum(rymax, rymin))
    tiles = (rxmax - rxmin) * (rymax - rymin)

    # visibility uses the 3σ rect like the reference (forward.cu:408-412)
    tiles3 = (x1 - x0) * (y1 - y0)
    visible = in_front & det_ok & (tiles3 > 0)
    if valid is not None:
        visible = visible & valid

    # --- color -------------------------------------------------------------
    if colors_precomp is not None:
        color = colors_precomp.astype(f32)
    else:
        color, _ = eval_sh_color(
            shs.astype(f32), means3d, camera.camera_center, sh_degree
        )

    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    tiles = jnp.where(visible, tiles, 0)

    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        opacity=opacity * coef,
        color=color,
        depth=p_view[:, 2],
        view_point=p_view,
        t_center=safe_norm(p_view),
        camera_plane=camera_plane,
        ray_plane=ray_plane,
        normal=normal,
        radius=radius,
        rect_min=jnp.stack([rxmin, rymin], -1),
        rect_max=jnp.stack([rxmax, rymax], -1),
        tiles_touched=tiles,
        visible=visible,
    )


def _geometry_extras(rotation, scaling, scale_modifier, r_view, txtz, tytz,
                     tx, ty, tz, inv_tz, inv_tz2, fx, fy):
    """Camera/ray plane + normal chain (forward.cu:135-262), full mode only."""
    # Vrk⁻¹ analytically: Σ = R S² Rᵀ → Σ⁻¹ = R S⁻² Rᵀ; ill-conditioned
    # (λmin ≤ 1e-8) → rank-1 outer product of the min-scale axis.
    r_mat = quat_to_rotmat(rotation, normalize=False)  # columns = axes
    s2 = jnp.square(scale_modifier * scaling)
    well = jnp.min(s2, axis=1) > 1e-8
    inv_s2 = 1.0 / jnp.maximum(s2, 1e-30)
    vrk_inv_full = _sym_outer(r_mat * inv_s2[:, None, :], r_mat)
    min_idx = jnp.argmin(s2, axis=1)
    e_min = jnp.take_along_axis(r_mat, min_idx[:, None, None], axis=2)[..., 0]
    vrk_inv_rank1 = e_min[:, :, None] * e_min[:, None, :]
    vrk_inv = jnp.where(well[:, None, None], vrk_inv_full, vrk_inv_rank1)

    tmp2 = jnp.sum(r_view[None, :, :, None] * vrk_inv[:, None, :, :], axis=2)
    cov_cam_inv = jnp.sum(tmp2[:, :, None, :] * r_view[None, None, :, :], axis=3)
    uvh = jnp.stack([txtz, tytz, jnp.ones_like(txtz)], axis=-1)
    uvh_m = jnp.sum(cov_cam_inv * uvh[:, None, :], axis=-1)
    geom_ok = safe_norm(uvh_m) > 1e-30  # reference zeroes planes on NaN normalize
    uvh_mn = safe_normalize(uvh_m)

    u, v = txtz, tytz
    u2, v2, uv = u * u, v * v, u * v
    nl = u2 + v2 + 1.0
    length_t = safe_norm(jnp.stack([tx, ty, tz], -1))
    vbn = jnp.einsum("ni,ni->n", uvh_mn, uvh)
    denom = jnp.maximum(vbn, 1e-7)
    # plane = nJ_inv·(uvh_mn/vbn) (forward.cu:181-244). glm column-major:
    # nJ_inv's columns are (v²+1,-uv,0), (-uv,u²+1,0), (-u,-v,0), so the
    # product rows are
    #   plane0 = (v²+1)·w0 − uv·w1 − u·w2
    #   plane1 = −uv·w0 + (u²+1)·w1 − v·w2
    # Round-4 audit fix: a first transcription read the constructor
    # row-major and dropped the w2 (third-component) terms, warping the
    # depth/coord gradient across each splat (AUDIT.md §planes; the
    # thin-disc ray-intersection test below is the independent witness).
    q0 = uvh_mn[:, 0] / denom
    q1 = uvh_mn[:, 1] / denom
    q2 = uvh_mn[:, 2] / denom
    plane0 = (v2 + 1.0) * q0 - uv * q1 - u * q2
    plane1 = -uv * q0 + (u2 + 1.0) * q1 - v * q2

    cpx = jnp.stack(
        [(-(v2 + 1.0) * tz + plane0 * tx) / nl / fx, (uv * tz + plane1 * tx) / nl / fy],
        -1,
    )
    cpy = jnp.stack(
        [(uv * tz + plane0 * ty) / nl / fx, (-(u2 + 1.0) * tz + plane1 * ty) / nl / fy],
        -1,
    )
    cpz = jnp.stack(
        [(tx + plane0 * tz) / nl / fx, (ty + plane1 * tz) / nl / fy], -1
    )
    camera_plane = jnp.concatenate([cpx, cpy, cpz], axis=-1)  # (N,6)
    ray_plane = jnp.stack(
        [plane0 * length_t / nl / fx, plane1 * length_t / nl / fy], -1
    )

    factor_normal = length_t / nl
    rnv0 = -plane0 * factor_normal
    rnv1 = -plane1 * factor_normal
    # cam_normal = nJ·rnv (forward.cu:259-260). glm's mat3 constructor is
    # COLUMN-major (the reference's own commented printf test at
    # forward.cu:127-132 confirms: mat3{1,2,3,4,5,6,7,8,9}·(1,1,1) =
    # (12,15,18) = column sums), so nJ's columns are
    # (1/tz,0,-tx/tz²), (0,1/tz,-ty/tz²), (tx/l,ty/l,tz/l) and with
    # rnv = (rnv0, rnv1, -1):
    #   cn = rnv0·col0 + rnv1·col1 − col2
    # i.e. the TRANSPOSED-Jacobian (covector) transform of the ray-space
    # normal — round-4 audit fix: a first transcription read the
    # constructor row-major and computed nJᵀ·rnv (AUDIT.md §normal).
    inv_l = 1.0 / jnp.maximum(length_t, 1e-12)
    cn0 = rnv0 * inv_tz - tx * inv_l
    cn1 = rnv1 * inv_tz - ty * inv_l
    cn2 = -(rnv0 * tx + rnv1 * ty) * inv_tz2 - tz * inv_l
    cam_normal = jnp.stack([cn0, cn1, cn2], -1)
    normal = safe_normalize(cam_normal)

    zero3 = jnp.zeros_like(normal)
    camera_plane = jnp.where(geom_ok[:, None], camera_plane, 0.0)
    ray_plane = jnp.where(geom_ok[:, None], ray_plane, 0.0)
    normal = jnp.where(geom_ok[:, None], normal, zero3)
    return camera_plane, ray_plane, normal
