"""Naive O(N·P) reference renderer — the parity/gradcheck oracle.

Implements the exact blending semantics of renderCUDA
(cuda_rasterizer/forward.cu:428-693) per pixel over ALL Gaussians, with the
tile-coverage constraint applied as a mask (a Gaussian only contributes to
pixels whose tile lies inside its screen rect, exactly like the CUDA
binning). Fully differentiable by JAX AD; used to validate the production
tiled/Pallas path and its custom VJPs on small scenes.
"""

from __future__ import annotations

import jax.numpy as jnp

from igs_tpu.ops.projection import ProjectedGaussians, TILE_X, TILE_Y
from igs_tpu.ops.render_tiles import RenderOutputs, _LOG_TERM, _MIN_ALPHA


def render_reference(
    proj: ProjectedGaussians,
    height: int,
    width: int,
    focal_x,
    focal_y,
    bg: jnp.ndarray,
) -> RenderOutputs:
    n = proj.depth.shape[0]

    # depth-sorted order over visible gaussians (ties → original index)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    xy = proj.means2d[order]  # (N, 2)
    conic = proj.conic[order]
    opac = proj.opacity[order]
    color = proj.color[order]
    vp = proj.view_point[order]
    tc = proj.t_center[order]
    cp = proj.camera_plane[order]
    rp = proj.ray_plane[order]
    nrm = proj.normal[order]
    rmin = proj.rect_min[order]
    rmax = proj.rect_max[order]
    vis = proj.visible[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pixf = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (P, 2)
    ptile_x = (pixf[:, 0] // TILE_X).astype(jnp.int32)
    ptile_y = (pixf[:, 1] // TILE_Y).astype(jnp.int32)

    dx = xy[:, 0:1] - pixf[None, :, 0]  # (N, P)
    dy = xy[:, 1:2] - pixf[None, :, 1]
    power = -0.5 * (
        conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy
    ) - conic[:, 1:2] * dx * dy
    alpha = jnp.minimum(
        0.99, opac[:, None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    covers = (
        (ptile_x[None, :] >= rmin[:, 0:1])
        & (ptile_x[None, :] < rmax[:, 0:1])
        & (ptile_y[None, :] >= rmin[:, 1:2])
        & (ptile_y[None, :] < rmax[:, 1:2])
    )
    cand = vis[:, None] & covers & (power <= 0.0) & (alpha >= _MIN_ALPHA)
    a = jnp.where(cand, alpha, 0.0)
    log1m = jnp.log1p(-a)
    cum_incl = jnp.cumsum(log1m, axis=0)
    cum_excl = cum_incl - log1m
    accept = cand & (cum_incl >= _LOG_TERM)
    t_before = jnp.exp(cum_excl)
    w = jnp.where(accept, a * t_before, 0.0)  # (N, P)

    weight = jnp.sum(w, axis=0)
    out_color = jnp.einsum("np,nc->pc", w, color)
    coord = (
        jnp.einsum("np,nc->pc", w, vp)
        + jnp.einsum("np,nc->pc", w * dx, cp[:, 0::2])
        + jnp.einsum("np,nc->pc", w * dy, cp[:, 1::2])
    )
    t_px = tc[:, None] + rp[:, 0:1] * dx + rp[:, 1:2] * dy
    depth = jnp.sum(w * t_px, axis=0)
    normal = jnp.einsum("np,nc->pc", w, nrm)

    logt_final = jnp.sum(jnp.where(accept, log1m, 0.0), axis=0)
    t_final = jnp.exp(logt_final)
    out_color = out_color + t_final[:, None] * bg[None, :]

    # median: last accepted with T_before > 0.5
    med = accept & (t_before > 0.5)
    gidx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None]
    sel1 = jnp.max(jnp.where(med, gidx, 0), axis=0)
    has = sel1 > 0
    gsel = jnp.maximum(sel1 - 1, 0)
    parange = jnp.arange(pixf.shape[0])
    dxs = dx[gsel, parange]
    dys = dy[gsel, parange]
    mdepth = jnp.where(has, tc[gsel] + rp[gsel, 0] * dxs + rp[gsel, 1] * dys, 0.0)
    mcoord = jnp.where(
        has[:, None],
        vp[gsel] + cp[gsel, 0::2] * dxs[:, None] + cp[gsel, 1::2] * dys[:, None],
        0.0,
    )

    lastg = jnp.max(jnp.where(accept, gidx, 0), axis=0)
    any_acc = lastg > 0

    lnf = jnp.sqrt(
        ((pixf[:, 0] - width / 2.0) / focal_x) ** 2
        + ((pixf[:, 1] - height / 2.0) / focal_y) ** 2
        + 1.0
    )
    wsafe = jnp.where(weight > 0, weight, 1.0)
    out_coord = jnp.where(any_acc[:, None], coord / wsafe[:, None], 0.0)
    depth_ln = depth / lnf
    out_depth = jnp.where(any_acc, depth_ln / wsafe, 0.0)
    out_mdepth = mdepth / lnf
    from igs_tpu.utils.safe_math import safe_norm

    nlen = jnp.maximum(safe_norm(normal, keepdims=True), 1e-12)
    out_normal = jnp.where(any_acc[:, None], normal / nlen, 0.0)

    def img(x):
        if x.ndim == 2:
            return x.reshape(height, width, -1).transpose(2, 0, 1)
        return x.reshape(height, width)

    return RenderOutputs(
        color=img(out_color),
        alpha=img(weight),
        coord=img(out_coord),
        mcoord=img(mcoord),
        depth=img(out_depth),
        mdepth=img(out_mdepth),
        normal=img(out_normal),
        accum_coord=img(coord),
        accum_depth=img(depth_ln),
        n_contrib=img(lastg),
        max_contrib=img(sel1),
    )
