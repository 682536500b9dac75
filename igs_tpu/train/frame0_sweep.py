"""SPMD frame-0 sweep: train F independent frames in lockstep over the mesh.

The reference builds its AGM training set with a GPU-id process pool
(one frame per GPU, submodules/RaDe-GS/build_3dgs_dataset.py:43-56).
On TPU the natural formulation is SPMD: every per-frame computation in
the RaDe-GS trainer (igs_tpu/train/frame0.py) is pure and shape-static,
so F frames train as ONE jitted program with a leading frame axis
sharded over the mesh's ``data`` axis — no collectives are needed (the
frames are independent), XLA partitions the batch trivially, and one
host drives any number of chips. The subprocess pool in build_frame0.py
(--workers) remains for multi-host or heterogeneous sweeps.

Whole-sweep program: fori_loop over iterations of a vmapped frame0_step
with interval densify/prune (+3D-filter recompute) and opacity resets
folded in as lax.conds — the same schedule as the sequential driver.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from igs_tpu.ops.rasterize import RasterSettings, count_gaussians
from igs_tpu.stream.refine import RefineState
from igs_tpu.train.frame0 import (
    Frame0Config, frame0_densify_and_prune, frame0_step, fused_render_args,
    position_lr, reset_opacity,
)


def compute_3d_filter_stacked(xyz, valid, cams) -> jnp.ndarray:
    """compute_3d_filter with the camera loop as a lax.scan over stacked
    cameras (leading V axis) — vmappable over frames."""
    n = xyz.shape[0]

    def body(carry, cam):
        distance, valid_pt, focal_max = carry
        wvt = cam.world_view_transform
        pc = xyz @ wvt[:3, :3] + wvt[3, :3]
        z = jnp.maximum(pc[:, 2], 0.001)
        fx = cam.focal_x
        x = pc[:, 0] / z * fx + cam.width / 2.0
        y = pc[:, 1] / z * cam.focal_y + cam.height / 2.0
        in_screen = (
            (x >= -0.15 * cam.width) & (x <= 1.15 * cam.width)
            & (y >= -0.15 * cam.height) & (y <= 1.15 * cam.height)
        )
        ok = (pc[:, 2] > 0.2) & in_screen
        return (
            jnp.where(ok, jnp.minimum(distance, z), distance),
            valid_pt | ok,
            jnp.maximum(focal_max, fx),
        ), None

    init = (jnp.full(n, 1e5, jnp.float32), jnp.zeros(n, bool),
            jnp.float32(0.0))
    (distance, valid_pt, focal_max), _ = jax.lax.scan(body, init, cams)
    far = jnp.max(jnp.where(valid_pt & valid, distance, -1e5))
    distance = jnp.where(valid_pt, distance, far)
    return (distance / focal_max * (0.2 ** 0.5))[:, None]


def lightgaussian_importance_stacked(
    g, filter_3d, cams, settings: RasterSettings, v_pow: float = 0.1
) -> jnp.ndarray:
    """lightgaussian_importance with the view loop as lax.scan."""
    scales, opacity = fused_render_args(g, filter_3d)

    def body(imp, cam):
        _, score = count_gaussians(
            g.xyz, opacity, scales, g.get_rotation, cam,
            valid=g.valid, settings=settings)
        return imp + score, None

    imp, _ = jax.lax.scan(
        body, jnp.zeros(g.num_capacity, jnp.float32), cams)
    volume = jnp.prod(scales, axis=1)
    sorted_v = jnp.sort(jnp.where(g.valid, volume, 0.0))
    n_valid = jnp.sum(g.valid)
    k90 = jnp.clip(
        g.num_capacity - n_valid + (0.9 * n_valid).astype(jnp.int32),
        0, g.num_capacity - 1)
    v90 = jnp.maximum(sorted_v[k90], 1e-12)
    return jnp.power(volume / v90, v_pow) * imp


def sweep_run(
    states: RefineState,  # vmapped pytree, leading F axis
    cams,  # stacked Camera pytree (F, V, ...)
    images: jnp.ndarray,  # (F, V, 3, H, W)
    filts: jnp.ndarray,  # (F, N, 1)
    view_order: jnp.ndarray,  # (F, iters) int32
    cfg: Frame0Config,
    settings: RasterSettings,
    spatial: jnp.ndarray,  # (F,) scene extents
    iters: int,
    start_iter: int = 0,
    densify: bool = True,
):
    """The whole F-frame training schedule as one jitted program.

    Matches build_frame0.train_one_frame's loop: per-iteration Adam step
    (view drawn from view_order), densify+filter-recompute every
    densification_interval until densify_until_iter (size/screen pruning
    armed after the first opacity reset, train.py:206-216), opacity reset
    every opacity_reset_interval. Shard the F axis of every input over
    the mesh ``data`` axis to scale across chips.
    """
    f = images.shape[0]
    bg = jnp.zeros(3)

    vstep = jax.vmap(
        frame0_step,
        in_axes=(0, 0, 0, None, 0, None, None, 0, None),
    )
    vdens_size = jax.vmap(
        lambda s, ext: frame0_densify_and_prune(s, cfg, ext, 20.0))
    vdens = jax.vmap(
        lambda s, ext: frame0_densify_and_prune(s, cfg, ext, None))
    vfilt = jax.vmap(compute_3d_filter_stacked)
    vreset = jax.vmap(reset_opacity)

    def one_iter(i, carry):
        st, filt = carry
        it = start_iter + i + 1  # 1-based like the sequential driver
        vi = view_order[:, i]
        cam_i = jax.tree.map(lambda x: x[jnp.arange(f), vi], cams)
        gt = images[jnp.arange(f), vi]
        lr = jax.vmap(lambda sp: position_lr(it, cfg, sp))(spatial)
        st, _ = vstep(st, cam_i, gt, bg, filt, cfg, settings, lr, False)

        if densify:
            do_dens = (
                (it < cfg.densify_until_iter)
                & (it > cfg.densify_from_iter)
                & (it % cfg.densification_interval == 0)
            )
            size_on = it > cfg.opacity_reset_interval
            st = jax.lax.cond(
                do_dens & size_on,
                lambda s: vdens_size(s, spatial),
                lambda s: jax.lax.cond(
                    do_dens, lambda x: vdens(x, spatial), lambda x: x, s),
                st,
            )
            filt = jax.lax.cond(
                do_dens,
                lambda _: vfilt(st.gaussians.xyz, st.gaussians.valid, cams),
                lambda fl: fl,
                filt,
            )
            st = jax.lax.cond(
                it % cfg.opacity_reset_interval == 0, vreset,
                lambda s: s, st)
        return st, filt

    return jax.lax.fori_loop(0, iters, one_iter, (states, filts))


def sweep_compress(states, cams, filts, settings, prune_percent: float):
    """Vmapped LightGaussian prune (compress.py:66-100 first stage)."""
    from igs_tpu.train.frame0 import prune_by_importance

    def one(g, filt, cam):
        scores = lightgaussian_importance_stacked(g, filt, cam, settings)
        return prune_by_importance(g, scores, prune_percent)

    return jax.vmap(one)(states.gaussians, filts, cams)
