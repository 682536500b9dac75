"""Key-frame refinement: Adam on Gaussian params + max-bounded densify.

Reference parity: trainable GaussianModel (igs/models/gaussian_model.py)
used by the streaming refine loop (infer_batch.py:245-357):
  * load_fromstream → Adam(eps=1e-15) param groups with per-group lrs
    (gaussian_model.py:265-348); refine_item flags gate shs/opacity/scaling.
  * add_densification_stats (gaussian_model.py:865-868): accumulates the
    NDC means2D grad norm over visible Gaussians.
  * densify_and_prune with the max-points bound (gaussian_model.py:640-666),
    densify_and_clone/split (gaussian_model.py:586-638). Note
    load_fromstream leaves percent_dense = 0 (gaussian_model.py:84), so in
    the streaming refine clone never fires and split always fires for
    selected Gaussians — behavior preserved here.
  * convert2stream (gaussian_model.py:350-367).

TPU-first: the Gaussian array has FIXED capacity (opt.max_num); densify
scatters new rows into dead slots and prune clears ``valid`` — every step
is one jitted graph, no optimizer "surgery", no reallocation. Adam moments
live alongside as a pytree; new rows start with zeroed moments exactly like
the reference's cat_tensors_to_optimizer (gaussian_model.py:520-556).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from igs_tpu.core.camera import Camera
from igs_tpu.core.gaussians import Gaussians
from igs_tpu.core.quaternion import quat_to_rotmat
from igs_tpu.ops.rasterize import RasterSettings, rasterize
from igs_tpu.train.losses import l1_loss, ssim

TRAINABLE = ("xyz", "rotation", "shs", "opacity", "scaling")


class RefineConfig(NamedTuple):
    """Static refine configuration (configs/demo.yaml opt.*)."""

    position_lr: float = 0.0016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.01
    lambda_l1: float = 0.8
    no_shs: bool = False
    no_opacity: bool = False
    no_scaling: bool = False
    use_mask: bool = False
    # train only NEWLY-densified rows' SHs, pre-refine rows' SHs frozen
    # (refine_item.use_new_shs, gaussian_model.py:110-118,273,345 — the
    # torch version keeps new_shs as a separate optimizer group; with
    # fixed capacity the initial-valid mask freezes the original rows)
    use_new_shs: bool = False
    # densify (demo.yaml:55-62)
    use_densify: bool = True
    densify_until_iter: int = 100
    densify_from_iter: int = 0
    densification_interval: int = 20
    densify_grad_threshold: float = 0.00015
    min_opacity: float = 0.005
    percent_dense: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15
    # Pair-cache staleness bound in ADAM STEPS: each view's tile-pair
    # list is prebuilt once and rebuilt only when staler than K steps
    # (in-context binning is ~8 ms of a ~30 ms step; per-step position
    # deltas are ≪ one 16px tile, so tile assignment/depth order drift
    # slowly — per-iteration FEATURES stay fresh and densify forces a
    # full cache rebuild). 1 = exact per-iteration binning (the
    # reference's behavior); >1 requires impl="pallas_packed". A value
    # ≥ the refine iteration count freezes the prebuilt lists.
    rebin_every: int = 1

    def lr_for(self, name: str) -> float:
        return {
            "xyz": self.position_lr,
            "rotation": self.rotation_lr,
            "shs": self.feature_lr,
            "opacity": self.opacity_lr,
            "scaling": self.scaling_lr,
        }[name]

    def trains(self, name: str) -> bool:
        if name == "shs":
            return not self.no_shs
        if name == "opacity":
            return not self.no_opacity
        if name == "scaling":
            return not self.no_scaling
        return True  # xyz, rotation always train


@struct.dataclass
class RefineState:
    gaussians: Gaussians
    adam_m: dict  # name → array like param
    adam_v: dict
    step: jnp.ndarray  # () int32
    max_radii2d: jnp.ndarray  # (N,) f32
    xyz_grad_accum: jnp.ndarray  # (N,) f32
    denom: jnp.ndarray  # (N,) f32
    rng: jnp.ndarray  # PRNG key for split sampling
    # max tile-budget truncation seen across the loop (0 = budgets OK)
    overflow: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    # rows valid BEFORE refine started (their SHs freeze under use_new_shs)
    init_valid: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((0,), bool))


def init_refine_state(
    gaussians: Gaussians, capacity: int, seed: int = 0
) -> RefineState:
    """load_fromstream equivalent: pad to capacity, zero Adam moments."""
    g = gaussians.pad_to(capacity)
    zeros_like = lambda name: jnp.zeros_like(getattr(g, name))
    return RefineState(
        gaussians=g,
        adam_m={k: zeros_like(k) for k in TRAINABLE},
        adam_v={k: zeros_like(k) for k in TRAINABLE},
        step=jnp.zeros((), jnp.int32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        rng=jax.random.PRNGKey(seed),
        overflow=jnp.zeros((), jnp.int32),
        # copy: must not alias gaussians.valid — callers jit with
        # donate_argnums and a doubly-referenced donated buffer is an error
        init_valid=g.valid & True,
    )


def _loss_and_grads(gaussians: Gaussians, camera, gt_image, bg, cfg, settings,
                    strip_row0=None, axis_name=None, pairs_override=None):
    """Loss + grads; optionally with the render sharded over image tile-rows.

    Sharded mode (``axis_name`` set, inside shard_map): each device renders
    its strip (``strip_row0``), the full image is re-assembled with
    all_gather for the (windowed, strip-crossing) SSIM, and the per-device
    partial parameter grads are psum'd. The per-device loss is divided by
    the shard count before AD — every device differentiates the SAME full
    loss, so the all_gather transpose (a psum-scatter of the n identical
    cotangents) would otherwise scale grads by n.
    """
    params = {k: getattr(gaussians, k) for k in TRAINABLE}
    n = gaussians.num_capacity
    m2o = jnp.zeros((n, 2), jnp.float32)
    nsh = 1 if axis_name is None else jax.lax.psum(1, axis_name)

    def loss_fn(params, m2o):
        g = gaussians.replace(**params)
        out = rasterize(
            means3d=g.get_xyz,
            opacity=g.get_opacity,
            scaling=g.get_scaling,
            rotation=g.get_rotation,
            camera=camera,
            shs=g.shs,
            bg=bg,
            means2d_offset=m2o,
            valid=g.valid,
            settings=settings,
            strip_row0=strip_row0,
            pairs_override=pairs_override,
        )
        img = out["color"]
        if axis_name is not None:
            strips = jax.lax.all_gather(img, axis_name)  # (nsh, 3, hs, W)
            img = jnp.moveaxis(strips, 0, 1).reshape(
                img.shape[0], -1, img.shape[-1])
        s, _ = ssim(img, gt_image)
        loss = cfg.lambda_l1 * l1_loss(img, gt_image) + (1 - cfg.lambda_l1) * (
            1.0 - s
        )
        mse = jnp.mean((img - gt_image) ** 2)
        return loss / nsh, (out["radii"], mse, out["overflow_tiles"])

    (loss, (radii, mse, overflow)), (grads, g_m2o) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, m2o)
    if axis_name is not None:
        loss = loss * nsh  # report the true (undivided) loss
        grads = jax.lax.psum(grads, axis_name)
        g_m2o = jax.lax.psum(g_m2o, axis_name)
        overflow = jax.lax.psum(overflow, axis_name)
    return loss, grads, g_m2o, radii, mse, overflow


def refine_step(
    state: RefineState,
    camera: Camera,
    gt_image: jnp.ndarray,  # (3, H, W)
    bg: jnp.ndarray,
    cfg: RefineConfig,
    settings: RasterSettings,
    do_densify_stats: bool = True,
    strip_row0=None,
    axis_name=None,
    pairs_override=None,
):
    """One optimization iteration (infer_batch.py:279-324, minus densify)."""
    g = state.gaussians
    loss, grads, g_m2o, radii, mse, overflow = _loss_and_grads(
        g, camera, gt_image, bg, cfg, settings, strip_row0, axis_name,
        pairs_override,
    )

    # gradient gating: dead rows, frozen groups, (optionally) static region
    gate = g.valid
    if cfg.use_mask and g.mask is not None:
        gate = gate & g.mask
    gatef = gate.astype(jnp.float32)

    step = state.step + 1
    t = step.astype(jnp.float32)
    new_params, new_m, new_v = {}, {}, {}
    for name in TRAINABLE:
        p = getattr(g, name)
        gname = gatef
        if name == "shs" and cfg.use_new_shs:
            gname = gatef * (~state.init_valid).astype(jnp.float32)
        gr = grads[name] * gname.reshape((-1,) + (1,) * (p.ndim - 1))
        m = cfg.beta1 * state.adam_m[name] + (1 - cfg.beta1) * gr
        v = cfg.beta2 * state.adam_v[name] + (1 - cfg.beta2) * gr * gr
        mhat = m / (1 - cfg.beta1**t)
        vhat = v / (1 - cfg.beta2**t)
        upd = cfg.lr_for(name) * mhat / (jnp.sqrt(vhat) + cfg.eps)
        if not cfg.trains(name):
            upd = jnp.zeros_like(upd)
        new_params[name] = p - upd
        new_m[name] = m
        new_v[name] = v

    new_g = g.replace(**new_params)

    if do_densify_stats:
        vis = (radii > 0) & g.valid
        max_radii = jnp.where(
            vis, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        )
        gnorm = jnp.linalg.norm(g_m2o, axis=-1)
        accum = state.xyz_grad_accum + jnp.where(vis, gnorm, 0.0)
        denom = state.denom + vis.astype(jnp.float32)
    else:
        max_radii, accum, denom = (
            state.max_radii2d, state.xyz_grad_accum, state.denom
        )

    new_state = state.replace(
        gaussians=new_g,
        adam_m=new_m,
        adam_v=new_v,
        step=step,
        max_radii2d=max_radii,
        xyz_grad_accum=accum,
        denom=denom,
        overflow=jnp.maximum(state.overflow, overflow),
    )
    return new_state, {"loss": loss, "psnr": -10 * jnp.log10(mse)}


def _scatter_rows(g: Gaussians, state_m, state_v, src_mask, make_row_fn, rng):
    """Scatter rows derived from ``src_mask`` rows into dead slots.

    Returns updated (gaussians, adam_m, adam_v, n_added). Drops overflow
    beyond free capacity (the max-points bound, gaussian_model.py:645-651).
    """
    n = g.num_capacity
    free = ~g.valid
    # rank of each free slot among free slots / each source among sources
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    src_rank = jnp.cumsum(src_mask.astype(jnp.int32)) - 1
    num_free = jnp.sum(free.astype(jnp.int32))
    num_src = jnp.sum(src_mask.astype(jnp.int32))
    n_add = jnp.minimum(num_free, num_src)

    # GATHER formulation: the r-th free slot pulls the r-th taken source
    # row. TPU scatters are microcoded element loops (~9 ms per 150k-row
    # scatter, 16 of them per densify = ~280 ms measured); the equivalent
    # wide-row gather + where runs at memory speed.
    take = src_mask & (src_rank < n_add)
    taken_idx = jnp.nonzero(take, size=n, fill_value=0)[0]
    is_dest = free & (free_rank < n_add)
    gidx = taken_idx[jnp.clip(free_rank, 0, n - 1)]  # per-slot source row

    new_rows = make_row_fn(g, rng)  # dict name → (N, ·) candidate rows

    def fill(arr, rows):
        sel = is_dest.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(sel, rows[gidx], arr)

    g2 = g.replace(
        xyz=fill(g.xyz, new_rows["xyz"]),
        opacity=fill(g.opacity, new_rows["opacity"]),
        rotation=fill(g.rotation, new_rows["rotation"]),
        scaling=fill(g.scaling, new_rows["scaling"]),
        shs=fill(g.shs, new_rows["shs"]),
        valid=g.valid | is_dest,
        # clones/splits inherit the source row's dynamic-region bit
        mask=None if g.mask is None else fill(g.mask, g.mask),
    )

    def zero(arr):
        sel = is_dest.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(sel, 0.0, arr)

    m2 = {k: zero(v) for k, v in state_m.items()}
    v2 = {k: zero(v) for k, v in state_v.items()}
    return g2, m2, v2, n_add


def densify_and_prune(
    state: RefineState,
    cfg: RefineConfig,
    extent: jnp.ndarray,  # scene radius (infer_batch.py:320 batch["radius"])
) -> RefineState:
    """Max-bounded densify (clone+split) then opacity prune.

    Parity: gaussian_model.py:640-666 with control_max=True and
    max_screen_size=None (the streaming-refine call, infer_batch.py:316-320).
    """
    g = state.gaussians
    n = g.num_capacity
    valid_before = g.valid
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)

    selected = (grads >= cfg.densify_grad_threshold) & g.valid
    scale_max = jnp.max(g.get_scaling, axis=1)
    is_big = scale_max > cfg.percent_dense * extent

    # --- clone (small gaussians; inert when percent_dense == 0) ----------
    clone_sel = selected & ~is_big

    def clone_rows(gg, rng):
        return {
            "xyz": gg.xyz,
            "opacity": gg.opacity,
            "rotation": gg.rotation,
            "scaling": gg.scaling,
            "shs": gg.shs,
        }

    rng, k1, k2a, k2b = jax.random.split(state.rng, 4)
    g, m, v, _ = _scatter_rows(
        g, state.adam_m, state.adam_v, clone_sel, clone_rows, k1
    )

    # --- split (big gaussians): N=2 — one new sampled row scattered into a
    # free slot, and the original row REPLACED by the second sample with
    # scale/(0.8·N) (equivalent to add-2-then-prune-original,
    # gaussian_model.py:586-615, with one fewer slot churn).
    split_sel = selected & is_big

    def split_sample(gg, key):
        std = gg.get_scaling
        eps = jax.random.normal(key, (n, 3))
        rot = quat_to_rotmat(gg.rotation, normalize=True)
        offset = jnp.einsum("nij,nj->ni", rot, eps * std)
        new_scaling = jnp.log(gg.get_scaling / (0.8 * 2))
        return {
            "xyz": gg.xyz + offset,
            "opacity": gg.opacity,
            "rotation": gg.rotation,
            "scaling": new_scaling,
            "shs": gg.shs,
        }

    g, m, v, _ = _scatter_rows(
        g, m, v, split_sel, lambda gg, r: split_sample(gg, k2a), k2a
    )
    # replace originals in place with the second sample
    rows_b = split_sample(g, k2b)
    sel3 = split_sel.reshape(-1, 1)
    g = g.replace(
        xyz=jnp.where(sel3, rows_b["xyz"], g.xyz),
        scaling=jnp.where(sel3, rows_b["scaling"], g.scaling),
    )
    # reset moments of re-split originals (they were pruned+readded in ref)
    m = {
        k: jnp.where(
            split_sel.reshape((-1,) + (1,) * (arr.ndim - 1)), 0.0, arr
        )
        for k, arr in m.items()
    }
    v = {
        k: jnp.where(
            split_sel.reshape((-1,) + (1,) * (arr.ndim - 1)), 0.0, arr
        )
        for k, arr in v.items()
    }

    # --- prune: opacity below threshold (size pruning off in streaming) --
    keep = g.get_opacity[:, 0] >= cfg.min_opacity
    g = g.replace(valid=g.valid & keep)

    # rows created this pass (scattered into dead/reused slots, or re-split
    # in place) are NEW gaussians — under use_new_shs their SHs train
    # (reference: they live in the trainable new_shs group)
    new_rows = (g.valid & ~valid_before) | split_sel
    init_valid = state.init_valid & ~new_rows

    return state.replace(
        gaussians=g,
        adam_m=m,
        adam_v=v,
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
        rng=rng,
        init_valid=init_valid,
    )


def refine_run(
    state: RefineState,
    cameras: Camera,  # stacked pytree over the key frame's training views
    gt_images: jnp.ndarray,  # (V, 3, H, W)
    view_order: jnp.ndarray,  # (iters,) int32 — view index per iteration
    bg: jnp.ndarray,
    cfg: RefineConfig,
    settings: RasterSettings,
    extent,
    iters: int,
) -> RefineState:
    """The ENTIRE key-frame refine loop as one compiled program.

    The reference runs refine_iterations separate fwd+bwd dispatches
    (infer_batch.py:279-324); with fixed-capacity state every step is
    shape-stable, so the whole loop — including interval densification —
    fuses into a single lax.fori_loop (no per-step host round trips).

    ``cfg.rebin_every > 1`` additionally amortizes tile binning: each
    view's pair list is carried across iterations and rebuilt only every
    K uses (or immediately after a densify event). Features are still
    gathered from the CURRENT parameters every iteration — only the tile
    assignment and per-tile depth order go ≤K-1 Adam steps stale.
    """
    if cfg.rebin_every > 1:
        return _refine_run_rebin(
            state, cameras, gt_images, view_order, bg, cfg, settings,
            extent, iters)

    def body(it, st):
        cam = jax.tree.map(lambda x: x[view_order[it]], cameras)
        gt = gt_images[view_order[it]]
        st, _ = refine_step(st, cam, gt, bg, cfg, settings)
        if cfg.use_densify:
            do_dens = (
                (it < cfg.densify_until_iter)
                & (it > cfg.densify_from_iter)
                & (it % cfg.densification_interval == 0)
            )
            st = jax.lax.cond(
                do_dens,
                lambda s: densify_and_prune(s, cfg, jnp.float32(extent)),
                lambda s: s,
                st,
            )
        return st

    return jax.lax.fori_loop(0, iters, body, state)


def _refine_run_rebin(
    state: RefineState,
    cameras: Camera,
    gt_images: jnp.ndarray,
    view_order: jnp.ndarray,
    bg: jnp.ndarray,
    cfg: RefineConfig,
    settings: RasterSettings,
    extent,
    iters: int,
) -> RefineState:
    """refine_run with cached per-view pair lists, rebuilt when staler
    than ``cfg.rebin_every`` ADAM STEPS (pallas_packed only).

    Round-4 machinery findings (tools_bench_rebin*.py at 150k/512²/50it):
      * in-context binning is 8.2 ms of the 29.7 ms step; a read-only
        prebuilt pair stack reaches 26.6 ms/step,
      * the original cache recovered only 0.3 ms because its lax.cond
        carried the ENTIRE RefineState as an explicit operand — with the
        cond restricted to the five gaussian arrays the full win appears
        (v1_mincond 26.86 ms/step),
      * staleness is only meaningful in Adam steps: counting USES made
        K=4 equal to fully-frozen on an 18-view rig (reuse distance 18).
    All views are prebuilt once before the loop; view v rebuilds when
    ``it - built_step[v] >= rebin_every``; densify/prune invalidates the
    whole cache. Per-iteration features always come from the CURRENT
    parameters — only tile assignment and per-tile depth order go stale.
    """
    from igs_tpu.ops.rasterize import build_pairs_packed

    if settings.impl != "pallas_packed":
        raise NotImplementedError(
            "rebin_every > 1 requires settings.impl == 'pallas_packed'")
    nviews = gt_images.shape[0]

    def build_view(xyz, opac, scal, rot, vald, v):
        cam = jax.tree.map(lambda x: x[v], cameras)
        return build_pairs_packed(
            xyz, opac, scal, rot, cam, valid=vald, settings=settings)

    g0 = state.gaussians
    pstack0 = jax.vmap(
        lambda v: build_view(g0.get_xyz, g0.get_opacity, g0.get_scaling,
                             g0.get_rotation, g0.valid, v),
        in_axes=0,
    )(jnp.arange(nviews))
    built0 = jnp.zeros((nviews,), jnp.int32)  # prebuilt "at step 0"

    def body(it, carry):
        st, pstack, built = carry
        v = view_order[it]
        cam = jax.tree.map(lambda x: x[v], cameras)
        gt = gt_images[v]
        need = (it - built[v]) >= jnp.int32(cfg.rebin_every)
        pv_old = jax.tree.map(lambda x: x[v], pstack)
        g = st.gaussians
        # cond operands: ONLY the activated gaussian arrays + cached pv.
        # Passing the whole RefineState here cost ~4 ms/step.
        pv = jax.lax.cond(
            need,
            lambda op: build_view(op[0], op[1], op[2], op[3], op[4], v),
            lambda op: op[5],
            (g.get_xyz, g.get_opacity, g.get_scaling, g.get_rotation,
             g.valid, pv_old),
        )
        pstack = jax.tree.map(
            lambda s, p: jax.lax.dynamic_update_index_in_dim(s, p, v, 0),
            pstack, pv)
        built = built.at[v].set(jnp.where(need, it, built[v]))

        st, _ = refine_step(st, cam, gt, bg, cfg, settings,
                            pairs_override=pv)
        if cfg.use_densify:
            do_dens = (
                (it < cfg.densify_until_iter)
                & (it > cfg.densify_from_iter)
                & (it % cfg.densification_interval == 0)
            )
            st = jax.lax.cond(
                do_dens,
                lambda s: densify_and_prune(s, cfg, jnp.float32(extent)),
                lambda s: s,
                st,
            )
            # densify/prune changed the gaussian set: every cached pair
            # list is invalid — force rebuild on each view's next use
            built = jnp.where(do_dens,
                              jnp.full_like(built, -(cfg.rebin_every + 1)),
                              built)
        return st, pstack, built

    st, _, _ = jax.lax.fori_loop(0, iters, body, (state, pstack0, built0))
    return st


def refine_run_sharded(
    state: RefineState,
    cameras: Camera,
    gt_images: jnp.ndarray,  # (V, 3, H, W) — FULL-resolution GTs
    view_order: jnp.ndarray,
    bg: jnp.ndarray,
    cfg: RefineConfig,
    settings: RasterSettings,  # full-image settings
    extent,
    iters: int,
    mesh,
    axis: str = "tile",
) -> RefineState:
    """refine_run with the render + backward sharded over image tile-rows.

    The refine loop is the dominant block of the streaming window; its
    rasterization decomposes exactly by tile row (strip_row0 mode of
    ``rasterize``), so chip d renders/backprops rows [d·H/n, (d+1)·H/n),
    the strips are all_gather'd for the strip-crossing SSIM window, and
    parameter grads are psum'd. State stays replicated: every device
    applies the identical psum'd update (and the identical densify —
    same rng, same grads), so no re-sync is ever needed. Output and
    per-step updates match single-device ``refine_run`` to reduction
    order (test_sharding.py::TestShardedRefine).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from igs_tpu.ops.projection import TILE_Y

    nsh = mesh.shape[axis]
    grid_rows = settings.image_height // TILE_Y
    if grid_rows % nsh:
        raise ValueError(
            f"image tile rows {grid_rows} not divisible by mesh axis "
            f"'{axis}' size {nsh}")
    rows_local = grid_rows // nsh
    local_settings = settings._replace(image_height=rows_local * TILE_Y)

    def local_run(st, cams, gts, order, bgc):
        row0 = (jax.lax.axis_index(axis) * rows_local).astype(jnp.int32)

        def body(it, s):
            cam = jax.tree.map(lambda x: x[order[it]], cams)
            gt = gts[order[it]]
            s, _ = refine_step(
                s, cam, gt, bgc, cfg, local_settings,
                strip_row0=row0, axis_name=axis,
            )
            if cfg.use_densify:
                do_dens = (
                    (it < cfg.densify_until_iter)
                    & (it > cfg.densify_from_iter)
                    & (it % cfg.densification_interval == 0)
                )
                s = jax.lax.cond(
                    do_dens,
                    lambda x: densify_and_prune(x, cfg, jnp.float32(extent)),
                    lambda x: x,
                    s,
                )
            return s

        return jax.lax.fori_loop(0, iters, body, st)

    kwargs = dict(mesh=mesh, in_specs=(P(),) * 5, out_specs=P())
    try:
        fn = shard_map(local_run, check_vma=False, **kwargs)
    except TypeError:  # legacy experimental API
        fn = shard_map(local_run, check_rep=False, **kwargs)
    return fn(state, cameras, gt_images, view_order, bg)


def convert2stream(state: RefineState) -> Gaussians:
    """Back to the stream representation (gaussian_model.py:350-367)."""
    return state.gaussians
