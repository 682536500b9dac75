"""Stage-level profiler for the streaming window (VERDICT r1 item 2).

Decomposes the two dominant blocks of the 5-frame streaming window
(roofline.json: refine_loop ≈ 4.45 s, agm_forward ≈ 0.65 s of the ~5.15 s
window) into their pipeline stages, each timed as its own jitted program
with on-device lax.scan amortization (K repeats, input perturbed per
iteration to defeat CSE — single tunnel dispatches carry 5-30 ms of
latency and would swamp small stages).

Usage: python profile_stages.py [--what refine|agm|all]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def scan_timeit(make_fn, args, K=8, iters=3):
    """Time fn amortized over K on-device salted repetitions (see
    igs_tpu/utils/devtime.py for the axon-tunnel caveats)."""
    from igs_tpu.utils.devtime import timeit_device

    return timeit_device(make_fn(), *args, K=K, iters=iters, salt_scale=1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all", choices=["refine", "agm", "all"])
    ap.add_argument("--n-gaussians", type=int, default=150_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--out", default="profile_stages.json")
    ap.add_argument("--cnn-bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from igs_tpu.core.camera import Camera
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.ops.binning import (
        build_tile_pairs, image_tile_grid,
    )
    from igs_tpu.ops.projection import project
    from igs_tpu.ops.rasterize import RasterSettings, rasterize
    from igs_tpu.ops.render_tiles import pairs_to_idx_table
    from igs_tpu.train.losses import l1_loss, ssim

    n, res = args.n_gaussians, args.res
    rng = np.random.RandomState(0)
    g = Gaussians.create(
        rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        rng.uniform(-2, 4, (n, 1)).astype(np.float32),
        (lambda q: q / np.linalg.norm(q, axis=1, keepdims=True))(
            rng.normal(size=(n, 4)).astype(np.float32)),
        rng.uniform(-5.5, -3.5, (n, 3)).astype(np.float32),
        np.concatenate([
            rng.uniform(-1, 2, (n, 1, 3)),
            0.05 * rng.normal(size=(n, 15, 3))], 1).astype(np.float32),
    )
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 5.0
    cam = Camera.from_w2c(w2c, 0.9, 0.9, height=res, width=res)
    settings = RasterSettings(
        image_height=res, image_width=res, impl="pallas_packed",
        max_pairs=1 << 19, max_per_tile=1024, chunk=256,
        outputs="color", clamp_grads=False,
    )
    results = {}

    if args.what in ("refine", "all"):
        # ---- stage: projection/preprocess
        def mk_proj():
            return lambda x: project(
                x, g.get_scaling, g.get_rotation, g.get_opacity, cam,
                shs=g.shs, sh_degree=3, kernel_size=0.0, valid=g.valid)

        results["refine/project_fwd_s"] = scan_timeit(mk_proj, (g.xyz,))

        proj = jax.jit(mk_proj())(g.xyz)
        grid_x, grid_y = image_tile_grid(res, res)

        # ---- stage: binning (pair build + idx table)
        def mk_binning():
            def fn(m2d):
                p = proj._replace(means2d=m2d)
                pairs = build_tile_pairs(p, grid_x, grid_y, settings.max_pairs)
                idx = pairs_to_idx_table(pairs, settings.max_per_tile)
                return idx, pairs.tile_count
            return fn

        results["refine/binning_s"] = scan_timeit(mk_binning, (proj.means2d,))

        # ---- stage: packed-path pre-kernel work (pair build +
        # feature pack + (MPT, 32) row gather + transpose)
        from igs_tpu.ops.binning import build_tile_pairs
        from igs_tpu.ops.pallas_blend import pack_features

        def mk_packed_bin():
            def fn(m2d):
                p = proj._replace(means2d=m2d)
                pairs = build_tile_pairs(
                    p, grid_x, grid_y, settings.max_pairs)
                feats = pack_features(p)
                pair_feats = feats[jnp.maximum(pairs.gauss_id, 0)]
                return pair_feats.T, pairs.tile_start
            return fn

        results["refine/packed_binning_s"] = scan_timeit(
            mk_packed_bin, (proj.means2d,))

        # ---- stage: full forward (project+binning+blend), color mode
        def mk_fwd():
            return lambda x: rasterize(
                means3d=x, opacity=g.get_opacity, scaling=g.get_scaling,
                rotation=g.get_rotation, camera=cam, shs=g.shs,
                valid=g.valid, settings=settings)["color"]

        results["refine/raster_fwd_s"] = scan_timeit(mk_fwd, (g.xyz,))

        # ---- stage: fwd+bwd color L1 (all 5 param grads)
        def mk_fb():
            def loss(x, op, sc, ro, sh):
                out = rasterize(
                    means3d=x, opacity=op, scaling=sc, rotation=ro,
                    camera=cam, shs=sh, valid=g.valid, settings=settings)
                return jnp.mean(jnp.abs(out["color"]))
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))

        results["refine/raster_fwd_bwd_s"] = scan_timeit(
            mk_fb, (g.xyz, g.get_opacity, g.get_scaling, g.get_rotation,
                    g.shs))

        # ---- stage: ssim+l1 on 512²
        img = jnp.asarray(rng.uniform(0, 1, (3, res, res)), jnp.float32)
        gt = jnp.asarray(rng.uniform(0, 1, (3, res, res)), jnp.float32)

        def mk_ssim():
            def fn(a, b):
                s, _ = ssim(a, b)
                return 0.8 * l1_loss(a, b) + 0.2 * (1 - s)
            return jax.grad(fn)

        results["refine/ssim_l1_grad_s"] = scan_timeit(mk_ssim, (img, gt), K=16)

        # ---- whole refine step for reference
        from igs_tpu.stream.refine import (
            RefineConfig, init_refine_state, refine_step)
        state = init_refine_state(g, capacity=n)
        rcfg = RefineConfig()

        def mk_step():
            def fn(xyz, st):
                st = st.replace(gaussians=st.gaussians.replace(xyz=xyz))
                st2, aux = refine_step(st, cam, gt, jnp.zeros(3), rcfg,
                                       settings)
                return st2.gaussians.xyz
            return fn

        results["refine/full_step_s"] = scan_timeit(
            mk_step, (g.xyz, state), K=4)

    if args.what in ("agm", "all"):
        from igs_tpu.models.agm import AGMNet
        from igs_tpu.models.swin import FeatureTransformer, FeatureTransformerMy
        from igs_tpu.models.backbone import CNNEncoder
        from igs_tpu.ops.anchors import select_anchors

        b = args.batch
        hw = 512
        h8 = hw // 8 * 2
        model = AGMNet(cnn_bf16=args.cnn_bf16)
        sel = jax.jit(lambda x, v: select_anchors(
            x, jnp.asarray([[-2.0, -2, -2], [2.0, 2, 2]]), valid=v,
            anchor_size=8192, k=8, exact_knn=False))
        state1 = sel(g.xyz, g.valid)
        astate = jax.tree.map(lambda x: jnp.stack([x] * b), state1)
        gb = jax.tree.map(lambda x: jnp.stack([x] * b), g)
        c2w = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1))
        c2w[:, :, 2, 3] = -5.0
        batch = {
            "cur_images_input": jnp.asarray(
                rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
            "next_images_input": jnp.asarray(
                rng.uniform(0, 1, (b, 4, 3, hw, hw)), jnp.float32),
            "depth": jnp.asarray(
                rng.uniform(2, 6, (b, 4, hw, hw)), jnp.float32),
            "local_rays": jnp.asarray(
                rng.normal(size=(b, h8, h8, 3)), jnp.float32),
            "FOV": jnp.full((b, 2), 0.9),
            "c2w_input": jnp.asarray(c2w),
            "c2w_output": jnp.asarray(
                np.concatenate([c2w[:, :1], c2w], axis=1)),
            "background_color": jnp.zeros((b, 3)),
        }
        agm_settings = settings._replace(clamp_grads=True, outputs="color")
        depth_settings = agm_settings._replace(
            image_height=128, image_width=128,
            max_pairs=1 << 18, max_per_tile=512, outputs="color_depth")
        params = jax.jit(lambda r: model.init(
            r, batch, astate, gb, agm_settings,
            depth_settings=depth_settings))(jax.random.PRNGKey(0))

        cur = batch["cur_images_input"].reshape(-1, 3, hw, hw)
        nxt = batch["next_images_input"].reshape(-1, 3, hw, hw)

        # ---- stage: CNN encoder (20 images of 512²)
        concat = jnp.concatenate([cur, nxt], axis=0)
        cnn_params = params["params"]["backbone"]["backbone"]

        def mk_cnn():
            enc = CNNEncoder(
                output_dim=128,
                dtype=jnp.bfloat16 if args.cnn_bf16 else None)
            return lambda x: enc.apply({"params": cnn_params}, x)

        results["agm/cnn_encoder_s"] = scan_timeit(mk_cnn, (concat,), K=4)

        # ---- stage: 6-layer feature transformer (on 2×20×64²×128 tokens)
        f = jax.jit(mk_cnn())(concat)
        f0, f1 = jnp.split(f, 2, axis=0)
        ft_params = params["params"]["backbone"]["transformer"]

        def mk_ft():
            ft = FeatureTransformer(num_layers=6, d_model=128)
            return lambda a, b2: ft.apply(
                {"params": ft_params}, a, b2, attn_num_splits=2)

        results["agm/feature_transformer_s"] = scan_timeit(
            mk_ft, (f0, f1), K=4)

        # ---- stage: motion transformer (1 layer)
        mt_params = params["params"]["transformer"]

        def mk_mt():
            mt = FeatureTransformerMy(num_layers=1, d_model=128)
            return lambda a, b2: mt.apply(
                {"params": mt_params}, a, b2, attn_num_splits=2)

        results["agm/motion_transformer_s"] = scan_timeit(
            mk_mt, (f0, f1), K=4)

        # ---- stage: full motion_features (backbone+motion+upsample)
        def mk_motion():
            return lambda a, b2: model.apply(
                params, a, b2, method=lambda m, x, y: m.motion_features(x, y))

        results["agm/motion_features_s"] = scan_timeit(mk_motion, (cur, nxt), K=4)

        motion = jax.jit(mk_motion())(cur, nxt)

        # ---- stage: condition3d
        def mk_cond():
            return lambda mo: model.apply(
                params, mo, batch["local_rays"], batch["depth"],
                method=lambda m, a, b2, c: m.condition3d(a, b2, c))

        results["agm/condition3d_s"] = scan_timeit(mk_cond, (motion,), K=8)

        cond = jax.jit(mk_cond())(motion)

        # ---- stage: triplane encoder (projection + transformer1d)
        def mk_tri():
            return lambda mo: model.apply(
                params, mo, astate.anchor_points, batch["FOV"],
                batch["c2w_input"],
                method=lambda m, a, b2, c, d: m.triplane_encoder(a, b2, c, d))

        results["agm/triplane_encoder_s"] = scan_timeit(mk_tri, (cond,), K=4)

        tri = jax.jit(mk_tri())(cond)

        # ---- stage: interpolate + decode
        from igs_tpu.models.renderer import interpolate_residuals

        def mk_dec():
            def fn(t):
                feats = jax.vmap(interpolate_residuals)(t, astate)
                return model.apply(
                    params, feats, method=lambda m, x: m.decoder(x))
            return fn

        results["agm/interp_decode_s"] = scan_timeit(mk_dec, (tri,), K=8)

        # ---- stage: the 5×(1 eval + 4 depth) renders
        res_dec = jax.jit(mk_dec())(tri)

        def mk_renders():
            def fn(resid_xyz):
                resid = dict(res_dec)
                resid["xyz"] = resid_xyz
                from igs_tpu.core.camera import Camera as Cam
                from igs_tpu.models.renderer import render_views

                def render_split(gs, res_, mask, c2ws, fx, fy, bg):
                    gdef = gs.deform(
                        res_xyz=res_["xyz"], res_rotation=res_.get("rotation"),
                        mask=mask)
                    cam0 = Cam.from_c2w(
                        c2ws[0], (fx, fy),
                        (agm_settings.image_height, agm_settings.image_width))
                    cams0 = jax.tree.map(lambda x: jnp.asarray(x)[None], cam0)
                    out0 = render_views(gdef, cams0, bg, agm_settings)
                    camsd = jax.vmap(
                        lambda c2w_: Cam.from_c2w(
                            c2w_, (fx, fy),
                            (depth_settings.image_height,
                             depth_settings.image_width)))(c2ws[1:])
                    outd = render_views(gdef, camsd, bg, depth_settings,
                                        parallel=True)
                    return out0["images_pred"], outd["depth_pred"]

                return jax.vmap(render_split)(
                    gb, resid, astate.mask, batch["c2w_output"],
                    batch["FOV"][:, 0], batch["FOV"][:, 1],
                    jnp.zeros((b, 3)))
            return fn

        results["agm/renders_s"] = scan_timeit(mk_renders, (res_dec["xyz"],), K=4)

    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
