"""Numerical parity vs the mounted torch reference (/root/reference).

VERDICT r1 item 1: build each reference torch module with random init,
convert its state_dict through igs_tpu.models.torch_convert, run both
sides on identical inputs, and assert the outputs match. This is the
test that proves a *real* checkpoint (GMFlow .pth / IGS pytorch_model.bin)
converts without silent transposition/layout bugs.

Reference modules covered (file:line cites are into /root/reference):
  * CNNEncoder                igs/models/unimatch/backbone.py:39-122
  * FeatureTransformer        igs/models/unimatch/transformer.py:205-301
  * FeatureTransformerMy      igs/models/unimatch/transformer.py:303-399
  * UniMatch (as_backbone)    igs/models/unimatch/unimatch.py:99-188
  * Transformer1D             igs/models/transformers.py:673-908
  * GridEncoder               igs/models/grid_encoder.py:53-107
  * residual decoder          igs/models/gs.py:535-559,858-869
  * query_ir_grid             igs/models/gs.py:759-821
  * ModLN / condition3D       igs/IGS.py:185-210,259-284
  * sh_utils.eval_sh          igs/utils/sh_utils.py:57-117
  * general_utils quaternions igs/utils/general_utils.py:79-101,177-202
  * graphics_utils projection igs/utils/graphics_utils.py:51-81
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_shim  # noqa: E402

ref_shim.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from igs_tpu.models import torch_convert as tc  # noqa: E402


pytestmark = pytest.mark.slow

torch.manual_seed(0)


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def allclose(a, b, atol=2e-4, rtol=1e-3, name=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=name)


# ---------------------------------------------------------------- backbone


def test_cnn_encoder_parity():
    from igs.models.unimatch.backbone import CNNEncoder as RefEnc
    from igs_tpu.models.backbone import CNNEncoder

    ref = RefEnc(output_dim=128).eval()
    x = np.random.RandomState(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[0].numpy()

    sd = {f"backbone.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_gmflow_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    got = CNNEncoder(output_dim=128).apply(
        {"params": conv["params"]["backbone"]}, jnp.asarray(x))
    allclose(want, got, name="cnn_encoder")


def _swin_inputs(b=1, c=128, h=16, w=16, seed=1):
    rng = np.random.RandomState(seed)
    f0 = rng.normal(size=(b, c, h, w)).astype(np.float32)
    f1 = rng.normal(size=(b, c, h, w)).astype(np.float32)
    return f0, f1


def test_feature_transformer_parity():
    from igs.models.unimatch.transformer import FeatureTransformer as RefFT
    from igs_tpu.models.swin import FeatureTransformer

    ref = RefFT({"num_layers": 6, "d_model": 128, "nhead": 1,
                 "ffn_dim_expansion": 4}).eval()
    f0, f1 = _swin_inputs()
    with torch.no_grad():
        w0, w1 = ref(torch.from_numpy(f0), torch.from_numpy(f1),
                     attn_type="swin", attn_num_splits=2)

    sd = {f"transformer.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_gmflow_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    g0, g1 = FeatureTransformer(num_layers=6, d_model=128).apply(
        {"params": conv["params"]["transformer"]},
        jnp.asarray(f0), jnp.asarray(f1), attn_num_splits=2)
    allclose(w0.numpy(), g0, name="feature_transformer f0")
    allclose(w1.numpy(), g1, name="feature_transformer f1")


def test_feature_transformer_my_parity():
    from igs.models.unimatch.transformer import FeatureTransformerMy as RefFTM
    from igs_tpu.models.swin import FeatureTransformerMy

    ref = RefFTM({"num_layers": 1, "d_model": 128, "nhead": 1,
                  "ffn_dim_expansion": 4}).eval()
    f0, f1 = _swin_inputs(seed=2)
    with torch.no_grad():
        want = ref(torch.from_numpy(f0), torch.from_numpy(f1),
                   attn_type="swin", attn_num_splits=2).numpy()

    sd = {f"transformer.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_gmflow_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    got = FeatureTransformerMy(num_layers=1, d_model=128).apply(
        {"params": conv["params"]["transformer"]},
        jnp.asarray(f0), jnp.asarray(f1), attn_num_splits=2)
    allclose(want, got, name="feature_transformer_my")


def test_unimatch_backbone_parity():
    """Full frozen GMFlow backbone path (unimatch.py:99-188, as_backbone)."""
    from igs.models.unimatch.unimatch import UniMatch as RefUM
    from igs_tpu.models.unimatch import UniMatch

    ref = RefUM({
        "feature_channels": 128, "num_scales": 1, "upsample_factor": 8,
        "as_backbone": True, "pretrained_model_name_or_path": "",
        "transformer_cls": "igs.models.unimatch.transformer.FeatureTransformer",
        "transformer": {"num_layers": 6, "d_model": 128, "nhead": 1,
                        "ffn_dim_expansion": 4},
    }).eval()
    rng = np.random.RandomState(3)
    img0 = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        w0, w1 = ref(torch.from_numpy(img0), torch.from_numpy(img1),
                     attn_type="swin", attn_splits_list=[2])

    conv = tc.convert_gmflow_checkpoint(sd_numpy(ref))
    assert not conv["unmapped"], conv["unmapped"]
    g0, g1 = UniMatch().apply(
        {"params": conv["params"]}, jnp.asarray(img0), jnp.asarray(img1))
    allclose(w0.numpy(), g0, atol=5e-4, name="unimatch f0")
    allclose(w1.numpy(), g1, atol=5e-4, name="unimatch f1")


# ---------------------------------------------------------------- anchors


def test_transformer1d_parity():
    from igs.models.transformers import Transformer1D as RefT1D
    from igs_tpu.models.transformer1d import Transformer1D

    ref = RefT1D({"num_attention_heads": 8, "attention_head_dim": 64,
                  "in_channels": 128, "num_layers": 4,
                  "norm_num_groups": 32}).eval()
    rng = np.random.RandomState(4)
    x = rng.normal(size=(2, 128, 96)).astype(np.float32)  # (B, C, L)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {f"triplane_encoder.conv.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_igs_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    got = Transformer1D(in_channels=128, num_layers=4).apply(
        {"params": conv["params"]["triplane_encoder"]["conv"]},
        jnp.asarray(x))
    allclose(want, got, name="transformer1d")


def _look_at_cameras(b=1, v=2, radius=3.0):
    """c2w stacks (B, V, 4, 4), cameras on the -z axis looking at origin."""
    c2ws = np.zeros((b, v, 4, 4), np.float32)
    for i in range(v):
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = radius + 0.3 * i
        c2ws[:, i] = np.linalg.inv(w2c)
    return c2ws


def test_grid_encoder_parity():
    """Anchor projection + Transformer1D (grid_encoder.py:53-107)."""
    from igs.models.grid_encoder import GridEncoder as RefGE
    from igs_tpu.models.grid_encoder import GridEncoder

    ref = RefGE({
        "plane_size": 48, "in_channels": 128, "out_channels": 128,
        "combine_type": "mask", "grid_type": "irgrid",
        "proj_type": "perspective_projection", "use_gs_emb": False,
        "res_cat": False,
        "unet_cls": "igs.models.transformers.Transformer1D",
        "unet": {"in_channels": 128, "num_attention_heads": 8,
                 "attention_head_dim": 64, "num_layers": 4},
    }).eval()

    rng = np.random.RandomState(5)
    b, v, c, h = 1, 2, 128, 16
    motion = rng.normal(size=(b * v, c, h, h)).astype(np.float32)
    anchors = rng.uniform(-0.5, 0.5, (b, 64, 3)).astype(np.float32)
    fov = np.full((b, 2), 0.9, np.float32)
    c2ws = _look_at_cameras(b, v)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(motion), None, torch.from_numpy(anchors),
            torch.from_numpy(fov), torch.from_numpy(c2ws), None,
        ).numpy()

    sd = {f"triplane_encoder.{k}": v2 for k, v2 in sd_numpy(ref).items()}
    conv = tc.convert_igs_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    got = GridEncoder(in_channels=128).apply(
        {"params": conv["params"]["triplane_encoder"]},
        jnp.asarray(motion), jnp.asarray(anchors), jnp.asarray(fov),
        jnp.asarray(c2ws))
    allclose(want, got, name="grid_encoder")


def test_residual_decoder_parity():
    """mlp_net + zero-init heads (gs.py:535-559, decode gs.py:858-869).

    Heads are zero-init in both frameworks, which would make the test
    vacuous — randomize the reference's params first, then convert.
    """
    from igs.models.gs import GS3DRenderer as RefR
    from igs_tpu.models.renderer import ResidualDecoder

    ref = RefR({
        "sh_degree": 3, "radius": 0.6, "in_channels": 128,
        "mlp_network_config": {"n_neurons": 128, "n_hidden_layers": 2,
                               "activation": "silu"},
        "neighbor_size": 8, "xyz_offset": True, "restrict_offset": True,
        "use_rgb": False, "clip_scaling": 0.2, "xyz_scale": 0.02,
        "feature_mode": "irgrid",
        "feature_channels": {"xyz": 3, "rotation": 4},
    }).eval()
    gen = torch.Generator().manual_seed(6)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)

    rng = np.random.RandomState(6)
    feats = rng.normal(size=(1000, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode_residual_feature(torch.from_numpy(feats))
        want = {k: v.numpy() for k, v in want.items()}

    sd = {f"render.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_igs_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    params = tc.fix_mlp_output_layer(conv["params"])["render"]
    got = ResidualDecoder(in_channels=128).apply(
        {"params": params}, jnp.asarray(feats))
    allclose(want["xyz"], got["xyz"], name="decoder xyz")
    allclose(want["rotation"], got["rotation"], name="decoder rotation")


def test_query_ir_grid_parity():
    """K=8 weighted anchor blend incl. knn+softmax weights (gs.py:759-821)."""
    from igs.models.gs import GS3DRenderer as RefR
    from igs_tpu.ops.knn import knn as my_knn
    from igs_tpu.ops.anchors import interpolate_anchor_features

    ref = RefR({
        "sh_degree": 3, "in_channels": 128, "neighbor_size": 8,
        "mlp_network_config": {"n_neurons": 128, "n_hidden_layers": 2,
                               "activation": "silu"},
        "feature_channels": {"xyz": 3, "rotation": 4},
    }).eval()

    rng = np.random.RandomState(7)
    n, a, d = 500, 64, 16
    points = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    anchors = rng.uniform(-1, 1, (1, a, 3)).astype(np.float32)
    anchor_feats = rng.normal(size=(1, a, d)).astype(np.float32)
    mask = np.ones(n, bool)

    with torch.no_grad():
        grouped = ref.query_ir_grid(
            torch.from_numpy(points)[None], torch.from_numpy(anchors),
            torch.from_numpy(anchor_feats),
            mask_list=[torch.from_numpy(mask)])
        want = grouped[0].numpy()

    dist, nbr = my_knn(jnp.asarray(anchors[0]), jnp.asarray(points), 8)
    weights = jax.nn.softmax(-10.0 * dist, axis=-1)
    got = interpolate_anchor_features(
        jnp.asarray(anchor_feats[0]), weights, nbr)
    allclose(want, got, atol=1e-5, name="query_ir_grid")


def test_modln_condition3d_parity():
    """ModLN (IGS.py:259-284) + condition3D resize semantics (IGS.py:185-210)."""
    from igs.IGS import ModLN as RefModLN
    from igs_tpu.models.networks import ModLN

    ref = RefModLN(128, 4, eps=1e-6).eval()
    rng = np.random.RandomState(8)
    x = rng.normal(size=(2, 16, 16, 128)).astype(np.float32)
    cond = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(cond)).numpy()

    sd = {f"ModLN.{k}": v for k, v in sd_numpy(ref).items()}
    conv = tc.convert_igs_checkpoint(sd)
    assert not conv["unmapped"], conv["unmapped"]
    got = ModLN(128).apply(
        {"params": conv["params"]["ModLN"]}, jnp.asarray(x), jnp.asarray(cond))
    allclose(want, got, name="modln")


def test_upsample_resize_parity():
    """F.interpolate(scale=2, bilinear, align_corners=False) vs jax.image.resize."""
    rng = np.random.RandomState(9)
    x = rng.normal(size=(2, 8, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear",
            align_corners=False).numpy()
    got = jax.image.resize(jnp.asarray(x), (2, 8, 24, 24), method="bilinear")
    allclose(want, got, atol=1e-6, name="upsample resize")
    # downsample path used by condition3D (IGS.py:201)
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(5, 5), mode="bilinear",
            align_corners=False).numpy()
    got = jax.image.resize(jnp.asarray(x), (2, 8, 5, 5), method="bilinear",
                           antialias=False)
    allclose(want, got, atol=1e-6, name="condition3d depth resize")


# ---------------------------------------------------------------- math utils


def test_eval_sh_parity():
    """sh_basis vs the reference's eval_sh (igs/utils/sh_utils.py:57-117)."""
    from igs.utils.sh_utils import eval_sh
    from igs_tpu.core.sh import sh_basis

    rng = np.random.RandomState(10)
    dirs = rng.normal(size=(100, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    shs = rng.normal(size=(100, 3, 16)).astype(np.float32)  # ref layout (..., C, K)
    for deg in range(4):
        want = eval_sh(deg, torch.from_numpy(shs[..., :(deg + 1) ** 2]),
                       torch.from_numpy(dirs)).numpy()
        basis = sh_basis(jnp.asarray(dirs), deg)  # (N, K)
        got = jnp.einsum("nk,nck->nc", basis, jnp.asarray(shs[..., :(deg + 1) ** 2]))
        allclose(want, got, atol=1e-5, name=f"eval_sh deg{deg}")


def test_rsh_cart_3_parity():
    from igs.IGS import rsh_cart_3 as ref_rsh
    from igs_tpu.core.sh import rsh_cart_3

    rng = np.random.RandomState(11)
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    want = ref_rsh(torch.from_numpy(xyz)).numpy()
    got = rsh_cart_3(jnp.asarray(xyz))
    allclose(want, got, atol=1e-5, name="rsh_cart_3")


def test_ray_to_plucker_parity():
    """ray_to_plucker vs igs.IGS.ray_to_plucker (IGS.py:286-295), incl.
    the F.normalize eps on (near-)zero directions."""
    from igs.IGS import ray_to_plucker as ref_plucker
    from igs_tpu.core.camera import ray_to_plucker

    rng = np.random.RandomState(11)
    rays = rng.normal(size=(4, 5, 7, 6)).astype(np.float32)
    rays[0, 0, 0, 3:] = 0.0  # zero-direction row
    want = ref_plucker(torch.from_numpy(rays)).numpy()
    got = ray_to_plucker(jnp.asarray(rays))
    allclose(want, got, atol=1e-6, name="ray_to_plucker")


def test_quaternion_multiply_parity():
    """quat_multiply vs general_utils.quaternion_multiply (which normalizes)."""
    from igs.utils.general_utils import quaternion_multiply
    from igs_tpu.core.quaternion import quat_multiply, quat_normalize

    rng = np.random.RandomState(12)
    a = rng.normal(size=(50, 4)).astype(np.float32)
    b = rng.normal(size=(50, 4)).astype(np.float32)
    want = quaternion_multiply(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = quat_multiply(quat_normalize(jnp.asarray(a)), quat_normalize(jnp.asarray(b)))
    allclose(want, got, atol=1e-6, name="quaternion_multiply")


def test_build_rotation_vs_scipy():
    """quat_to_rotmat vs scipy (independent implementation; the reference's
    build_rotation hardcodes device='cuda' so can't run here — scipy uses
    the same wxyz→R convention modulo its xyzw storage order)."""
    from scipy.spatial.transform import Rotation
    from igs_tpu.core.quaternion import quat_to_rotmat

    rng = np.random.RandomState(13)
    q = rng.normal(size=(50, 4)).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    got = quat_to_rotmat(jnp.asarray(q, dtype=jnp.float32))
    allclose(want, got, atol=1e-5, name="build_rotation")


def test_projection_matrix_parity():
    from igs.utils.graphics_utils import getProjectionMatrix
    from igs_tpu.core.camera import get_projection_matrix

    want = getProjectionMatrix(0.01, 100.0, 0.9, 0.8).numpy()
    got = get_projection_matrix(0.01, 100.0, 0.9, 0.8)
    allclose(want, got, atol=1e-6, name="projection_matrix")


def test_camera_parity():
    """Camera.from_c2w full_proj/center vs the reference Camera (gs.py:90-113)."""
    from igs.models.gs import Camera as RefCam
    from igs_tpu.core.camera import Camera

    c2w = _look_at_cameras(1, 1)[0, 0]
    ref = RefCam.from_c2w(torch.from_numpy(c2w), (0.9, 0.8), (64, 64))
    cam = Camera.from_c2w(jnp.asarray(c2w), (0.9, 0.8), (64, 64))
    allclose(ref.world_view_transform.numpy(), cam.world_view_transform,
             atol=1e-5, name="world_view_transform")
    allclose(ref.full_proj_transform.numpy(), cam.full_proj_transform,
             atol=1e-5, name="full_proj_transform")
    allclose(ref.camera_center.numpy(), cam.camera_center, atol=1e-5,
             name="camera_center")


def test_ssim_parity():
    from igs.utils.loss_utils import ssim as ref_ssim
    from igs_tpu.train.losses import ssim

    rng = np.random.RandomState(14)
    a = rng.uniform(0, 1, (3, 48, 48)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    want_mean, want_map = ref_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got_mean, got_map = ssim(jnp.asarray(a), jnp.asarray(b))
    allclose(want_mean.numpy(), got_mean, atol=1e-5, name="ssim mean")
    allclose(want_map.numpy(), got_map, atol=1e-4, name="ssim map")


@pytest.mark.parametrize("local_ray", [True, False])
def test_forward_v3_end_to_end_parity(local_ray):
    """Reference IGS._forward_v3 (IGS.py:114-181) vs AGMNet, through the
    deformed Gaussians (rasterization stubbed out — the rasterizer has its
    own oracle parity suite in test_rasterize/test_pallas_blend).

    local_ray=False is the SHIPPED training path (configs/train.yaml:74):
    condition3D routes through ray_to_plucker + rsh_cart_3 (IGS.py:195-199)
    — the 33-channel ModLN condition."""
    from igs.IGS import IGS as RefIGS
    from igs.models.gs import GaussianModel as RefGM
    from igs_tpu.core.gaussians import Gaussians
    from igs_tpu.core.quaternion import quat_normalize
    from igs_tpu.models.agm import AGMNet
    from igs_tpu.models.renderer import interpolate_residuals
    from igs_tpu.ops.anchors import AnchorState

    cfg = {
        "backbone_cls": "igs.models.unimatch.unimatch.UniMatch",
        "backbone": {
            "feature_channels": 128, "num_scales": 1, "upsample_factor": 8,
            "as_backbone": True, "pretrained_model_name_or_path": "",
            "transformer_cls":
                "igs.models.unimatch.transformer.FeatureTransformer",
            "transformer": {"num_layers": 6, "d_model": 128, "nhead": 1,
                            "ffn_dim_expansion": 4},
        },
        "transformer_cls":
            "igs.models.unimatch.transformer.FeatureTransformerMy",
        "transformer": {"num_layers": 1, "d_model": 128, "nhead": 1,
                        "ffn_dim_expansion": 4},
        "triplane_encoder_cls": "igs.models.grid_encoder.GridEncoder",
        "triplane_encoder": {
            "plane_size": 48, "in_channels": 128, "out_channels": 128,
            "combine_type": "mask", "grid_type": "irgrid",
            "proj_type": "perspective_projection", "use_gs_emb": False,
            "res_cat": False,
            "unet_cls": "igs.models.transformers.Transformer1D",
            "unet": {"in_channels": 128, "num_attention_heads": 8,
                     "attention_head_dim": 64, "num_layers": 4},
        },
        "renderer_cls": "igs.models.gs.GS3DRenderer",
        "renderer": {
            "sh_degree": 3, "radius": 0.6, "in_channels": 128,
            "mlp_network_config": {"n_neurons": 128, "n_hidden_layers": 2,
                                   "activation": "silu"},
            "neighbor_size": 8, "xyz_offset": True, "restrict_offset": True,
            "use_rgb": False, "clip_scaling": 0.2, "xyz_scale": 0.02,
            "feature_mode": "irgrid",
            "feature_channels": {"xyz": 3, "rotation": 4},
        },
        "up_sample": True, "use_condition3d": True, "local_ray": local_ray,
        "fine_tune_backbone": True,
    }
    ref = RefIGS(cfg).eval()
    # heads are zero-init in both frameworks; randomize so the test can
    # actually catch conversion bugs in the output layers
    gen = torch.Generator().manual_seed(20)
    with torch.no_grad():
        for layer in ref.render.out_layers:
            layer.weight.copy_(torch.randn(layer.weight.shape, generator=gen)
                               * 0.05)

    # rasterization is out of scope here
    ref.render.forward_single_view = \
        lambda *a, **k: {"stub": torch.zeros(1)}

    rng = np.random.RandomState(21)
    b, v, hh = 1, 2, 64
    n = 400
    feat_res = 16  # 64/8*2 (up_sample)

    batch_np = {
        "cur_images_input": rng.uniform(0, 1, (b, v, 3, hh, hh)).astype(np.float32),
        "next_images_input": rng.uniform(0, 1, (b, v, 3, hh, hh)).astype(np.float32),
        "depth": rng.uniform(1, 5, (b, v, hh, hh)).astype(np.float32),
        "local_rays": rng.normal(size=(b, feat_res, feat_res, 3)).astype(np.float32),
        # world [origin | dir] rays per input view (data.py:236-242);
        # unnormalized dirs — ray_to_plucker must normalize identically
        "rays": rng.normal(size=(b, v, feat_res, feat_res, 6)).astype(np.float32),
        "FOV": np.full((b, 2), 0.9, np.float32),
        "c2w_input": _look_at_cameras(b, v),
        "c2w_output": _look_at_cameras(b, 1),
        "resolution": np.full((b, 2), hh, np.int64),
        "background_color": np.zeros((b, 3), np.float32),
        "radius": np.full((b,), 0.6, np.float32),
        "bounding_box": np.array([[[-0.8, -0.8, -0.8], [0.8, 0.8, 0.8]]],
                                 np.float32),
    }
    xyz = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)  # some out of bbox
    opacity = rng.normal(size=(n, 1)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    scaling = rng.uniform(-4, -2, (n, 3)).astype(np.float32)
    shs = 0.3 * rng.normal(size=(n, 16, 3)).astype(np.float32)

    ref_gs = RefGM(
        xyz=torch.from_numpy(xyz), opacity=torch.from_numpy(opacity),
        rotation=torch.from_numpy(rot), scaling=torch.from_numpy(scaling),
        shs=torch.from_numpy(shs))
    batch_t = {k: torch.from_numpy(v2) for k, v2 in batch_np.items()}
    batch_t["gs"] = [ref_gs]

    with torch.no_grad():
        out = ref(batch_t)
    pre = out["pre_compute_states"]
    ref_triplane = out["motion_feature"].numpy()
    ref_def = out["3dgs"][0]

    # ---- my side: same anchor state (scattered to dense N-length layout)
    midx = pre["masks_precompute"][0].numpy()  # index array (torch.where)
    mask = np.zeros(n, bool)
    mask[midx] = True
    m = len(midx)
    anchor_points = pre["anchor_points"][0].numpy()
    w_dense = np.zeros((n, 8), np.float32)
    nb_dense = np.zeros((n, 8), np.int32)
    w_dense[midx] = pre["weights"].numpy().reshape(m, 8)
    nb_dense[midx] = pre["neighbor"][1].numpy().reshape(m, 8)
    state = AnchorState(
        anchor_points=jnp.asarray(anchor_points)[None],
        anchor_idx=jnp.asarray(pre["fps_idx_precompute"][0].astype(np.int32))[None],
        mask=jnp.asarray(mask)[None],
        weights=jnp.asarray(w_dense)[None],
        neighbor_idx=jnp.asarray(nb_dense)[None],
    )

    # params: GMFlow conversion for the frozen backbone + IGS conversion
    # for the trained modules (the reference strips backbone keys from its
    # state_dict exactly like a shipped checkpoint — IGS.py:105-111)
    bb = tc.convert_gmflow_checkpoint(
        {k: v2.detach().numpy() for k, v2 in ref.backbone.state_dict().items()})
    assert not bb["unmapped"], bb["unmapped"]
    head = tc.convert_igs_checkpoint(
        {k: v2.detach().numpy() for k, v2 in ref.state_dict().items()})
    assert not head["unmapped"], head["unmapped"]
    params = tc.fix_mlp_output_layer(head["params"])
    params["backbone"] = bb["params"]

    model = AGMNet(local_ray=local_ray)
    batch_j = {k: jnp.asarray(v2) for k, v2 in batch_np.items()}
    gaussians = Gaussians.create(xyz, opacity, rot, scaling, shs)

    def partial_forward(m_, batch, anchor_state):
        bb_, vv, c, h_, w_ = batch["cur_images_input"].shape
        cur = batch["cur_images_input"].reshape(-1, c, h_, w_)
        nxt = batch["next_images_input"].reshape(-1, c, h_, w_)
        motion = m_.motion_features(cur, nxt)
        ray_key = "local_rays" if m_.local_ray else "rays"
        motion = m_.condition3d(motion, batch[ray_key], batch["depth"])
        triplane = m_.triplane_encoder(
            motion, anchor_state.anchor_points, batch["FOV"],
            batch["c2w_input"])
        feats = jax.vmap(interpolate_residuals)(triplane, anchor_state)
        return triplane, m_.decoder(feats)

    triplane, residuals = model.apply(
        {"params": params}, batch_j, state, method=partial_forward)
    allclose(ref_triplane, triplane, atol=5e-4, name="v3 triplane")

    gdef = gaussians.deform(
        res_xyz=residuals["xyz"][0],
        res_rotation=residuals["rotation"][0],
        mask=state.mask[0],
    )
    allclose(ref_def.xyz.numpy(), gdef.xyz, atol=5e-4, name="v3 deformed xyz")
    # the reference normalizes both quaternions before multiplying
    # (general_utils.py:177-202); we multiply raw and normalize at
    # activation time — identical after normalization since
    # ‖q1⊗q2‖ = ‖q1‖·‖q2‖
    allclose(
        torch.nn.functional.normalize(ref_def.rotation).numpy(),
        quat_normalize(gdef.rotation), atol=5e-4, name="v3 deformed rot")


def test_lpips_parity():
    """flax LPIPS vs the reference lpipsPyTorch forward (modules/lpips.py)
    with random-init VGG16 features + linear heads (torchvision stubbed to
    the public VGG16 feature architecture; pretrained weights need network access
    the test env doesn't have — the MATH and weight conversion are what's
    verified)."""
    sys.path.insert(0, REF_ROOT := "/root/reference")
    from lpipsPyTorch.modules.lpips import LPIPS as RefLPIPS
    from lpipsPyTorch.modules.networks import VGG16, LinLayers

    from igs_tpu.train.lpips import LPIPS, load_torch_lpips

    torch.manual_seed(30)
    net = VGG16()  # stubbed torchvision → random weights
    lin = LinLayers(net.n_channels_list)
    with torch.no_grad():
        for p in lin.parameters():
            p.copy_(torch.rand(p.shape) * 0.1)
    ref = RefLPIPS.__new__(RefLPIPS)
    torch.nn.Module.__init__(ref)
    ref.net = net
    ref.lin = lin

    rng = np.random.RandomState(31)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    model = LPIPS()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    sd = {f"net.{k}": v.numpy() for k, v in net.state_dict().items()}
    sd.update({f"lin.{k}": v.numpy() for k, v in lin.state_dict().items()})
    params, loaded = load_torch_lpips(params, sd)
    assert loaded == 18, loaded  # 13 convs + 5 lin heads
    got = model.apply(params, jnp.asarray(x), jnp.asarray(y))
    # ref returns summed per-stage spatial means with keepdim layout;
    # ours returns (B,) — compare the per-batch totals. NOTE the reference
    # sums res over dim 0 which MIXES the batch with stages when B>1 —
    # compare per-item by running B=1 slices.
    for i in range(2):
        with torch.no_grad():
            w1 = ref(torch.from_numpy(x[i:i+1]),
                     torch.from_numpy(y[i:i+1])).numpy()
        g1 = model.apply(params, jnp.asarray(x[i:i+1]), jnp.asarray(y[i:i+1]))
        np.testing.assert_allclose(float(w1.sum()), float(g1[0]),
                                   rtol=1e-4, atol=1e-5)
