"""CLI driver smoke tests: train_agm + infer_stream on the synthetic scene.

Exercises the full config → builders → dataset → model → driver wiring the
way a user would invoke it (tiny dims so it runs on the CPU mesh).
"""

import json
import os
import sys

import numpy as np
import pytest

from igs_tpu.data.synthetic import build_synthetic_scene



pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_scene"))
    return build_synthetic_scene(
        root, n_frames=3, n_cams=14, n_gaussians=192,
        height=64, width=64, interval=2,
    )


def _write_cfg(path, scene, workspace):
    cfg = f"""
data:
  data_cls: igs.data.data.N3dDataset
  data:
    background_color: [0.0, 0.0, 0.0]
    data_path: {scene['pairs']}
    root_dir: {scene['root']}
    gs_mode: 3dgs_rade
    iter: 6000_compress
    num_input_views: 4
    num_output_views: 5
    input_height: 64
    input_width: 64
    output_height: 64
    output_width: 64
    up_sample: True
    scene_type: n3d
    depth_id_offset: 0
    start_gs_path: {scene['start_gs_path']}
opt:
  lr: 1e-3
  batch_size: 1
  num_epochs: 1
  eval_batch_size: 2
  refine_gs: True
  refine_iterations: 2
  use_densify: False
  max_num: 256
  anchor_size: 32
  neighbor_k: 4
  workspace: {workspace}
  resume: ""
  resume_cfg: ""
  training_lr:
    position_lr_init: 0.0016
  refine_item:
    no_shs: False
system:
  up_sample: True
  local_ray: True
  backbone:
    feature_channels: 32
    pretrained_model_name_or_path: ""
    transformer:
      num_layers: 1
  transformer:
    num_layers: 1
  triplane_encoder:
    unet:
      num_attention_heads: 2
      attention_head_dim: 16
      num_layers: 1
"""
    with open(path, "w") as f:
        f.write(cfg)


def test_train_agm_cli(scene, tmp_path, monkeypatch):
    cfg_path = str(tmp_path / "train.yaml")
    ws = str(tmp_path / "ws_train")
    _write_cfg(cfg_path, scene, ws)
    import train_agm

    monkeypatch.setattr(sys, "argv", [
        "train_agm.py", "--config", cfg_path, "--max-steps", "2",
        "--capacity", "256",
    ])
    train_agm.main()
    assert os.path.exists(os.path.join(ws, "log.jsonl"))
    rec = json.loads(open(os.path.join(ws, "log.jsonl")).readline())
    assert np.isfinite(rec["loss"])
    # checkpoint written
    assert any("params.msgpack" in f for _, _, fs in os.walk(ws) for f in fs)


def test_infer_stream_cli(scene, tmp_path, monkeypatch):
    cfg_path = str(tmp_path / "demo.yaml")
    ws = str(tmp_path / "ws_stream")
    _write_cfg(cfg_path, scene, ws)
    import infer_stream

    monkeypatch.setattr(sys, "argv", [
        "infer_stream.py", "--config", cfg_path, "--max-batches", "1",
        "data.data_cls=igs.data.infer_data.N3dDataset",
    ])
    infer_stream.main()
    results = json.load(open(os.path.join(ws, "results.json")))
    assert len(results["psnr"]) == 2
    assert results["avg"] > 5.0


def test_spmd_sweep_artifacts_feed_datasets(scene, tmp_path, monkeypatch):
    """VERDICT r3 item 5 acceptance: an SPMD frame sweep's artifacts are
    consumed by the datasets unchanged. Runs build_frame0 --spmd on two
    synthetic frames (tiny iters) into a fresh gs_mode, then loads the
    result through BOTH the train and the infer dataset."""
    import build_frame0

    root = scene["root"]
    scene_dir = os.path.join(root, scene["scene_name"])
    monkeypatch.setattr(sys, "argv", [
        "build_frame0.py", "--scene", scene_dir, "--images", "images_512",
        "--gs-mode", "3dgs_sweep", "--iterations", "12",
        "--capacity", "256", "--frames", "0", "1", "--spmd",
        "--prune-percent", "0.25", "--finetune-iters", "4",
    ])
    build_frame0.main()

    for f in (0, 1):
        base = os.path.join(scene_dir, f"colmap_{f}", "3dgs_sweep")
        assert os.path.exists(os.path.join(
            base, "point_cloud", "iteration_12_compress", "point_cloud.ply"))
        assert os.path.exists(os.path.join(base, "cameras.json"))
        assert os.path.exists(os.path.join(
            base, "train", "ours_12_compress", "gt", "00000.png"))
        assert os.path.exists(os.path.join(
            base, "train", "ours_12_compress", "depth_expected_mm",
            "00000.png"))

    data_cfg = {
        "background_color": [0.0, 0.0, 0.0],
        "data_path": scene["pairs"],
        "root_dir": root,
        "scene_type": "n3d",
        "depth_id_offset": 0,
        "gs_mode": "3dgs_sweep",
        "iter": "12_compress",
        "input_height": 64, "input_width": 64,
        "output_height": 64, "output_width": 64,
        "num_input_views": 4, "num_output_views": 5,
        "start_gs_path": os.path.join(
            scene_dir, "colmap_0", "3dgs_sweep", "point_cloud",
            "iteration_12_compress", "point_cloud.ply"),
        "up_sample": True,
    }
    from igs_tpu.data.dataset import N3dDataset
    from igs_tpu.data.infer_data import N3dInferDataset

    train_ds = N3dDataset(data_cfg, training=True)
    item = train_ds[0]
    assert np.isfinite(item["depth"]).all()
    infer_ds = N3dInferDataset(data_cfg, training=False)
    it0 = infer_ds[0]
    assert it0["gs_path"].endswith("point_cloud.ply")
    assert np.isfinite(it0["depth"]).all()
