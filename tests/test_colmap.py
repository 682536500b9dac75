"""COLMAP binary parser tests (synthetic .bin files)."""

import os
import struct

import numpy as np

from igs_tpu.data.colmap import (
    colmap_to_cameras_json, compute_aabb, qvec2rotmat,
    read_cameras_bin, read_images_bin, read_points3d_bin,
)


def _write_cameras_bin(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))


def _write_images_bin(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate([b"cam00.png", b"cam01.png"]):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0, 0, 0))
            f.write(struct.pack("<3d", 0.1 * i, 0.2, 3.0))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            f.write(b"\x00" * 48)


def _write_points3d_bin(path, pts):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(b"\x00" * 8)


def test_full_sparse_roundtrip(tmp_path):
    sparse = str(tmp_path)
    _write_cameras_bin(os.path.join(sparse, "cameras.bin"))
    _write_images_bin(os.path.join(sparse, "images.bin"))
    pts = np.random.RandomState(0).uniform(-2, 2, (100, 3))
    _write_points3d_bin(os.path.join(sparse, "points3D.bin"), pts)

    cams = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    assert cams[1].width == 640 and cams[1].params[0] == 500.0

    images = read_images_bin(os.path.join(sparse, "images.bin"))
    assert len(images) == 2
    assert images[1].name == "cam00.png"

    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(xyz, pts)
    assert (rgb[0] == [10, 20, 30]).all()

    cj = colmap_to_cameras_json(sparse)
    assert len(cj) == 2
    assert cj[0]["img_name"] == "cam00"
    assert cj[0]["fx"] == 500.0
    # identity rotation, t=(0,.2,3) → position = -t
    np.testing.assert_allclose(cj[0]["position"], [0, -0.2, -3.0], atol=1e-9)

    bbox = compute_aabb(xyz)
    assert np.asarray(bbox).shape == (2, 3)
    assert (np.asarray(bbox[0]) < np.asarray(bbox[1])).all()


def test_qvec2rotmat_identity():
    np.testing.assert_allclose(
        qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))


def test_colmap_db_roundtrip(tmp_path):
    """COLMAP sqlite writer: schema + rows readable back."""
    import sqlite3

    from igs_tpu.data.colmap_db import (
        ColmapDB, rotmat2qvec, seed_known_poses_db, write_manual_model)

    r = np.eye(3)
    q = rotmat2qvec(r)
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-12)
    # round-trip a real rotation through qvec2rotmat
    from igs_tpu.data.colmap import qvec2rotmat

    rng = np.random.RandomState(0)
    a = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(a)
    rot = u @ vt
    if np.linalg.det(rot) < 0:
        rot[:, 0] *= -1
    np.testing.assert_allclose(qvec2rotmat(rotmat2qvec(rot)), rot, atol=1e-9)

    cams = [{"camera_id": 1, "model": "PINHOLE", "width": 640, "height": 480,
             "params": [500.0, 500.0, 320.0, 240.0]}]
    imgs = [{"image_id": 1, "camera_id": 1, "name": "cam00.png",
             "qvec": q, "tvec": np.array([0.1, 0.2, 0.3])}]
    db_path = str(tmp_path / "input.db")
    seed_known_poses_db(db_path, cams, imgs)
    conn = sqlite3.connect(db_path)
    rows = conn.execute("SELECT model, width, height FROM cameras").fetchall()
    assert rows == [(1, 640, 480)]
    name, qw, tx = conn.execute(
        "SELECT name, prior_qw, prior_tx FROM images").fetchone()
    assert name == "cam00.png" and qw == 1.0 and abs(tx - 0.1) < 1e-12
    conn.close()

    write_manual_model(str(tmp_path / "manual"), cams, imgs)
    lines = open(tmp_path / "manual" / "cameras.txt").read()
    assert "PINHOLE 640 480" in lines
    assert (tmp_path / "manual" / "points3D.txt").read_text() == ""


def test_transforms_reader(tmp_path):
    """Blender transforms_*.json reader (dataset_readers.py:249-289)."""
    import json

    from PIL import Image

    from igs_tpu.data.colmap import (
        load_transforms_image, read_transforms_cameras)

    img = np.zeros((8, 10, 4), np.uint8)
    img[..., 0] = 200  # red
    img[:, :5, 3] = 255  # left half opaque, right transparent
    Image.fromarray(img).save(tmp_path / "r_0.png")
    c2w = np.eye(4)
    c2w[2, 3] = 2.0
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)

    cams = read_transforms_cameras(str(tmp_path), "transforms_train.json")
    assert len(cams) == 1
    cam = cams[0]
    assert cam.width == 10 and cam.height == 8
    # fovy from aspect: focal = w/(2 tan(fovx/2))
    focal = 10 / (2 * np.tan(0.4))
    np.testing.assert_allclose(cam.fovy, 2 * np.arctan(8 / (2 * focal)),
                               rtol=1e-6)
    # OpenGL→COLMAP flip: c2w z column negated → w2c R diag(1,-1,-1)
    np.testing.assert_allclose(cam.r, np.diag([1.0, -1.0, -1.0]), atol=1e-6)

    rgb = load_transforms_image(cam, white_background=True)
    np.testing.assert_allclose(rgb[0, 0], [200 / 255, 0, 0], atol=1e-6)
    np.testing.assert_allclose(rgb[0, 9], [1, 1, 1], atol=1e-6)  # bg
