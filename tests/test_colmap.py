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
