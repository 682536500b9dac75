"""Video exporters (SaverMixin parity, igs/utils/saving.py:236-315)."""

import io
import os
import struct

import numpy as np

from igs_tpu.utils.saving import save_video, save_video_avi


def _walk_riff(data, pos, end):
    found = []
    while pos < end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc == b"LIST":
            found.append(b"LIST:" + data[pos + 8:pos + 12])
            found += _walk_riff(data, pos + 12, pos + 8 + size)
        else:
            found.append(fourcc)
        pos += 8 + size + (size % 2)
    return found


def test_mjpeg_avi_structure_and_frames(tmp_path):
    frames = [np.full((32, 48, 3), i / 6.0) for i in range(6)]
    p = save_video_avi(str(tmp_path / "t.avi"), frames, fps=10)
    blob = open(p, "rb").read()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8
    chunks = _walk_riff(blob, 12, len(blob))
    assert b"LIST:hdrl" in chunks and b"LIST:movi" in chunks
    assert b"idx1" in chunks
    assert chunks.count(b"00dc") == 6

    # every frame payload is a decodable JPEG at the right size
    from PIL import Image

    pos = blob.find(b"movi") + 4
    for i in range(6):
        assert blob[pos:pos + 4] == b"00dc"
        sz = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        img = np.asarray(Image.open(io.BytesIO(blob[pos + 8:pos + 8 + sz])))
        assert img.shape == (32, 48, 3)
        expected = np.clip(i / 6.0, 0, 1) * 255
        assert abs(float(img.mean()) - expected) < 4  # jpeg tolerance
        pos += 8 + sz + (sz % 2)


def test_save_video_mp4_falls_back_to_playable(tmp_path):
    """Without an ffmpeg backend, .mp4 requests still yield a playable
    file (the MJPEG AVI) and return its path."""
    frames = [np.random.RandomState(i).rand(16, 16, 3) for i in range(3)]
    p = save_video(str(tmp_path / "video.mp4"), frames, fps=5)
    assert os.path.exists(p)
    assert p.endswith((".mp4", ".avi"))
    blob = open(p, "rb").read(12)
    assert blob[:4] in (b"RIFF", b"\x00\x00\x00\x18", b"\x00\x00\x00\x1c") \
        or len(blob) > 0


def test_save_video_gif(tmp_path):
    frames = [np.random.RandomState(i).rand(16, 16, 3) for i in range(3)]
    p = save_video(str(tmp_path / "video.gif"), frames, fps=5)
    assert open(p, "rb").read(3) == b"GIF"
