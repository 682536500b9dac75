"""Native data-plane (native/igsio.cpp) vs the pure-Python fallback.

The shared library is NOT tracked in git (it's a build artifact); the
fixture builds it with ``make -C native`` and skips cleanly if no
toolchain is available. Parity targets: the PIL PNG decoder and the
numpy PLY reader in igs_tpu/data/ply.py.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(REPO, "native", "libigsio.so")
    if not os.path.exists(so):
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        r = subprocess.run(
            ["make", "-C", os.path.join(REPO, "native")],
            capture_output=True, text=True,
        )
        if r.returncode != 0 or not os.path.exists(so):
            pytest.skip(f"native build failed: {r.stderr[-400:]}")
    # reset the module-level cache so a lib built mid-session is picked up
    from igs_tpu.data import native

    native._TRIED = False
    native._LIB = None
    if not native.native_available():
        pytest.skip("libigsio.so built but not loadable")
    return native


def test_png_batch_matches_pil(native_lib, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        img = rng.randint(0, 256, (24, 32, 3), np.uint8)
        p = tmp_path / f"im{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    out = native_lib.load_images_nchw(paths, 24, 32)
    assert out.shape == (3, 3, 24, 32)
    for i, p in enumerate(paths):
        ref = np.asarray(Image.open(p)).astype(np.float32) / 255.0
        np.testing.assert_allclose(
            out[i], ref.transpose(2, 0, 1), atol=1e-6)


def test_png_16bit_depth(native_lib, tmp_path):
    """Depth PNGs are 16-bit single channel (depth_expected_mm)."""
    from PIL import Image

    rng = np.random.RandomState(1)
    depth = rng.randint(0, 65536, (16, 16), np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(depth).save(p)
    out = native_lib.load_images_nchw([p], 16, 16, channels=1, scale=1.0)
    ref = depth.astype(np.float32)
    np.testing.assert_allclose(out[0, 0], ref, atol=1e-3)


def test_ply_read_matches_numpy(native_lib, tmp_path):
    from igs_tpu.data.ply import read_ply_vertices

    rng = np.random.RandomState(2)
    n = 100
    fields = {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "opacity": rng.normal(size=n).astype(np.float32),
    }
    p = str(tmp_path / "pts.ply")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {c}\n" for c in fields)
        + "end_header\n"
    )
    rec = np.rec.fromarrays(list(fields.values()), names=list(fields))
    with open(p, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())

    buf = native_lib.read_ply_fast(p)
    assert buf is not None and len(buf) == n
    ref = read_ply_vertices(p)
    for k, v in fields.items():
        np.testing.assert_allclose(buf[k], v, atol=0)
        np.testing.assert_allclose(ref[k], v, atol=0)
