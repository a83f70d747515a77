"""Native (C++) COLMAP parser vs the pure-Python readers."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from easygaussiansplatting_tpu.data import colmap, native_loader

ROOT = Path(__file__).resolve().parents[1]


def _ensure_built():
    if native_loader.available():
        return True
    r = subprocess.run(["make", "-C", str(ROOT / "native")], capture_output=True)
    native_loader._LIB_TRIED = False  # re-probe
    return r.returncode == 0 and native_loader.available()


pytestmark = pytest.mark.skipif(not _ensure_built(), reason="native lib unavailable")


def _fixture(tmp_path, rng, n_imgs=4, n_pts=200):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 59.0, 32.0, 24.0])),
        2: colmap.ColmapCamera(2, "SIMPLE_RADIAL", 80, 60, np.array([70.0, 40.0, 30.0, 0.01])),
    }
    colmap.write_cameras_binary(sparse / "cameras.bin", cams)
    images = {}
    for i in range(1, n_imgs + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1 + i % 2, f"img_{i:03d}.png")
    colmap.write_images_binary(sparse / "images.bin", images)
    xyz = rng.normal(size=(n_pts, 3))
    rgb = (rng.uniform(size=(n_pts, 3)) * 255).astype(np.uint8)
    err = rng.uniform(size=n_pts)
    colmap.write_points3d_binary(sparse / "points3D.bin", xyz, rgb, err)
    return sparse


def test_native_matches_python(tmp_path, rng):
    sparse = _fixture(tmp_path, rng)

    c_py = colmap.read_cameras_binary(sparse / "cameras.bin")
    c_nat = native_loader.read_cameras_binary(sparse / "cameras.bin")
    assert c_py.keys() == c_nat.keys()
    for k in c_py:
        assert c_py[k].model == c_nat[k].model
        assert (c_py[k].width, c_py[k].height) == (c_nat[k].width, c_nat[k].height)
        np.testing.assert_allclose(c_py[k].params, c_nat[k].params)

    i_py = colmap.read_images_binary(sparse / "images.bin")
    i_nat = native_loader.read_images_binary(sparse / "images.bin")
    assert i_py.keys() == i_nat.keys()
    for k in i_py:
        assert i_py[k].name == i_nat[k].name
        assert i_py[k].camera_id == i_nat[k].camera_id
        np.testing.assert_allclose(i_py[k].qvec, i_nat[k].qvec)
        np.testing.assert_allclose(i_py[k].tvec, i_nat[k].tvec)

    x1, r1, e1 = colmap.read_points3d_binary(sparse / "points3D.bin")
    x2, r2, e2 = native_loader.read_points3d_binary(sparse / "points3D.bin")
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(e1, e2)


def test_dataset_uses_native(tmp_path, rng):
    from PIL import Image

    from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset

    sparse = _fixture(tmp_path, rng, n_imgs=2)
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    for i in (1, 2):
        Image.fromarray((rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)).save(
            imgdir / f"img_{i:03d}.png"
        )
    # camera 2 images don't exist for id 2's size; use load_images=False
    ds_nat = load_colmap_dataset(tmp_path, load_images=False, use_native=True, cache_points=False)
    ds_py = load_colmap_dataset(tmp_path, load_images=False, use_native=False, cache_points=False)
    assert len(ds_nat) == len(ds_py)
    np.testing.assert_allclose(ds_nat.gs["pw"], ds_py.gs["pw"])
    np.testing.assert_allclose(
        np.asarray(ds_nat.cameras[0].Rcw), np.asarray(ds_py.cameras[0].Rcw)
    )


def test_corrupt_points3d_rejected(tmp_path):
    """A bogus record count must fail cleanly, not allocate terabytes."""
    p = tmp_path / "points3D.bin"
    p.write_bytes((1 << 50).to_bytes(8, "little"))  # absurd count, no records
    with pytest.raises(IOError):
        native_loader.read_points3d_binary(p)
    # truncated mid-record
    p.write_bytes((5).to_bytes(8, "little") + b"\x00" * 20)
    with pytest.raises(IOError):
        native_loader.read_points3d_binary(p)


def test_stale_so_not_loaded(tmp_path, monkeypatch):
    """native_loader must not prefer a .so older than its source."""
    src = tmp_path / "colmap_reader.cc"
    so = tmp_path / "libegs_native.so"
    so.write_bytes(b"not a real lib")
    src.write_text("// newer source")
    import os

    os.utime(so, (0, 0))  # so far older than src
    assert not native_loader._fresh(so)


def test_corrupt_images_and_cameras_rejected(tmp_path):
    """Bogus counts / truncated records in images.bin and cameras.bin fail
    cleanly (count_plausible + malloc checks in colmap_reader.cc)."""
    p = tmp_path / "images.bin"
    p.write_bytes((1 << 50).to_bytes(8, "little"))
    with pytest.raises(IOError):
        native_loader.read_images_binary(p)
    p.write_bytes((3).to_bytes(8, "little") + b"\x00" * 30)  # truncated
    with pytest.raises(IOError):
        native_loader.read_images_binary(p)

    c = tmp_path / "cameras.bin"
    c.write_bytes((1 << 50).to_bytes(8, "little"))
    with pytest.raises(IOError):
        native_loader.read_cameras_binary(c)
    c.write_bytes((2).to_bytes(8, "little") + b"\x00" * 20)
    with pytest.raises(IOError):
        native_loader.read_cameras_binary(c)
