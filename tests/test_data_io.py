"""Data / I-O layer tests: PLY + npy roundtrips, COLMAP binary roundtrip,
SfM initial-gaussian construction, dataset assembly."""

import numpy as np
import pytest

from easygaussiansplatting_tpu.data import colmap, gau_io
from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset, points_to_gaussians


def _random_gs(rng, n=17, sh_dim=48):
    pws = rng.normal(size=(n, 3)).astype(np.float32)
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.3).astype(np.float32)
    alphas = rng.uniform(0.05, 0.95, size=n).astype(np.float32)
    shs = rng.normal(size=(n, sh_dim)).astype(np.float32)
    return gau_io.arrays_to_recarray(pws, rots.astype(np.float32), scales, alphas, shs)


def test_ply_roundtrip(tmp_path, rng):
    gs = _random_gs(rng)
    p = tmp_path / "gs.ply"
    gau_io.save_ply(p, gs)
    back = gau_io.load_ply(p)
    np.testing.assert_allclose(back["pw"], gs["pw"], atol=1e-6)
    np.testing.assert_allclose(back["rot"], gs["rot"], atol=1e-6)
    np.testing.assert_allclose(back["scale"], gs["scale"], rtol=1e-5)
    np.testing.assert_allclose(back["alpha"], gs["alpha"], atol=1e-6)
    np.testing.assert_allclose(back["sh"], gs["sh"], atol=1e-6)


def test_ply_degree0_roundtrip(tmp_path, rng):
    gs = _random_gs(rng, sh_dim=3)
    p = tmp_path / "gs0.ply"
    gau_io.save_ply(p, gs)
    back = gau_io.load_ply(p)
    assert back["sh"].shape[1] == 3
    np.testing.assert_allclose(back["sh"], gs["sh"], atol=1e-6)


def test_ply_ascii_mixed_dtypes(tmp_path):
    """ASCII PLY with uchar color properties and a single vertex: both the
    1-D loadtxt shape and the integer property dtype must parse."""
    header = (
        "ply\nformat ascii 1.0\nelement vertex 1\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property float f_dc_0\nproperty float f_dc_1\nproperty float f_dc_2\n"
        "property float opacity\n"
        "property float scale_0\nproperty float scale_1\nproperty float scale_2\n"
        "property float rot_0\nproperty float rot_1\nproperty float rot_2\n"
        "property float rot_3\nend_header\n"
    )
    row = "1.0 2.0 3.0 255 128 0 0.1 0.2 0.3 0.0 -1.0 -1.0 -1.0 1 0 0 0\n"
    p = tmp_path / "ascii.ply"
    p.write_bytes((header + row).encode())
    gs = gau_io.load_ply(p)
    assert len(gs) == 1
    np.testing.assert_allclose(gs["pw"][0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(gs["alpha"][0], 0.5)  # sigmoid(0)
    np.testing.assert_allclose(gs["scale"][0], np.exp(-1.0), rtol=1e-6)


def test_npy_dispatch(tmp_path, rng):
    gs = _random_gs(rng)
    p = tmp_path / "gs.npy"
    gau_io.save_gs(p, gs)
    back = gau_io.load_gs(p)
    np.testing.assert_array_equal(back["pw"], gs["pw"])


def test_pool_save_load_roundtrip(tmp_path, rng):
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays

    gs = _random_gs(rng, n=10)
    a = gau_io.recarray_to_arrays(gs)
    pool = pool_from_arrays(a["pws"], a["rots"], a["scales"], a["alphas"], a["shs"], capacity=16)
    p = tmp_path / "pool.npy"
    gau_io.save_pool(p, pool)
    back = np.load(p)
    assert len(back) == 10  # only alive rows
    np.testing.assert_allclose(back["pw"], a["pws"], atol=1e-6)
    np.testing.assert_allclose(back["alpha"], a["alphas"], atol=1e-5)
    pool2 = gau_io.load_pool(p)
    np.testing.assert_allclose(np.asarray(pool2.pws), a["pws"], atol=1e-6)


def test_quaternion_matrix_roundtrip(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = gau_io.quaternion_to_matrix(q)
    q2 = gau_io.matrix_to_quaternion(R)
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_rotate_gaussians(rng):
    gs = _random_gs(rng, n=8)
    T = gau_io.quaternion_to_matrix(
        (lambda v: v / np.linalg.norm(v))(rng.normal(size=4))[None]
    )[0]
    out = gau_io.rotate_gaussians(T, gs)
    np.testing.assert_allclose(out["pw"], (T @ gs["pw"].T).T, atol=1e-5)
    # rotating covariance: R_new = T R  => Sigma_new = T Sigma T^T
    R_old = gau_io.quaternion_to_matrix(gs["rot"])
    R_new = gau_io.quaternion_to_matrix(out["rot"])
    np.testing.assert_allclose(R_new, T @ R_old, atol=1e-5)


def _write_fake_colmap(tmp_path, rng, n_imgs=3, n_pts=50, w=64, h=48):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", w, h, np.array([60.0, 60.0, w / 2, h / 2]))
    }
    colmap.write_cameras_binary(sparse / "cameras.bin", cams)
    images = {}
    from PIL import Image

    for i in range(1, n_imgs + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1, f"im{i}.png")
        arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(imgdir / f"im{i}.png")
    colmap.write_images_binary(sparse / "images.bin", images)
    xyz = rng.normal(size=(n_pts, 3))
    rgb = (rng.uniform(size=(n_pts, 3)) * 255).astype(np.uint8)
    colmap.write_points3d_binary(sparse / "points3D.bin", xyz, rgb)
    return xyz, rgb


def test_colmap_roundtrip(tmp_path, rng):
    xyz, rgb = _write_fake_colmap(tmp_path, rng)
    sparse = tmp_path / "sparse" / "0"
    cams = colmap.read_cameras_binary(sparse / "cameras.bin")
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    assert cams[1].intrinsics == (60.0, 60.0, 32.0, 24.0)
    imgs = colmap.read_images_binary(sparse / "images.bin")
    assert len(imgs) == 3 and imgs[2].name == "im2.png"
    x2, r2, _ = colmap.read_points3d_binary(sparse / "points3D.bin")
    np.testing.assert_allclose(x2, xyz, atol=1e-12)
    np.testing.assert_array_equal(r2, rgb)


def test_points_to_gaussians(rng):
    xyz = rng.normal(size=(40, 3))
    rgb = (rng.uniform(size=(40, 3)) * 255).astype(np.uint8)
    gs = points_to_gaussians(xyz, rgb)
    assert (gs["alpha"] == np.float32(0.8)).all()
    np.testing.assert_array_equal(gs["rot"][:, 0], 1.0)
    assert (gs["scale"] >= 0.01 - 1e-7).all() and (gs["scale"] <= 3.0 + 1e-7).all()
    # squared-NN-distance convention (reference faiss IndexFlatL2 quirk)
    d = np.linalg.norm(xyz[None] - xyz[:, None], axis=-1)
    np.fill_diagonal(d, np.inf)
    expect = np.clip(d.min(1) ** 2, 0.01, 3.0)
    np.testing.assert_allclose(gs["scale"][:, 0], expect, rtol=1e-5)


def test_load_colmap_dataset(tmp_path, rng):
    _write_fake_colmap(tmp_path, rng)
    ds = load_colmap_dataset(tmp_path, resize_rate=0.5)
    assert len(ds) == 3
    cam, img = ds[0]
    assert img.shape == (3, 24, 32)
    assert cam.width == 32 and cam.height == 24
    assert float(cam.fx) == pytest.approx(30.0)
    assert ds.scene_size > 0
    assert len(ds.gs) == 50
    # cached npy reused on reload
    assert (tmp_path / "sparse" / "0" / "points3D.npy").exists()
    ds2 = load_colmap_dataset(tmp_path, resize_rate=0.5)
    np.testing.assert_array_equal(ds2.gs["pw"], ds.gs["pw"])
