"""Headless viewer: orbit cameras, turntable render, GIF export."""

import numpy as np

from easygaussiansplatting_tpu.data import example_gaussians
from easygaussiansplatting_tpu.viewer.headless import (
    orbit_cameras,
    render_turntable,
    save_gif,
)


def test_orbit_cameras_look_at_center():
    cams = orbit_cameras((1.0, 2.0, 0.5), radius=4.0, n_frames=8, width=64, height=48)
    assert len(cams) == 8
    for c in cams:
        # camera center is on the orbit sphere
        d = np.linalg.norm(np.asarray(c.twc) - np.array([1.0, 2.0, 0.5]))
        np.testing.assert_allclose(d, 4.0, rtol=1e-5)
        # center projects to the principal point (z-forward)
        pc = np.asarray(c.Rcw) @ (np.array([1.0, 2.0, 0.5]) - np.asarray(c.twc))
        assert pc[2] > 0
        np.testing.assert_allclose(pc[:2], 0.0, atol=1e-5)


def test_turntable_and_gif(tmp_path):
    g = example_gaussians()
    a = {"pws": g["pws"], "rots": g["rots"], "scales": g["scales"],
         "alphas": g["alphas"], "shs": g["shs"]}
    frames = render_turntable(
        a, backend="tiled", max_patches=2**10,
        n_frames=3, width=32, height=32,
    )
    assert len(frames) == 3 and frames[0].shape == (3, 32, 32)
    assert any(np.abs(f).max() > 0 for f in frames)
    save_gif(tmp_path / "orbit.gif", frames)
    assert (tmp_path / "orbit.gif").stat().st_size > 0


def test_rainbow_sh_endpoints():
    from easygaussiansplatting_tpu.utils.image import rainbow_sh

    sh = rainbow_sh(np.array([0.0, 127.5, 255.0]), 0.0, 255.0)
    rgb = sh * 0.28209479177387814 + 0.5
    np.testing.assert_allclose(rgb[0], [1, 0, 0], atol=1e-6)  # min -> red
    # max lands on the ramp's h=1 edge -> [1,0,1], matching the reference
    # colormap's behaviour exactly (utils.py:84-118)
    np.testing.assert_allclose(rgb[2], [1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(rgb[1], [0, 1, 0.5], atol=0.02)  # mid -> green


def test_camera_markers(rng):
    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
    from easygaussiansplatting_tpu.viewer.headless import camera_markers

    scene = make_synthetic_scene(seed=1, n_cams=6, n_gaussians=8)
    mk = camera_markers(scene["cameras"][::2])
    assert mk["pws"].shape == (3, 3) and mk["shs"].shape == (3, 3)
    np.testing.assert_allclose(
        mk["pws"][0], np.asarray(scene["cameras"][0].twc), atol=1e-5
    )
    assert (mk["scales"] > 0).all()
