"""Golden-model sanity: fixture render invariants + numdiff harness."""

import numpy as np

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians


def _render_fixture():
    gs = example_gaussians()
    cam = example_camera()
    return golden.render(
        gs["pws"], gs["shs"], gs["alphas"], gs["scales"], gs["rots"],
        cam["Rcw"], cam["tcw"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        cam["width"], cam["height"],
    )


def test_render_fixture_invariants():
    image, aux = _render_fixture()
    assert image.shape == (3, 16, 32)
    assert np.all(np.isfinite(image))
    assert image.max() > 0.1  # something visible rendered
    # All 4 fixture gaussians are in front of the camera
    assert np.all(aux["depths"] > golden.MIN_DEPTH)
    # transmittance in (0, 1]
    assert np.all(aux["final_tau"] > 0) and np.all(aux["final_tau"] <= 1.0)
    # where nothing rendered tau stays 1
    empty = aux["contrib"] == 0
    assert np.allclose(aux["final_tau"][empty], 1.0)


def test_alpha_blend_energy_conservation():
    """Accumulated weight + final transmittance == 1 for constant-color scenes."""
    image, aux = _render_fixture()
    # Render with all colors = 1: image value per pixel == 1 - final_tau
    gs = example_gaussians()
    cam = example_camera()
    us, pcs, depths = golden.project(
        gs["pws"], cam["Rcw"], cam["tcw"], cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    )
    cov3ds = golden.compute_cov3d(gs["rots"], gs["scales"])
    cov2ds = golden.compute_cov2d(cov3ds, pcs, cam["Rcw"], cam["fx"], cam["fy"],
                                  cam["width"], cam["height"])
    cinv2ds, areas = golden.inverse_cov2d(cov2ds)
    ones = np.ones((4, 3))
    img1, _, tau1 = golden.render_tiles(
        us, cinv2ds, gs["alphas"], depths, ones, areas, cam["width"], cam["height"]
    )
    assert np.allclose(img1[0], 1.0 - tau1, atol=1e-12)


def test_sh_color_degree0_is_constant():
    gs = example_gaussians()
    cam = example_camera()
    twc = -cam["Rcw"].T @ cam["tcw"]
    colors = golden.sh2color(gs["shs"], gs["pws"], twc)
    # fixture sh values chosen so colors are exactly 0 or 1
    expect = np.array([[1, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    assert np.allclose(colors, expect, atol=1e-5)


def test_numerical_derivative_quadratic():
    f = lambda x: np.array([x[0] ** 2 + 3 * x[1], x[0] * x[1]])
    x = np.array([2.0, 5.0])
    J = golden.numerical_derivative(f, [x], 0)
    assert np.allclose(J, np.array([[4.0, 3.0], [5.0, 2.0]]), atol=1e-6)


def test_numerical_derivative_matches_analytic_cov3d():
    """Finite diff through compute_cov3d w.r.t. scales: sanity of the harness
    on a real pipeline stage."""
    gs = example_gaussians()
    f = lambda s: golden.compute_cov3d(gs["rots"][:1], s.reshape(1, 3))[0]
    s0 = gs["scales"][0]
    J = golden.numerical_derivative(f, [s0], 0)
    # cov3d diag for identity rot = s^2, so d(xx)/d(sx) = 2 sx
    assert np.isclose(J[0, 0], 2 * s0[0], atol=1e-6)
