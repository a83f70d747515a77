"""Stages 1-5 JAX vs golden NumPy parity, and autodiff vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops import stages


@pytest.fixture(scope="module")
def fixture():
    gs = example_gaussians()
    camd = example_camera()
    cam = Camera.from_dict(camd)
    return gs, camd, cam


def _random_scene(rng, n=64):
    pws = rng.normal(size=(n, 3)) * 1.5
    pws[:, 2] += 4.0  # mostly in front
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.5 - 2.5)
    alphas = 1 / (1 + np.exp(-rng.normal(size=n)))
    shs = rng.normal(size=(n, 48)) * 0.3
    return pws, rots, scales, alphas, shs


def test_project_parity(fixture, rng):
    gs, camd, cam = fixture
    pws, _, _, _, _ = _random_scene(rng)
    us_g, pcs_g, d_g = golden.project(pws, camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"], camd["cx"], camd["cy"])
    us_j, pcs_j, d_j = stages.project(jnp.asarray(pws, jnp.float32), cam.Rcw, cam.tcw, cam.fx, cam.fy, cam.cx, cam.cy)
    # near the 0.2 near-plane, u = x fx / z amplifies fp32 rounding; compare
    # with relative tolerance and a small absolute floor
    valid = d_g >= stages.MIN_DEPTH
    np.testing.assert_allclose(np.asarray(us_j)[valid], us_g[valid], rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pcs_j), pcs_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_j), d_g, atol=1e-4)


def test_cov3d_parity(rng):
    _, rots, scales, _, _ = _random_scene(rng)
    c_g = golden.compute_cov3d(rots, scales)
    c_j = stages.compute_cov3d(jnp.asarray(rots, jnp.float32), jnp.asarray(scales, jnp.float32))
    np.testing.assert_allclose(np.asarray(c_j), c_g, atol=1e-5)


def test_cov2d_parity(fixture, rng):
    gs, camd, cam = fixture
    pws, rots, scales, _, _ = _random_scene(rng)
    _, pcs, d = golden.project(pws, camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"], camd["cx"], camd["cy"])
    c3 = golden.compute_cov3d(rots, scales)
    c2_g = golden.compute_cov2d(c3, pcs, camd["Rcw"], camd["fx"], camd["fy"], camd["width"], camd["height"])
    c2_j = stages.compute_cov2d(
        jnp.asarray(c3, jnp.float32), jnp.asarray(pcs, jnp.float32), cam.Rcw,
        cam.fx, cam.fy, camd["width"], camd["height"],
    )
    valid = d >= stages.MIN_DEPTH
    np.testing.assert_allclose(np.asarray(c2_j)[valid], c2_g[valid], rtol=1e-4, atol=1e-4)


def test_sh2color_parity(fixture, rng):
    gs, camd, cam = fixture
    pws, _, _, _, shs = _random_scene(rng)
    twc = -camd["Rcw"].T @ camd["tcw"]
    col_g = golden.sh2color(shs, pws, twc)
    col_j = stages.sh2color(jnp.asarray(shs, jnp.float32), jnp.asarray(pws, jnp.float32), cam.twc)
    np.testing.assert_allclose(np.asarray(col_j), col_g, atol=1e-5)


def test_inverse_cov2d_parity(rng):
    cov2ds = np.abs(rng.normal(size=(32, 3))) + np.array([1.0, 0.0, 1.0])
    cov2ds[:, 1] *= 0.3
    ci_g, ar_g = golden.inverse_cov2d(cov2ds)
    ci_j, ar_j = stages.inverse_cov2d(jnp.asarray(cov2ds, jnp.float32))
    np.testing.assert_allclose(np.asarray(ci_j), ci_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ar_j), ar_g, atol=0)


def test_stage_gradients_vs_finite_diff(fixture):
    """jax.grad of a scalar through stages 1-5 vs golden finite differences.

    This is the per-stage slice of the reference's numerical-diff pyramid
    (backward_cpu.py:545-601) with autodiff standing in for hand Jacobians.
    """
    gs, camd, cam = fixture
    w6 = np.linspace(0.3, 1.1, 6)

    def loss_np(scales):
        return (golden.compute_cov3d(gs["rots"], scales.reshape(-1, 3)) @ w6).sum()

    def loss_jx(scales):
        c = stages.compute_cov3d(jnp.asarray(gs["rots"], jnp.float32), scales.reshape(-1, 3))
        return (c @ jnp.asarray(w6, jnp.float32)).sum()

    g_num = golden.numerical_derivative(lambda s: np.array([loss_np(s)]), [gs["scales"].ravel()], 0)[0]
    g_ad = jax.grad(loss_jx)(jnp.asarray(gs["scales"].ravel(), jnp.float32))
    np.testing.assert_allclose(np.asarray(g_ad), g_num, atol=1e-4)

    # cov2d chain w.r.t. pcs
    c3 = golden.compute_cov3d(gs["rots"], gs["scales"])
    _, pcs0, _ = golden.project(gs["pws"], camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"], camd["cx"], camd["cy"])
    w3 = np.array([0.7, -0.2, 0.4])

    def loss2_np(pcs):
        return (golden.compute_cov2d(c3, pcs.reshape(-1, 3), camd["Rcw"], camd["fx"], camd["fy"], 32, 16) @ w3).sum()

    def loss2_jx(pcs):
        c = stages.compute_cov2d(jnp.asarray(c3, jnp.float32), pcs.reshape(-1, 3), cam.Rcw, cam.fx, cam.fy, 32, 16)
        return (c @ jnp.asarray(w3, jnp.float32)).sum()

    g2_num = golden.numerical_derivative(lambda p: np.array([loss2_np(p)]), [pcs0.ravel()], 0)[0]
    g2_ad = jax.grad(loss2_jx)(jnp.asarray(pcs0.ravel(), jnp.float32))
    np.testing.assert_allclose(np.asarray(g2_ad), g2_num, atol=1e-3)
