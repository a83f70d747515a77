"""Hand-derived analytic Jacobians (golden/analytic.py) vs float64 finite
differences of the golden model — the third, derivation-independent gradient
implementation for stages 1-5 (the autodiff-vs-numdiff triangle is closed by
verify_gradients.py; this leg mirrors the reference's backward_cpu.py).
"""

import numpy as np
import pytest

from easygaussiansplatting_tpu.golden import model as gm
from easygaussiansplatting_tpu.golden import analytic as ga
from easygaussiansplatting_tpu.golden.numdiff import numerical_derivative

RNG = np.random.default_rng(11)
N = 6
FX, FY, CX, CY, W, H = 60.0, 55.0, 32.0, 24.0, 64, 48


def _camera():
    th = 0.3
    Rcw = np.array([
        [np.cos(th), -np.sin(th), 0.0],
        [np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ])
    tcw = np.array([0.1, -0.2, 2.5])
    return Rcw, tcw


def _blocks(J, out_per, in_per):
    """Split a flattened [N*out_per, N*in_per] numdiff Jacobian into the
    per-gaussian diagonal blocks (and assert the off-diagonals vanish —
    every stage is elementwise over gaussians)."""
    n = J.shape[0] // out_per
    out = np.zeros((n, out_per, in_per))
    for i in range(n):
        rows = slice(i * out_per, (i + 1) * out_per)
        for j in range(n):
            cols = slice(j * in_per, (j + 1) * in_per)
            if i == j:
                out[i] = J[rows, cols]
            else:
                assert np.abs(J[rows, cols]).max() < 1e-6
    return out


def test_stage1_projection():
    Rcw, tcw = _camera()
    pws = RNG.normal(size=(N, 3)) * 1.5
    pws[:, 2] += 1.0  # keep depths > MIN_DEPTH after the transform

    du, ddepth = ga.project_jacobians(pws, Rcw, tcw, FX, FY)
    J_u = numerical_derivative(
        lambda p: gm.project(p, Rcw, tcw, FX, FY, CX, CY)[0], [pws], 0)
    J_z = numerical_derivative(
        lambda p: gm.project(p, Rcw, tcw, FX, FY, CX, CY)[2], [pws], 0)
    np.testing.assert_allclose(du, _blocks(J_u, 2, 3), atol=1e-5)
    np.testing.assert_allclose(ddepth, _blocks(J_z, 1, 3)[:, 0], atol=1e-8)


def test_stage2_cov3d():
    q = RNG.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = np.exp(RNG.normal(size=(N, 3)) * 0.3)

    dq, ds = ga.cov3d_jacobians(q, s)
    J_q = numerical_derivative(lambda r: gm.compute_cov3d(r, s), [q], 0)
    J_s = numerical_derivative(lambda v: gm.compute_cov3d(q, v), [s], 0)
    np.testing.assert_allclose(dq, _blocks(J_q, 6, 4), atol=1e-5)
    np.testing.assert_allclose(ds, _blocks(J_s, 6, 3), atol=1e-5)


@pytest.mark.parametrize("clamped", [False, True])
def test_stage3_cov2d(clamped):
    Rcw, _ = _camera()
    q = RNG.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = np.exp(RNG.normal(size=(N, 3)) * 0.3 - 1.0)
    cov3 = gm.compute_cov3d(q, s)
    pcs = RNG.normal(size=(N, 3)) * 0.4
    pcs[:, 2] = 2.0 + RNG.random(N)
    if clamped:
        # push |x/z| and |y/z| well past 1.3*tan(fov): the clamped branch
        # must carry zero derivative through x, nonzero through z
        pcs[:, 0] = 3.0 * pcs[:, 2]
        pcs[:, 1] = -3.0 * pcs[:, 2]

    dsig, dpc = ga.cov2d_jacobians(cov3, pcs, Rcw, FX, FY, W, H)
    J_sig = numerical_derivative(
        lambda c: gm.compute_cov2d(c, pcs, Rcw, FX, FY, W, H), [cov3], 0)
    J_pc = numerical_derivative(
        lambda p: gm.compute_cov2d(cov3, p, Rcw, FX, FY, W, H), [pcs], 0)
    np.testing.assert_allclose(dsig, _blocks(J_sig, 3, 6), atol=1e-5)
    np.testing.assert_allclose(dpc, _blocks(J_pc, 3, 3), atol=1e-4)


def test_stage4_sh_color():
    Rcw, tcw = _camera()
    twc = -Rcw.T @ tcw
    pws = RNG.normal(size=(N, 3)) * 1.5
    pws[:, 2] += 3.0
    shs = RNG.normal(size=(N, 48)) * 0.4

    dshs, dpws = ga.sh2color_jacobians(shs, pws, twc)
    J_shs = numerical_derivative(lambda h: gm.sh2color(h, pws, twc), [shs], 0)
    J_pws = numerical_derivative(lambda p: gm.sh2color(shs, p, twc), [pws], 0)
    np.testing.assert_allclose(dshs, _blocks(J_shs, 3, 48), atol=1e-7)
    np.testing.assert_allclose(dpws, _blocks(J_pws, 3, 3), atol=1e-5)


def test_stage5_conic():
    q = RNG.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = np.exp(RNG.normal(size=(N, 3)) * 0.3)
    pcs = RNG.normal(size=(N, 3)) * 0.3
    pcs[:, 2] = 2.0 + RNG.random(N)
    cov2 = gm.compute_cov2d(gm.compute_cov3d(q, s), pcs, _camera()[0], FX, FY, W, H)

    dc = ga.conic_jacobians(cov2)
    J = numerical_derivative(lambda c: gm.inverse_cov2d(c)[0], [cov2], 0)
    np.testing.assert_allclose(dc, _blocks(J, 3, 3), atol=1e-5)
