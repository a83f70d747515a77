"""SSIM / gau_loss parity tests.

The training loss must match the reference's
(/root/reference/gsplat/pytorch_ssim.py:12-67): SSIM with an 11x11
sigma=1.5 Gaussian window, depthwise SAME zero-padded blur,
C1=0.01^2, C2=0.03^2; gau_loss = 0.8 L1 + 0.2 (1-SSIM). The oracle here is
an independent torch conv2d evaluation of the same definition.
"""

import numpy as np
import pytest

from easygaussiansplatting_tpu.ops.loss import (
    _blur_matrix, _gaussian_window, gau_loss, ssim,
)


def _torch_ssim(a, b):
    import torch
    import torch.nn.functional as F

    w1 = torch.tensor(_gaussian_window(11, 1.5))
    win = (w1[:, None] @ w1[None, :]).expand(3, 1, 11, 11).contiguous()
    x = torch.tensor(a)[None]
    y = torch.tensor(b)[None]

    def blur(t):
        return F.conv2d(t, win, padding=5, groups=3)

    mu1, mu2 = blur(x), blur(y)
    s1 = blur(x * x) - mu1 * mu1
    s2 = blur(y * y) - mu2 * mu2
    s12 = blur(x * y) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return float(m.mean())


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    a = rng.random((3, 37, 53), dtype=np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    return a, b


def test_ssim_identity(pair):
    a, _ = pair
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_torch_conv2d(pair):
    a, b = pair
    assert float(ssim(a, b)) == pytest.approx(_torch_ssim(a, b), abs=2e-5)


def test_blur_matrix_is_same_padded_convolution():
    w = _gaussian_window(11, 1.5)
    x = np.random.default_rng(1).random(23).astype(np.float32)
    ref = np.convolve(np.pad(x, 5), w, mode="valid")  # SAME zero-padded
    got = np.asarray(_blur_matrix(23)) @ x
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gau_loss_combination(pair):
    a, b = pair
    l1 = float(np.abs(a - b).mean())
    s = float(ssim(a, b))
    expect = 0.8 * l1 + 0.2 * (1.0 - s)
    assert float(gau_loss(a, b)) == pytest.approx(expect, abs=1e-6)
