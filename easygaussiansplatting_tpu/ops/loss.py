"""Training loss: L1 + DSSIM.

Parity with the reference loss (/root/reference/gsplat/pytorch_ssim.py:12-67):
SSIM with an 11x11 sigma=1.5 Gaussian window, depthwise SAME convolution,
C1 = 0.01^2, C2 = 0.03^2; gau_loss = (1-lambda) L1 + lambda (1-SSIM) with
lambda = 0.2. The window is separable, so it runs as two 1D depthwise
convolutions — cheap on the VPU and fully fused by XLA.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size=11, sigma=1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(img, window):
    """Separable depthwise SAME blur. img: [C,H,W]."""
    c = img.shape[0]
    x = img[None]  # NCHW
    kh = jnp.asarray(window, img.dtype).reshape(1, 1, -1, 1)
    kw = jnp.asarray(window, img.dtype).reshape(1, 1, 1, -1)
    kh = jnp.tile(kh, (c, 1, 1, 1))
    kw = jnp.tile(kw, (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = (window.shape[0] // 2, window.shape[0] // 2)
    hi = jax.lax.Precision.HIGHEST  # full fp32 on the MXU
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [pad_h, (0, 0)], dimension_numbers=dn, feature_group_count=c, precision=hi)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), pad_h], dimension_numbers=dn, feature_group_count=c, precision=hi)
    return x[0]


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size=11):
    """Mean SSIM over a [C,H,W] image pair."""
    window = _gaussian_window(window_size)
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def gau_loss(image, gt_image, loss_lambda=0.2):
    """(1-lambda) L1 + lambda DSSIM, the reference training loss."""
    loss_l1 = jnp.mean(jnp.abs(image - gt_image))
    loss_ssim = 1.0 - ssim(image, gt_image)
    return (1.0 - loss_lambda) * loss_l1 + loss_lambda * loss_ssim
