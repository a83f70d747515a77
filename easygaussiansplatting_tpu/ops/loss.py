"""Training loss: L1 + DSSIM.

Parity with the reference loss (/root/reference/gsplat/pytorch_ssim.py:12-67):
SSIM with an 11x11 sigma=1.5 Gaussian window, depthwise SAME (zero-padded)
blur, C1 = 0.01^2, C2 = 0.03^2; gau_loss = (1-lambda) L1 + lambda (1-SSIM)
with lambda = 0.2. The separable blur runs as two *banded-matrix matmuls*
on the MXU — XLA's depthwise-convolution lowering costs ~10x more on TPU
than the equivalent [H,H] / [W,W] band-matrix contraction.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST  # full fp32 on the MXU


def _gaussian_window(window_size=11, sigma=1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_matrix(n, window_size=11, sigma=1.5):
    """[n,n] banded matrix B with B[i, i+o] = window[o + ws//2]; rows truncate
    at the borders — exactly SAME zero-padded convolution.

    Built from iota ops, NOT a baked numpy literal: a dense [979,979]
    constant serialises to ~8 MB of HLO text and the train step embeds ~16
    copies (fwd/bwd/transposes) — 80 MB programs took the tunnel's compile
    service tens of minutes. As ops it is a few lines of HLO; XLA folds it
    on-device."""
    w = _gaussian_window(window_size, sigma)  # 11 floats — tiny constant
    half = window_size // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i  # band offset in [-half, half]
    return jnp.where(
        jnp.abs(d) <= half,
        jnp.take(jnp.asarray(w), jnp.clip(d + half, 0, window_size - 1)),
        0.0,
    )


def _depthwise_blur(img, window):
    """Separable depthwise SAME blur via band-matrix matmuls. img: [C,H,W]."""
    ws = window.shape[0]
    bh = _blur_matrix(img.shape[1], ws)
    bw = _blur_matrix(img.shape[2], ws)
    x = jnp.einsum("hk,ckw->chw", bh, img, precision=_HI)
    return jnp.einsum("chk,wk->chw", x, bw, precision=_HI)


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
