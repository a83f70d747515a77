"""Reference rasteriser: pure-JAX, exact semantics, reverse-differentiable.

A lax.scan over depth-sorted Gaussians carrying per-pixel transmittance —
O(N * H * W), intended for correctness (tests, tiny scenes, golden
cross-checks), not speed. The production path is the Pallas tile kernel in
ops/pallas; both implement the same contract as the reference draw kernel
(/root/reference/gsplatcu/kernel.cu:152-271):

* tile coverage: a Gaussian is considered for a pixel iff its 3-sigma rect
  covers the pixel's 16x16 tile (not the pixel itself) — matching the tile
  binning of the CUDA pipeline;
* alpha' = min(0.99, alpha * exp(-0.5 * max(0, maha)));
* entries with alpha' < 0.002 are skipped entirely;
* an entry contributes iff running tau >= 1e-4 (early-termination rule);
* contrib = 1-based index (within the pixel's tile list) of the last
  contributing entry; final_tau = tau after the last contribution.

Gradient note: reverse-mode AD through jnp.minimum gives a true zero
subgradient for alpha'-saturated splats (alpha' = 0.99), where the reference
backward propagates exp(-0.5 maha) as if unclamped (kernel.cu:809-950). The
AD behaviour matches finite differences; the difference only appears for
fully-opaque splats.
"""

from functools import partial

import jax
import jax.numpy as jnp

from easygaussiansplatting_tpu.ops.binning import gaussian_rects

ALPHA_CLAMP = 0.99
ALPHA_SKIP = 0.002
TAU_STOP = 1e-4


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def rasterize_dense(us, cinv2ds, alphas, colors, depths, areas, valid, *, width, height, tile=16):
    """Blend all Gaussians into an image by scanning them in depth order.

    Returns (image [3,H,W], contrib [H,W] int32, final_tau [H,W]).
    """
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf), stable=True)
    rects, valid = gaussian_rects(us, areas, valid, width, height, tile)

    us_s = us[order]
    cinv_s = cinv2ds[order]
    alpha_s = alphas[order]
    color_s = colors[order]
    rect_s = rects[order]
    valid_s = valid[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    tpx = (jnp.arange(width, dtype=jnp.int32) // tile)[None, :]
    tpy = (jnp.arange(height, dtype=jnp.int32) // tile)[:, None]

    def body(carry, g):
        tau, color, cont, cont_tmp = carry
        u, cinv, alpha, c, rect, ok = g
        covered = (
            ok
            & (tpx >= rect[0])
            & (tpx < rect[2])
            & (tpy >= rect[1])
            & (tpy < rect[3])
        )
        dx = u[0] - px
        dy = u[1] - py
        maha = jnp.maximum(
            0.0, cinv[0] * dx * dx + cinv[2] * dy * dy + 2.0 * cinv[1] * dx * dy
        )
        alpha_prime = jnp.minimum(ALPHA_CLAMP, alpha * jnp.exp(-0.5 * maha))
        cont_tmp = cont_tmp + jnp.where(covered & (tau >= TAU_STOP), 1, 0)
        m = covered & (alpha_prime >= ALPHA_SKIP) & (tau >= TAU_STOP)
        w = jnp.where(m, tau * alpha_prime, 0.0)
        color = color + w[None] * c[:, None, None]
        tau = jnp.where(m, tau * (1.0 - alpha_prime), tau)
        cont = jnp.where(m, cont_tmp, cont)
        return (tau, color, cont, cont_tmp), None

    dtype = us.dtype
    tau0 = jnp.ones((height, width), dtype)
    color0 = jnp.zeros((3, height, width), dtype)
    cont0 = jnp.zeros((height, width), jnp.int32)
    (tau, color, cont, _), _ = jax.lax.scan(
        body, (tau0, color0, cont0, cont0), (us_s, cinv_s, alpha_s, color_s, rect_s, valid_s)
    )
    return color, cont, tau


def render_reference(pws, shs, alphas, scales, rots, cam, alive=None, sh_degree=3, tile=16):
    """Full differentiable forward with the reference rasteriser."""
    from easygaussiansplatting_tpu.ops.stages import preprocess

    aux = preprocess(pws, shs, alphas, scales, rots, cam, alive=alive, sh_degree=sh_degree)
    image, contrib, final_tau = rasterize_dense(
        aux["us"], aux["cinv2ds"], aux["alphas"], aux["colors"], aux["depths"],
        aux["areas"], aux["valid"], width=cam.width, height=cam.height, tile=tile,
    )
    return image, {**aux, "contrib": contrib, "final_tau": final_tau}
