"""Chunked front-to-back alpha blending math on [K, P] blocks.

This is the TPU-shaped core of stage 6. The CUDA draw/drawB kernels
(/root/reference/gsplatcu/kernel.cu:152-271, 809-950) are per-pixel sequential
loops with warp-level early exit; on a SIMD machine the same recurrence is
re-expressed over a chunk of K depth-ordered entries at once:

  tau_ex[k] = tau_in * prod_{j<k} (1 - alpha'_j)              (prefix over K)
  color    += sum_k contribute_k * tau_ex[k] * alpha'_k * c_k

with the reference's exact decision rules (alpha' clamp 0.99, skip < 0.002,
contribute iff running tau >= 1e-4). The prefix sum over K and the [K,P] x
[P,3] reductions are MXU/VPU friendly; both the pure-JAX tiled rasteriser and
the Pallas kernels call these functions so the math exists exactly once.

The backward chunk replays chunks back-to-front, recovering tau by division
exactly like drawB (kernel.cu:916) but vectorised: suffix sums over K replace
the sequential per-patch loop, and per-*patch* gradients are emitted for a
deterministic segment-sum instead of atomicAdd (kernel.cu:924-945).
"""

import jax
import jax.numpy as jnp

# Blend reductions must run at full fp32: the TPU MXU's default (bf16 input
# passes) loses ~3 decimal digits, visibly breaking pixel parity with the
# sequential reference recurrence.
_HIGHEST = jax.lax.Precision.HIGHEST

ALPHA_CLAMP = 0.99
ALPHA_SKIP = 0.002
TAU_STOP = 1e-4


def chunk_alpha(us_k, cinv_k, alpha_k, mask_k, px, py):
    """alpha' [K,P] for a chunk of K entries against P pixels.

    Returns (alpha_prime, extras needed by backward: dx, dy, maha_pos).
    """
    dx = us_k[:, 0:1] - px[None, :]
    dy = us_k[:, 1:2] - py[None, :]
    a = cinv_k[:, 0:1]
    b = cinv_k[:, 1:2]
    c = cinv_k[:, 2:3]
    maha_raw = a * dx * dx + c * dy * dy + 2.0 * b * dx * dy
    maha = jnp.maximum(0.0, maha_raw)
    ap = alpha_k[:, None] * jnp.exp(-0.5 * maha)
    ap = jnp.minimum(ALPHA_CLAMP, ap)
    ap = jnp.where(mask_k[:, None], ap, 0.0)
    return ap, (dx, dy, maha_raw)


def blend_chunk_fwd(tau_in, us_k, cinv_k, alpha_k, color_k, mask_k, px, py):
    """One forward chunk.

    tau_in: [P] transmittance entering the chunk.
    us_k [K,2], cinv_k [K,3], alpha_k [K], color_k [K,3], mask_k [K] bool.
    px, py: [P] pixel centres.

    Returns (color_add [P,3], tau_out [P], cont_local [P] int32) where
    cont_local is the 1-based within-chunk index of the last contributing
    entry (0 if none) — combined with the chunk offset by the caller to form
    the reference's per-pixel `contrib`.
    """
    ap, _ = chunk_alpha(us_k, cinv_k, alpha_k, mask_k, px, py)
    m1 = ap >= ALPHA_SKIP
    # Cumulative *products* (not exp/log1p): near-opaque entries amplify
    # log-space rounding by 1/(1-alpha') (= 100 at the 0.99 clamp), which
    # visibly drifts from the sequential reference recurrence in fp32.
    one_m = jnp.where(m1, 1.0 - ap, 1.0)
    cum = jnp.cumprod(one_m, axis=0)
    tau_ex = tau_in[None, :] * jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    contribute = m1 & (tau_ex >= TAU_STOP)
    wgt = jnp.where(contribute, tau_ex * ap, 0.0)  # [K,P]
    color_add = jnp.matmul(wgt.T, color_k, precision=_HIGHEST)  # [P,3] on the MXU
    tau_out = tau_in * jnp.prod(jnp.where(contribute, 1.0 - ap, 1.0), axis=0)
    k_idx = jnp.arange(1, ap.shape[0] + 1, dtype=jnp.int32)[:, None]
    cont_local = jnp.max(jnp.where(contribute, k_idx, 0), axis=0)
    return color_add, tau_out, cont_local


def blend_chunk_bwd(tau_end, gamma_after, g, offset, contrib, us_k, cinv_k, alpha_k, color_k, mask_k, px, py):
    """One backward chunk (chunks visited back-to-front).

    tau_end [P]: transmittance after this chunk's last entry (running value).
    gamma_after [P,3]: sum of tau_ex * alpha' * c over all *later* entries.
    g [P,3]: dL/dpixel for the tile's pixels.
    offset: global (within tile list) index of this chunk's first entry.
    contrib [P] int32: forward per-pixel contributor count.

    Returns (grads dict with du [K,2], dcinv [K,3], dalpha [K], dcolor [K,3],
             tau_start [P], gamma_total [P,3]) where tau_start / gamma_total
    feed the next (earlier) chunk.
    """
    K = us_k.shape[0]
    ap, (dx, dy, maha_raw) = chunk_alpha(us_k, cinv_k, alpha_k, mask_k, px, py)
    idx = offset + jnp.arange(K, dtype=jnp.int32)[:, None]
    m = (idx < contrib[None, :]) & (ap >= ALPHA_SKIP)

    # Recover per-entry transmittance by division like drawB (kernel.cu:916),
    # vectorised as a suffix cumulative product. Contributions stop before
    # tau < 1e-4, so the masked suffix product is bounded below by ~TAU_STOP
    # and the division never blows up.
    one_m_f = jnp.where(m, 1.0 - ap, 1.0)
    sfx = jnp.cumprod(one_m_f[::-1], axis=0)[::-1]  # prod_{j>=k}
    tau_ex = tau_end[None, :] / sfx  # T_{k-1} per entry
    tau_start = tau_end / sfx[0] if K > 0 else tau_end

    contr = jnp.where(m, tau_ex * ap, 0.0)  # [K,P] blend weights
    # gamma_after_k [K,P,3] via per-channel suffix-exclusive sums
    contr_c = contr[:, :, None] * color_k[:, None, :]  # [K,P,3]
    sfx_c = jnp.cumsum(contr_c[::-1], axis=0)[::-1] - contr_c  # exclusive
    G = gamma_after[None, :, :] + sfx_c  # [K,P,3]
    gamma_total = gamma_after + jnp.sum(contr_c, axis=0)

    # dL/dcolor_k = sum_p contr * g
    dcolor = jnp.einsum("kp,pc->kc", contr, g, precision=_HIGHEST)

    # dL/dalpha'_kp = g . (tau_ex c_k - G/(1-alpha'))
    cg = jnp.matmul(color_k, g.T, precision=_HIGHEST)  # [K,P]
    Gg = jnp.sum(G * g[None, :, :], axis=-1)  # [K,P]
    one_m = jnp.maximum(1.0 - ap, 1e-6)
    dap = jnp.where(m, tau_ex * cg - Gg / one_m, 0.0)

    # chain through alpha' = min(0.99, alpha exp(-0.5 max(0, maha)))
    unclamped = ap < ALPHA_CLAMP  # zero-gradient through the clamp (true subgradient)
    e = jnp.where(mask_k[:, None], jnp.exp(-0.5 * jnp.maximum(0.0, maha_raw)), 0.0)
    dalpha = jnp.sum(jnp.where(unclamped, dap * e, 0.0), axis=1)
    dmaha = jnp.where(unclamped & (maha_raw > 0.0), dap * (-0.5) * ap, 0.0)  # [K,P]

    a = cinv_k[:, 0:1]
    b = cinv_k[:, 1:2]
    c = cinv_k[:, 2:3]
    dux = jnp.sum(dmaha * (2.0 * a * dx + 2.0 * b * dy), axis=1)
    duy = jnp.sum(dmaha * (2.0 * c * dy + 2.0 * b * dx), axis=1)
    du = jnp.stack([dux, duy], axis=1)
    dcinv = jnp.stack(
        [
            jnp.sum(dmaha * dx * dx, axis=1),
            jnp.sum(dmaha * 2.0 * dx * dy, axis=1),
            jnp.sum(dmaha * dy * dy, axis=1),
        ],
        axis=1,
    )
    grads = {"du": du, "dcinv": dcinv, "dalpha": dalpha, "dcolor": dcolor}
    return grads, tau_start, gamma_total
