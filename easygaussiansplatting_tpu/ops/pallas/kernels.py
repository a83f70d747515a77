"""Pallas TPU rasterisation kernels (stage 6 forward + backward).

TPU-native re-design of the CUDA draw/drawB kernels
(/root/reference/gsplatcu/kernel.cu:152-271, 809-950):

* one grid step per 16x16 image tile (CUDA: one thread block per tile);
* per-tile draw lists live in HBM as an attribute-major packed array
  [16, M_pad]; chunks of K entries are DMAed into VMEM with double buffering
  (CUDA: fetch2shared cooperative shared-memory staging, kernel.cu:13-44);
* inside a chunk, entries sit along *lanes* and pixels along *sublanes*:
  the per-pixel sequential blend loop becomes lane-axis prefix products
  (lanescan.py) plus an MXU contraction for the color accumulation;
* per-pixel early termination (tau < 1e-4) becomes a whole-tile while_loop
  exit once every pixel is saturated (CUDA: __syncthreads_count warp vote,
  kernel.cu:203-207);
* the backward walks chunks back-to-front, recovers transmittance by
  division (kernel.cu:916), and emits per-*patch* gradients to disjoint
  HBM ranges — a deterministic segment-sum outside replaces atomicAdd
  (kernel.cu:924-945). TPU has no atomics; determinism is a feature
  (bitwise-reproducible gradients).

Tile draw lists are padded to multiples of K (ops/binning.align_tile_ranges)
so every DMA is chunk-aligned and every gradient write stays inside the
owning tile's range. Padding entries carry alpha = 0 -> alpha' = 0 -> no
contribution and zero gradients.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.pallas.lanescan import (
    lane_prod_all,
    prefix_prod_exclusive,
    suffix_prod_inclusive,
    suffix_sum_exclusive,
)

ALPHA_CLAMP = 0.99
ALPHA_SKIP = 0.002
TAU_STOP = 1e-4
PACK_ROWS = 16  # ux uy cinv_a cinv_b cinv_c alpha r g b (+ 7 pad rows)
GRAD_ROWS = 16  # dux duy dca dcb dcc dalpha dr dg db (+ 7 pad rows)
_HI = jax.lax.Precision.HIGHEST


def _pixel_coords(t, gx, tile, p):
    """Pixel centres of tile t as [P,1] sublane-major columns (row-major
    within the tile: p = y*tile + x)."""
    tx = t % gx
    ty = t // gx
    sub = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tx * tile + sub % tile).astype(jnp.float32)
    py = (ty * tile + sub // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha(data, px, py):
    """alpha' [P,K] and reusables from a packed chunk [16,K]."""
    ux = data[0:1, :]
    uy = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    alpha = data[5:6, :]
    dx = ux - px  # [P,K]
    dy = uy - py
    maha_raw = ca * dx * dx + cc * dy * dy + 2.0 * cb * dx * dy
    maha = jnp.maximum(0.0, maha_raw)
    ap = jnp.minimum(ALPHA_CLAMP, alpha * jnp.exp(-0.5 * maha))
    return ap, (dx, dy, maha_raw, ux, uy, ca, cb, cc, alpha)


def forward_kernel(start_ref, nchunk_ref, packed_hbm, img_ref, tau_ref, cont_ref,
                   scratch, sem, *, gx, tile, k):
    p = tile * tile
    t = pl.program_id(0)
    start = start_ref[t]
    n_chunks = nchunk_ref[t]
    px, py = _pixel_coords(t, gx, tile, p)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * k, k)  # tile lists are chunk-aligned
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, k)], scratch.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        c, tau, col, cont = state
        return (c < n_chunks) & (jnp.max(tau) >= TAU_STOP)

    def body(state):
        c, tau, col, cont = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        data = scratch[slot]  # [16, K]
        ap, _ = _chunk_alpha(data, px, py)
        m1 = ap >= ALPHA_SKIP
        one_m = jnp.where(m1, 1.0 - ap, 1.0)
        tau_ex = tau * prefix_prod_exclusive(one_m)  # [P,K]
        contribute = m1 & (tau_ex >= TAU_STOP)
        wgt = jnp.where(contribute, tau_ex * ap, 0.0)  # [P,K]
        colc = data[6:9, :]  # [3,K]
        col = col + jax.lax.dot_general(
            colc, wgt, (((1,), (1,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # [3,P]
        tau = tau * lane_prod_all(jnp.where(contribute, 1.0 - ap, 1.0))[:, 0:1]
        idx1 = c * k + lane + 1  # 1-based position within the tile list
        cont = jnp.maximum(cont, jnp.max(jnp.where(contribute, idx1, 0), axis=1, keepdims=True))
        return c + 1, tau, col, cont

    tau0 = jnp.ones((p, 1), jnp.float32)
    col0 = jnp.zeros((3, p), jnp.float32)
    cont0 = jnp.zeros((p, 1), jnp.int32)
    c_exit, tau, col, cont = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tau0, col0, cont0)
    )

    # Early exit (tau saturated) can leave the next chunk's prefetch in
    # flight; every started DMA must complete before the kernel ends or the
    # TPU aborts. (Interpret mode does not model this.)
    @pl.when((c_exit > 0) & (c_exit < n_chunks))
    def _():
        get_dma(jax.lax.rem(c_exit, 2), c_exit).wait()

    img_ref[0] = col
    tau_ref[0] = tau
    cont_ref[0] = cont


def backward_kernel(start_ref, nchunk_ref, packed_hbm, g_ref, tau_ref, cont_ref,
                    grads_hbm, scratch, gscratch, sem, wsem, *, gx, tile, k):
    p = tile * tile
    t = pl.program_id(0)
    start = start_ref[t]
    n_chunks = nchunk_ref[t]
    px, py = _pixel_coords(t, gx, tile, p)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    g = g_ref[0]          # [3,P] dL/dpixel for this tile
    final_tau = tau_ref[0]  # [P,1]
    cont = cont_ref[0]      # [P,1] int32

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * k, k)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, k)], scratch.at[slot], sem.at[slot]
        )

    def put_dma(slot, c):
        off = pl.multiple_of(start + c * k, k)
        return pltpu.make_async_copy(
            gscratch.at[slot], grads_hbm.at[:, pl.ds(off, k)], wsem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).start()

    def cond(state):
        c = state[0]
        return c >= 0

    def body(state):
        c, tau_end, gag = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c - 1).start()

        get_dma(slot, c).wait()
        data = scratch[slot]
        ap, (dx, dy, maha_raw, ux, uy, ca, cb, cc, alpha) = _chunk_alpha(data, px, py)
        idx0 = c * k + lane  # 0-based position within the tile list
        m = (idx0 < cont) & (ap >= ALPHA_SKIP)

        one_m = jnp.where(m, 1.0 - ap, 1.0)
        sfx = suffix_prod_inclusive(one_m)  # [P,K]
        tau_ex = tau_end / sfx              # T_{k-1} per entry (drawB division)
        new_tau_end = tau_end / sfx[:, 0:1]

        contr = jnp.where(m, tau_ex * ap, 0.0)  # [P,K]
        colc = data[6:9, :]  # [3,K]
        # cg[p,k] = sum_c g[c,p] * color[c,k]
        cg = jax.lax.dot_general(
            g, colc, (((0,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # [P,K]
        cgw = contr * cg
        # Gg[p,k] = g . (accumulated color behind entry k) — suffix sum + carry
        Gg = suffix_sum_exclusive(cgw) + gag
        new_gag = gag + jnp.sum(cgw, axis=1, keepdims=True)

        dap = jnp.where(m, tau_ex * cg - Gg / jnp.maximum(1.0 - ap, 1e-6), 0.0)
        unclamped = ap < ALPHA_CLAMP
        e = jnp.exp(-0.5 * jnp.maximum(0.0, maha_raw))
        dalpha = jnp.sum(jnp.where(m & unclamped, dap * e, 0.0), axis=0, keepdims=True)  # [1,K]
        dm = jnp.where(m & unclamped & (maha_raw > 0.0), dap * (-0.5) * ap, 0.0)  # [P,K]

        # moment sums over pixels (sublanes)
        s0 = jnp.sum(dm, axis=0, keepdims=True)
        sx = jnp.sum(dm * px, axis=0, keepdims=True)
        sy = jnp.sum(dm * py, axis=0, keepdims=True)
        sxx = jnp.sum(dm * px * px, axis=0, keepdims=True)
        sxy = jnp.sum(dm * px * py, axis=0, keepdims=True)
        syy = jnp.sum(dm * py * py, axis=0, keepdims=True)
        ex = ux * s0 - sx  # sum dm * dx
        ey = uy * s0 - sy
        dux = 2.0 * ca * ex + 2.0 * cb * ey
        duy = 2.0 * cc * ey + 2.0 * cb * ex
        dca = ux * ux * s0 - 2.0 * ux * sx + sxx
        dcb = 2.0 * (ux * uy * s0 - ux * sy - uy * sx + sxy)
        dcc = uy * uy * s0 - 2.0 * uy * sy + syy

        # dcolor[c,k] = sum_p g[c,p] * contr[p,k]
        dcolor = jax.lax.dot_general(
            g, contr, (((1,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # [3,K]

        wslot = jax.lax.rem(c, 2)
        gscratch[wslot, 0:1, :] = dux
        gscratch[wslot, 1:2, :] = duy
        gscratch[wslot, 2:3, :] = dca
        gscratch[wslot, 3:4, :] = dcb
        gscratch[wslot, 4:5, :] = dcc
        gscratch[wslot, 5:6, :] = dalpha
        gscratch[wslot, 6:9, :] = dcolor
        gscratch[wslot, 9:GRAD_ROWS, :] = jnp.zeros((GRAD_ROWS - 9, k), jnp.float32)
        put_dma(wslot, c).start()
        put_dma(wslot, c).wait()

        return c - 1, new_tau_end, new_gag

    gag0 = jnp.zeros((p, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (n_chunks - 1, final_tau, gag0))
