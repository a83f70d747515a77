"""Pallas TPU rasterisation kernels (stage 6 forward + backward).

TPU-native re-design of the CUDA draw/drawB kernels
(/root/reference/gsplatcu/kernel.cu:152-271, 809-950), built around a
*segmented chunk grid* instead of CUDA's one-block-per-tile model:

* the depth-and-tile-sorted patch list lives in HBM exactly as binning
  produced it — [max_patches, 16] attribute rows, no alignment padding, no
  re-packing scatter; the BlockSpec machinery double-buffers K-row chunks
  into VMEM;
* a chunk may span several tiles, so the grid iterates (chunk x tile)
  *segments* (ops/binning.segment_layout): each grid step processes one
  chunk block with lanes outside [seg_lo, seg_hi) masked out. Consecutive
  segments of one chunk reuse the resident block; consecutive segments of
  one tile accumulate into the same VMEM blend state;
* inside a chunk, entries sit along *sublanes* and pixels along lanes: the
  per-pixel sequential blend recurrence becomes a sublane-axis prefix
  product (lanescan.py) plus an MXU contraction for the color accumulation
  (CUDA: fetch2shared staging + a sequential per-pixel loop);
* a tile's blend state (color, transmittance, contributor counts)
  accumulates in VMEM scratch across its segments and is written to the HBM
  output blocks once, at the tile's last segment; tiles with no patches are
  never visited — the caller fills them from tile_cnt;
* per-pixel early termination (tau < 1e-4, kernel.cu:203-207) becomes a
  whole-tile compute skip via an SMEM flag once every pixel is saturated
  (a per-step vector->scalar reduce would stall the pipeline thousands of
  times);
* the backward walks segments in reverse, recovers transmittance by
  division (kernel.cu:916), carries (tau, accumulated-color-gradient) in
  VMEM scratch, and accumulates per-*patch* gradients into revisited
  chunk-aligned [K, 16] output blocks (zeroed at each chunk's first reverse
  visit) — a deterministic segment scatter-add outside replaces atomicAdd
  (kernel.cu:924-945). TPU has no atomics; determinism is a feature
  (bitwise-reproducible gradients).

Attribute row layout (PACK_ROWS = 16 columns):
  0 ux, 1 uy, 2 cinv_a, 3 cinv_b, 4 cinv_c, 5 alpha, 6 r, 7 g, 8 b, 9.. pad.
Padding entries (dropped patches, budget tail) carry alpha = 0 ->
alpha' = 0 -> no contribution and zero gradients.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.pallas.lanescan import (
    prefix_prod_exclusive,
    suffix_prod_inclusive,
)

ALPHA_CLAMP = 0.99
ALPHA_SKIP = 0.002
TAU_STOP = 1e-4
import os as _os

from easygaussiansplatting_tpu.utils.envflag import env_flag

# Log-space transmittance replay in the backward (see backward_kernel):
# DEFAULT ON since the r4 on-chip A/B — at SUB=64 the triangular MXU
# contraction beats the 6-round sublane scan (14.97 vs 14.68 Mpix/s in the
# winning combo; at the old SUB=128 it LOST, so the two defaults travel
# together). EGS_LOG_SCAN=0 restores the sequential-scan path (kept: it is
# the bit-exact mirror of the tiled/golden recurrence and the fallback if a
# future backend's exp/log rounding drifts).
# The analogous forward-side log scan was tried and REJECTED on-chip twice
# (r4: 13.80 vs 14.26 at SUB=64) — the forward's prefix product feeds the
# contribute >= TAU_STOP decision, and the extra exp/log ops cost more than
# the 6 scan rounds they replace; that variant is deleted, not flag-gated.
LOG_SCAN = env_flag("EGS_LOG_SCAN", default=True)
PACK_ROWS = 16  # attribute columns per patch row (see layout above)
GRAD_ROWS = 16  # kernel grad-block rows ([16,K] keeps full-tile writes);
GRAD_USED = 9  # only u/conic/alpha/color columns carry data — the VJP
# scatter moves just these
# All kernel dots pin Precision.HIGHEST: Mosaic's dot lowering rejects both
# per-operand precision tuples ("Per-operand dot precision unsupported",
# jax 0.8 mosaic/lowering.py:2244) and Precision.HIGH (NotImplementedError,
# :2254). A mixed (DEFAULT, HIGHEST) triangular contraction would give
# identical sums in 1x3 systolic passes instead of 3x3 — the 0/1 triangular
# operand and the <=225 integer moment basis are exact in one bf16 pass —
# worth re-probing if Mosaic grows per-operand precision.
_HI = jax.lax.Precision.HIGHEST
_DOT = jax.lax.Precision.HIGHEST


def _tri_dot(tri, x):
    """0/1 triangular [S,S] contracted with [S,P] — the MXU scan primitive."""
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(t, gx, tile, p):
    """TILE-LOCAL pixel coordinates as [1,P] lane-major rows (row-major
    within the tile: p = y*tile + x) plus the tile origin (scalars).

    The kernels work in tile-local coordinates: the gaussian means are
    shifted by the tile origin instead (dx = ux - px is shift-invariant, and
    so are all the moment identities in B.4). Two wins: (a) fp32 keeps more
    mantissa on the small local values than on ~1000-pixel global
    coordinates, and (b) the backward's moment basis (1, x, y, x^2, xy, y^2)
    becomes small exact integers (<= (tile-1)^2 = 225), i.e. EXACT in one
    bf16 pass — which would let a mixed-precision `mom` contraction halve
    its systolic passes once Mosaic supports per-operand dot precision
    (today every dot is pinned to HIGHEST, see _HI above)."""
    tx = t % gx
    ty = t // gx
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (lane % tile).astype(jnp.float32)
    py = (lane // tile).astype(jnp.float32)
    return px, py, (tx * tile).astype(jnp.float32), (ty * tile).astype(jnp.float32)


def _pix_basis(px, py, p):
    """[6,P] pixel moment basis (1, x, y, x^2, xy, y^2) for the backward's
    single-contraction moment sums (B.4.3). A [K,6]x[6,P] MXU evaluation of
    the Mahalanobis form itself was measured SLOWER than the direct VPU
    dx/dy path (contraction dim 6 wastes the 128-wide systolic array), so
    the basis is only used where the contraction dim is P."""
    one = jnp.ones((1, p), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py], axis=0)


def _prod_reduce(x):
    """[K,P] -> [1,P] product over sublanes by halving (K a power of two)."""
    k = x.shape[0]
    while k > 1:
        k //= 2
        x = x[:k] * x[k : 2 * k]
    return x


def _chunk_alpha(data, px, py, ox, oy):
    """alpha' [K,P] and reusables from a packed chunk [K,16]. `px`/`py` are
    tile-local; the means are shifted by the tile origin (ox, oy) so dx/dy
    (and everything downstream) live in the well-conditioned local frame."""
    ux = data[:, 0:1] - ox
    uy = data[:, 1:2] - oy
    ca = data[:, 2:3]
    cb = data[:, 3:4]
    cc = data[:, 4:5]
    alpha = data[:, 5:6]
    dx = ux - px  # [K,P]
    dy = uy - py
    maha_raw = ca * dx * dx + cc * dy * dy + 2.0 * cb * dx * dy  # (F.6.1)
    maha = jnp.maximum(0.0, maha_raw)
    ap = jnp.minimum(ALPHA_CLAMP, alpha * jnp.exp(-0.5 * maha))  # (F.6.2)
    return ap, (maha_raw, ux, uy, ca, cb, cc, alpha)


# sub-chunk rows: the unit of compute (and of scan depth). Smaller halves
# the tile-boundary overlap waste and drops a scan round, at the cost of
# more unrolled sub-chunk blocks per kernel; power of two >= 8 (validated:
# a non-power-of-two would make `range(k // sub)` silently skip the
# trailing k % sub rows of every chunk — corrupt image AND gradients —
# and break _prod_reduce's halving tree). Default 64 since the r4 on-chip
# A/B: 78.9% occupancy + 6 scan rounds beat 128's 65%/7 (14.26 vs 13.63
# Mpix/s alone; the SUB=32 rung's 3x block-dispatch count made it slower
# in r3), and [64,64] triangular MXU scans only win at this size.
SUB = int(_os.environ.get("EGS_SUB", "64"))
if SUB < 8 or SUB & (SUB - 1):
    raise ValueError(f"EGS_SUB must be a power of two >= 8, got {SUB}")

# r5 probe: drop the per-sub-chunk [lo, hi) overlap gates and compute every
# sub-chunk of every segment unconditionally (the in_seg/rowmask lane masks
# already make out-of-segment rows inert, so gating is purely a perf
# choice). If step time moves much less than the ~2.6x compute increase
# (26k sub-computes vs 10k gated), per-sub fixed costs — scalar reads,
# branch setup — dominate the kernels, not VPU/MXU work.
NO_SUBGATE = env_flag("EGS_NO_SUBGATE")


def forward_kernel(chunk_ref, tile_ref, lo_ref, hi_ref, pos_ref, first_ref,
                   last_ref, tail_ref, live_ref, slot_ref,
                   packed_ref, img_ref, tau_ref, cont_ref,
                   img_s, tau_s, cont_s, sat_s, *, gx, tile, k):
    p = tile * tile
    s = pl.program_id(0)
    t = tile_ref[s]
    # blend-state stream (EGS_INTERLEAVE). When off, the scratches are the
    # plain 2D r4 layout and indexing is the identity — the compiled kernel
    # is structurally identical to the landed r4 one (a [1, ...] leading
    # dim with indexed access stalled Mosaic compiles >15 min, r5).
    multi = img_s.ndim == 3
    sl = slot_ref[s] if multi else 0

    def at(ref):
        return ref.at[sl] if multi else ref

    px, py, ox, oy = _pixel_coords(t, gx, tile, p)

    @pl.when(first_ref[s] == 1)
    def _():
        at(img_s)[...] = jnp.zeros((3, p), jnp.float32)
        at(tau_s)[...] = jnp.ones((1, p), jnp.float32)
        at(cont_s)[...] = jnp.zeros((1, p), jnp.int32)
        sat_s[sl] = 0

    lo = lo_ref[s]
    hi = hi_ref[s]
    sub = min(SUB, k)

    # The chunk is processed in SUB-row sub-chunks, each gated by a scalar
    # overlap test against the segment's [lo, hi) row range: a big K block
    # amortises grid-step overhead without paying full-K compute on the
    # short tile-boundary segments (only the sub-chunk a boundary lands in
    # is ever computed twice). live_ref == 0: segment lies wholly in the
    # padding tail past the kept patch count — skip (the budget's ~1.5x
    # headroom otherwise costs real VPU time on alpha=0 rows).
    for sc in range(k // sub):
        s0 = sc * sub

        gate = ((sat_s[sl] == 0) & (live_ref[s] == 1)) if NO_SUBGATE else (
            (hi > s0) & (lo < s0 + sub) & (sat_s[sl] == 0)
            & (live_ref[s] == 1))

        @pl.when(gate)
        def _(s0=s0):
            tau = at(tau_s)[...]  # [1,P]
            data = packed_ref[s0:s0 + sub, :]  # [SUB,16] static slice
            # [SUB,1] row iota: the segment membership test is row-constant,
            # so keep it narrow and let broadcasting pay only one [SUB,P] op
            subc = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0) + s0
            in_seg = (subc >= lo) & (subc < hi)  # [SUB,1]
            ap, _ = _chunk_alpha(data, px, py, ox, oy)
            m1 = in_seg & (ap >= ALPHA_SKIP)
            one_m = jnp.where(m1, 1.0 - ap, 1.0)
            tau_ex = tau * prefix_prod_exclusive(one_m)  # [SUB,P] (F.6.3)
            contribute = m1 & (tau_ex >= TAU_STOP)  # (F.6.4)
            wgt = jnp.where(contribute, tau_ex * ap, 0.0)  # [SUB,P]
            colc = data[:, 6:9]  # [SUB,3]
            at(img_s)[...] = at(img_s)[...] + jax.lax.dot_general(
                colc, wgt, (((0,), (0,)), ((), ())), precision=_DOT,
                preferred_element_type=jnp.float32,
            )  # [3,P]
            # contribute-masked whole-sub-chunk product (must match what
            # the backward's suffix-product replay divides out, B.2.1):
            # a halving tree reduction costs ~SUB*P multiplies total, vs
            # 7*SUB*P for the old circular doubling (Mosaic has no
            # reduce-prod primitive). A log-space MXU variant of this
            # forward scan was REJECTED on the r4 chip A/B (see LOG_SCAN).
            new_tau = tau * _prod_reduce(jnp.where(contribute, 1.0 - ap, 1.0))
            at(tau_s)[...] = new_tau
            sat_s[sl] = (jnp.max(new_tau) < TAU_STOP).astype(jnp.int32)
            idx1 = pos_ref[s] + (subc - lo) + 1  # 1-based position in tile list
            at(cont_s)[...] = jnp.maximum(
                at(cont_s)[...],
                jnp.max(jnp.where(contribute, idx1, 0), axis=0, keepdims=True),
            )

    # Write the tile's outputs once, at its last segment.
    @pl.when(last_ref[s] == 1)
    def _():
        img_ref[0] = at(img_s)[...]
        tau_ref[0] = at(tau_s)[...]
        cont_ref[0] = at(cont_s)[...]


def backward_kernel(chunk_ref, tile_ref, lo_ref, hi_ref, pos_ref, first_ref,
                    last_ref, tail_ref, live_ref, slot_ref, *refs,
                    gx, tile, k, q_total, interleaved=False):
    if interleaved:
        # extra prefetch: chunk-flush flag (last reverse visit of a chunk);
        # extra scratch: per-stream [GRAD_ROWS, k] accumulators + DMA sem +
        # pending flags. grads_ref is the FULL [GRAD_ROWS, M] array (ANY):
        # with tiles interleaved a chunk's segments are not adjacent, so
        # the out-BlockSpec revisit pattern (which only keeps a block
        # resident across CONSECUTIVE same-index steps) can no longer
        # carry the read-modify-write accumulation — each stream
        # accumulates in scratch and DMAs the finished chunk block out.
        (flush_ref, maxcont_ref, packed_ref, g_ref, tau_ref, cont_ref,
         grads_ref, tau_s, gag_s, grad_s, dma_sem, pending) = refs
    else:
        (maxcont_ref, packed_ref, g_ref, tau_ref, cont_ref, grads_ref,
         tau_s, gag_s) = refs
    p = tile * tile
    i = pl.program_id(0)
    rs = q_total - 1 - i  # segments are visited back-to-front
    t = tile_ref[rs]
    multi = tau_s.ndim == 3  # interleaved: one carry per stream
    n_slots = tau_s.shape[0] if multi else 1
    sl = slot_ref[rs] if multi else 0

    def at(ref):
        return ref.at[sl] if multi else ref
    px, py, ox, oy = _pixel_coords(t, gx, tile, p)
    q = _pix_basis(px, py, p)

    if interleaved:
        @pl.when(i == 0)
        def _():
            for pp in range(n_slots):
                pending[pp] = 0

    # First visit of this tile (its last segment): load the final
    # transmittance (B.2.1 carry init), clear the color-gradient carry
    # (B.2.2; drawB kernel.cu:899-916).
    @pl.when(last_ref[rs] == 1)
    def _():
        at(tau_s)[...] = tau_ref[0]
        at(gag_s)[...] = jnp.zeros((1, p), jnp.float32)

    # First reverse visit of this chunk: zero its gradient block (revisited
    # across this chunk's segments; masked writes accumulate into it). The
    # block is transposed [GRAD_ROWS, K] — entries on lanes — so the full
    # [16, M] gradient array stays lane-compact in HBM (an [M, 16] layout
    # would lane-pad 16 -> 128 and write 8x the bytes).
    if interleaved:
        @pl.when(tail_ref[rs] == 1)
        def _():
            # drain this stream's previous in-flight writeback before
            # reusing its scratch
            @pl.when(pending[sl] == 1)
            def _():
                pltpu.make_async_copy(
                    grad_s.at[sl], grads_ref.at[sl, slice(None), pl.ds(0, k)],
                    dma_sem.at[sl],
                ).wait()
            pending[sl] = 0
            grad_s[sl] = jnp.zeros((GRAD_ROWS, k), jnp.float32)
    else:
        @pl.when(tail_ref[rs] == 1)
        def _():
            grads_ref[:] = jnp.zeros((GRAD_ROWS, k), jnp.float32)

    lo = lo_ref[rs]
    hi = hi_ref[rs]
    pos = pos_ref[rs]
    sub = min(SUB, k)

    # Sub-chunks walk back-to-front inside the reverse segment walk. Each is
    # gated by scalar tests: range overlap with [lo, hi), the per-tile max
    # contributor count (B.2.3 — precomputed outside so the test stays
    # scalar, no per-step vector->scalar pipeline stall), and the padding
    # tail.
    for sc in reversed(range(k // sub)):
        s0 = sc * sub

        gate = (live_ref[rs] == 1) if NO_SUBGATE else (
            (hi > s0) & (lo < s0 + sub)
            & (maxcont_ref[t] > pos + jnp.maximum(0, s0 - lo))
            & (live_ref[rs] == 1))

        @pl.when(gate)
        def _(s0=s0):
            cont = cont_ref[0]  # [1,P] int32
            data = packed_ref[s0:s0 + sub, :]  # [SUB,16]
            g = g_ref[0]  # [3,P] dL/dpixel for this tile
            ap, (maha_raw, ux, uy, ca, cb, cc, alpha) = _chunk_alpha(
                data, px, py, ox, oy)  # ux/uy are tile-local (match q)
            subc = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0) + s0
            rowmask = (subc >= lo) & (subc < hi)  # [SUB,1] (segment test is
            # row-constant; broadcast against the per-pixel cont below)
            idx0 = pos + (subc - lo)  # [SUB,1]
            m = rowmask & (idx0 < cont) & (ap >= ALPHA_SKIP)

            one_m = jnp.where(m, 1.0 - ap, 1.0)
            tau_end = at(tau_s)[...]
            if LOG_SCAN:
                # suffix product + division in log space: the 7-round
                # sublane Hillis-Steele scan and the [SUB,P] divide become
                # one log, one triangular MXU contraction, and one exp —
                # tau_ex = tau_end * exp(-sum_{j>=k} log(1-ap_j)) (B.2.1).
                # one_m >= 0.01 (ALPHA_CLAMP), masked rows are exactly 1.0
                # -> log exactly 0, so masking survives the round-trip.
                lg = jnp.log(one_m)
                tri_ge = (
                    jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
                    >= jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
                ).astype(jnp.float32)
                lsfx = _tri_dot(tri_ge, lg)  # [SUB,P] incl. suffix sum of logs
                tau_ex = tau_end * jnp.exp(-lsfx)
                at(tau_s)[...] = tau_end * jnp.exp(-lsfx[0:1, :])
            else:
                sfx = suffix_prod_inclusive(one_m)  # [SUB,P] (B.2.1)
                tau_ex = tau_end / sfx      # T_{k-1} per entry (B.2.1; drawB division)
                at(tau_s)[...] = tau_end / sfx[0:1, :]

            contr = jnp.where(m, tau_ex * ap, 0.0)  # [SUB,P]
            colc = data[:, 6:9]  # [SUB,3]
            # cg[k,p] = sum_c color[k,c] * g[c,p]  (B.5.2) — contraction dim
            # is 3: on the MXU that still pays full systolic passes (~6x the
            # cost of the 5 VPU broadcast ops it actually needs)
            cg = (colc[:, 0:1] * g[0:1, :] + colc[:, 1:2] * g[1:2, :]
                  + colc[:, 2:3] * g[2:3, :])  # [SUB,P]
            cgw = contr * cg
            # Gg[k,p] = g . (accumulated color behind entry k) — the
            # exclusive suffix sum (B.2.2) as ONE strictly-upper-triangular
            # MXU contraction ([SUB,SUB] x [SUB,P]): the 7-round sublane
            # Hillis-Steele scan was ~1/6 of the kernel's VPU time, and a
            # linear map belongs on the systolic array
            gag = at(gag_s)[...]
            tri = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
                > jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
            ).astype(jnp.float32)
            Gg = _tri_dot(tri, cgw) + gag
            # Gg[0] = gag + sum_{j>0} cgw[j], so the new carry is free:
            at(gag_s)[...] = Gg[0:1, :] + cgw[0:1, :]

            # dL/dalpha' (B.1.2), then the alpha'-decomposition masks (B.3)
            dap = jnp.where(m, tau_ex * cg - Gg / jnp.maximum(1.0 - ap, 1e-6), 0.0)
            unclamped = ap < ALPHA_CLAMP
            # e = exp(-maha/2) is recovered from ap = alpha*e (B.3.1)
            # instead of a second [SUB,P] exp: dap*e = dap*ap/alpha, with
            # the division hoisted outside the pixel sum (alpha is
            # per-entry). m implies ap >= 0.002 so alpha >= 0.002 and the
            # guard never bites on live entries.
            dap_ap = dap * ap
            dalpha = jnp.sum(
                jnp.where(m & unclamped, dap_ap, 0.0), axis=1, keepdims=True
            ) / jnp.maximum(alpha, 1e-12)  # [SUB,1]
            dm = jnp.where(m & unclamped & (maha_raw > 0.0), -0.5 * dap_ap, 0.0)

            # moment sums over pixels (B.4.3) as ONE MXU contraction:
            # dm[SUB,P] @ basis^T[P,6] -> all six moments at once
            # (contraction dim P=256 uses the systolic array well; six
            # separate lane reductions + five [SUB,P] multiplies were
            # measured slower). The tile-local basis entries are integers
            # <= 225 — EXACT in one bf16 pass — a per-operand mixed
            # precision here would be free once Mosaic lowers it (_HI note
            # at the top of the file).
            mom = jax.lax.dot_general(
                dm, q, (((1,), (1,)), ((), ())), precision=_HI,
                preferred_element_type=jnp.float32,
            )  # [SUB,6]: sum dm * {1, x, y, x^2, xy, y^2}
            s0m = mom[:, 0:1]
            sx = mom[:, 1:2]
            sy = mom[:, 2:3]
            sxx = mom[:, 3:4]
            sxy = mom[:, 4:5]
            syy = mom[:, 5:6]
            ex = ux * s0m - sx  # sum dm * dx (B.4.3)
            ey = uy * s0m - sy
            dux = 2.0 * ca * ex + 2.0 * cb * ey  # (B.4.4)
            duy = 2.0 * cc * ey + 2.0 * cb * ex
            dca = ux * ux * s0m - 2.0 * ux * sx + sxx  # (B.4.5)
            dcb = 2.0 * (ux * uy * s0m - ux * sy - uy * sx + sxy)
            dcc = uy * uy * s0m - 2.0 * uy * sy + syy

            # dcolor[k,c] = sum_p contr[k,p] * g[c,p]  (B.1.1 as one MXU
            # contraction, B.5.1)
            dcolor = jax.lax.dot_general(
                contr, g, (((1,), (1,)), ((), ())), precision=_DOT,
                preferred_element_type=jnp.float32,
            )  # [SUB,3]

            # masked read-modify-write (B.6.1) on this sub-chunk's lanes:
            # other segments own the other lanes of the chunk block
            colmask = rowmask.reshape(1, sub)  # [1,SUB]
            cs = slice(s0, s0 + sub)
            if interleaved:
                gref = grad_s.at[sl]
            else:
                gref = grads_ref
            gref[0:1, cs] = jnp.where(colmask, dux.reshape(1, sub), gref[0:1, cs])
            gref[1:2, cs] = jnp.where(colmask, duy.reshape(1, sub), gref[1:2, cs])
            gref[2:3, cs] = jnp.where(colmask, dca.reshape(1, sub), gref[2:3, cs])
            gref[3:4, cs] = jnp.where(colmask, dcb.reshape(1, sub), gref[3:4, cs])
            gref[4:5, cs] = jnp.where(colmask, dcc.reshape(1, sub), gref[4:5, cs])
            gref[5:6, cs] = jnp.where(colmask, dalpha.reshape(1, sub), gref[5:6, cs])
            gref[6:9, cs] = jnp.where(colmask, dcolor.T, gref[6:9, cs])

    if interleaved:
        # chunk finished on this stream: DMA its [GRAD_ROWS, k] block to the
        # flat gradient array; the wait is deferred to the stream's next
        # chunk zero-init (or the final drain below)
        @pl.when(flush_ref[rs] == 1)
        def _():
            ch = chunk_ref[rs]
            pltpu.make_async_copy(
                grad_s.at[sl], grads_ref.at[sl, slice(None), pl.ds(ch * k, k)],
                dma_sem.at[sl],
            ).start()
            pending[sl] = 1

        @pl.when(i == q_total - 1)
        def _():
            for pp in range(n_slots):
                @pl.when(pending[pp] == 1)
                def _(pp=pp):
                    pltpu.make_async_copy(
                        grad_s.at[pp],
                        grads_ref.at[pp, slice(None), pl.ds(0, k)],
                        dma_sem.at[pp],
                    ).wait()
                    pending[pp] = 0
