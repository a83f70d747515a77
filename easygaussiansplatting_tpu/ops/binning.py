"""Tile binning: fixed-capacity, sort-based, fully jittable.

TPU-native replacement for the reference's getRects -> inclusive_scan ->
createKeys -> thrust::sort_by_key -> getRanges chain
(/root/reference/gsplatcu/gausplat.cu:24-112, kernel.cu:46-150), redesigned
for static shapes:

* Gaussians are argsorted by depth once (N elements), so patch expansion in
  depth order only needs a *stable* sort by tile id afterwards — replacing
  the reference's 64-bit (tile << 32 | mm-quantised-depth) radix keys with an
  exact-depth ordering (see golden/model.py for the contract note).
* Patch expansion into a fixed budget of `max_patches` slots is a vectorised
  searchsorted over the inclusive count cumsum — no dynamic shapes, no host
  round-trip for the total (the reference reads the scan result back on the
  host, gausplat.cu:67).
* Per-tile [start, end) ranges are a searchsorted over the sorted tile keys.

Overflow policy: if the true patch count exceeds `max_patches`, the patches
of the *deepest* Gaussians are dropped (they are the least visible under
front-to-back blending); `n_dropped` reports the loss — no silent truncation.
"""

from functools import partial

import jax
import jax.numpy as jnp

from easygaussiansplatting_tpu.utils.envflag import env_flag

TILE = 16  # pixels per tile edge (parity with reference BLOCK, common.cuh:13)


def num_tiles(width, height, tile=TILE):
    gx = -(-width // tile)
    gy = -(-height // tile)
    return gx, gy


def gaussian_rects(us, areas, valid, width, height, tile=TILE):
    """Tile-space rects [N,4] (x0,y0,x1,y1) and updated validity.

    Parity: getRects (/root/reference/gsplatcu/kernel.cu:82-122).
    """
    gx, gy = num_tiles(width, height, tile)
    x0 = jnp.clip(jnp.floor((us[:, 0] - areas[:, 0]) / tile), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((us[:, 1] - areas[:, 1]) / tile), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((us[:, 0] + areas[:, 0]) / tile), 0, gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((us[:, 1] + areas[:, 1]) / tile), 0, gy).astype(jnp.int32)
    n = (x1 - x0) * (y1 - y0)
    valid = valid & (n > 0)
    return jnp.stack([x0, y0, x1, y1], axis=1), valid


def _scan1(x):
    """Inclusive 1D cumsum via the one-pass Pallas kernel (XLA's log-ladder
    lowering costs ~3 ms per 1M elements; the kernel ~0.1 ms)."""
    from easygaussiansplatting_tpu.ops.pallas.scan import multi_cumsum

    return multi_cumsum(x[None])[0]


def _propagate_marks(starts, values, budget):
    """Scatter the segment-value deltas at the segment starts (see
    _propagate); the caller integrates with a cumsum — batched across
    several propagations where possible."""
    deltas = jnp.diff(values, prepend=values.dtype.type(0))
    return jnp.zeros(budget, values.dtype).at[starts].add(deltas, mode="drop")


def _propagate(starts, values, budget):
    """Piecewise-constant segment attribute -> per-slot array.

    `starts[i]` is the first slot of (possibly empty) segment i, non-
    decreasing; `values[i]` its attribute. Scatters the deltas between
    consecutive segment values at the segment starts and integrates with a
    running sum. Empty segments collapse onto the same start index and their
    deltas telescope away. This is the TPU-friendly replacement for
    `values[searchsorted(...)]`: a 1M-index random gather runs two orders of
    magnitude slower than scatter + cumsum on TPU.
    """
    return _scan1(_propagate_marks(starts, values, budget))


ALPHA_SKIP = 0.002  # blend skip threshold (parity: kernels.py / kernel.cu)


@partial(jax.jit, static_argnames=("width", "height", "tile", "max_patches",
                                   "max_rows", "gsid_counts"))
def bin_gaussians(us, depths, areas, valid, *, width, height, tile=TILE, max_patches,
                  max_rows=None, cinv2ds=None, alphas=None, gsid_counts=False):
    """Build the per-tile draw lists.

    Patch expansion is two-level (gaussian -> covered tile-rows -> covered
    tiles) with every per-slot attribute produced by `_propagate` — the whole
    expansion is scatters, cumulative sums, and elementwise math: no integer
    divide/modulo and no large random gathers, the two ops TPUs punish.

    **Ellipse row culling** (pass `cinv2ds` [N,3] conics + `alphas` [N]):
    each tile-row's x-extent is clipped to the alpha' >= ALPHA_SKIP ellipse
    (sigma <= 2 ln(alpha/0.002)) intersected with the reference's 3-sigma
    AABB. Every dropped tile is one where NO pixel can pass the blend skip
    test, so images and gradients are exactly what the AABB candidate set
    produces — but the patch count (and with it the sort, the gradient
    scatter, and the kernels' per-patch work) shrinks wherever splats span
    multiple tiles: measured ~7% on the small-splat bench scene (1-2 tiles
    per splat — AABB is near-tight at tile granularity) and 20-40% on
    large/anisotropic splats (early training, SfM init, close-ups). Also
    culls alpha <= 0.002 gaussians outright. Without conics the extent test
    degenerates to the plain AABB (r^2 = inf). [The reference bins the full
    AABB, getRects kernel.cu:82-122, and pays for the corners in draw.]

    Returns dict:
      patch_gsid  [max_patches] int32 — original Gaussian index per patch,
                  sorted by (tile, depth); padding slots hold -1.
      tile_start  [T] int32, tile_cnt [T] int32 — per-tile ranges.
      total       int32 — patch count of the materialised rows after
                  ellipse culling, before the patch-budget cap.
      n_dropped   int32 — patches beyond the patch budget (0 in healthy
                  runs).
      rows_dropped int32 — tile-rows beyond the row budget (their per-row
                  ellipse extents are never materialised, so their patches
                  cannot be counted in n_dropped — any nonzero value means
                  deepest rows were lost).
      total_rows  int32 — AABB-covered tile-rows (drives max_rows).

    `max_rows` bounds the intermediate tile-row expansion (rows <= patches
    always, and typically ~patches / mean-splat-width): the level-2 scatter
    cost scales with it, so a tight row budget saves real time. None = safe
    bound max_patches. Rows past the budget drop like patches past
    max_patches (deepest first).
    """
    from easygaussiansplatting_tpu.ops.pallas.scan import batched_cumsum

    if max_rows is None:
        max_rows = max_patches
    n = us.shape[0]
    gx, gy = num_tiles(width, height, tile)
    n_tiles = gx * gy
    f32 = jnp.float32 if us.dtype != jnp.float64 else jnp.float64

    if alphas is not None:
        # alpha < skip: no pixel anywhere can blend (the kernels test
        # ap >= ALPHA_SKIP and ap <= alpha, so alpha == ALPHA_SKIP can still
        # contribute at the exact centre pixel — keep the cull strictly
        # conservative with >=)
        valid = valid & (jax.lax.stop_gradient(alphas) >= ALPHA_SKIP)

    # Depth-sort the gaussians (invalid ones to the back). sort_key_val runs
    # ~10x faster than a stable argsort; depth ties order arbitrarily but
    # deterministically (the reference quantises depth keys to millimetres,
    # kernel.cu:46-80, so its tie order is no stronger). Depths are positive
    # (culled entries -> +inf), so their IEEE bit patterns sort identically
    # as int32 — and the integer radix sort is ~20% faster still.
    fkeys = jnp.where(valid, depths, jnp.inf)
    int_t = jnp.int64 if fkeys.dtype == jnp.float64 else jnp.int32
    keys = jax.lax.bitcast_convert_type(fkeys, int_t)
    _, order = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
    rects, valid = gaussian_rects(us, areas, valid, width, height, tile)
    rects_s = rects[order]
    valid_s = valid[order]

    x0, y0, x1, y1 = rects_s[:, 0], rects_s[:, 1], rects_s[:, 2], rects_s[:, 3]

    # Per-gaussian attribute table for the per-row extent test (gathered by
    # the propagated row_ord below): mean, conic, skip-ellipse radius^2,
    # AABB x-range. r2 = inf (no conic) makes the test a no-op AABB clip.
    usg = jax.lax.stop_gradient(us).astype(f32)
    if cinv2ds is not None:
        cg = jax.lax.stop_gradient(cinv2ds).astype(f32)
        ag = jnp.maximum(jax.lax.stop_gradient(alphas).astype(f32), 1e-12)
        # margin keeps decisions strictly conservative vs the kernels' own
        # fp32 alpha' >= 0.002 test
        r2 = 2.0 * jnp.log(ag / ALPHA_SKIP) * (1.0 + 1e-5) + 1e-4
        r2 = jnp.maximum(r2, 0.0)
    else:
        cg = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0]], f32), (n, 1))
        r2 = jnp.full((n,), jnp.inf, f32)
    gtab = jnp.concatenate(
        [usg, cg, r2[:, None],
         rects[:, 0:1].astype(f32), rects[:, 2:3].astype(f32)], axis=1
    )  # [N, 8]: ux uy A B C r2 x0 x1  (ORIGINAL gaussian order)

    # Level 1: one slot per covered tile-row of each gaussian. Row slot j of
    # gaussian i covers tile-row y0[i] + (j - rstart[i]), so ty0 = y0 -
    # rstart is segment-constant. Each propagation stays a flat array —
    # batching along a minor axis pads to the 128-lane tile (measured 40x
    # scan-bandwidth waste).
    row_counts = jnp.where(valid_s, y1 - y0, 0).astype(jnp.int32)
    rcum = jnp.cumsum(row_counts)
    rstart = rcum - row_counts
    total_rows = rcum[-1]
    mr = jnp.arange(max_rows, dtype=jnp.int32)
    rows_ok = mr < jnp.minimum(total_rows, max_rows)
    ty0_prop, row_ord = batched_cumsum([
        _propagate_marks(rstart, y0 - rstart, max_rows),
        _propagate_marks(rstart, order, max_rows),
    ])
    row_ty = ty0_prop + mr  # tile-row of each row slot
    row_gs = jnp.clip(row_ord, 0, n - 1)

    # Per-row ellipse x-extent (one 32B-row gather + a few flops per row).
    # For pixel rows dy in [dy0, dy1] the ellipse A dx^2 + 2B dx dy + C dy^2
    # <= r2 has dx in [xc - sr, xc + sr] with xc = -B dy / A and
    # sr = sqrt(A r2 - det dy^2) / A; bounding xc and sr independently over
    # the interval is conservative.
    g = jnp.take(gtab, row_gs, axis=0)  # [max_rows, 8]
    ux, uy, ca, cb, cc = g[:, 0], g[:, 1], g[:, 2], g[:, 3], g[:, 4]
    r2r, rx0_aabb, rx1_aabb = g[:, 5], g[:, 6], g[:, 7]
    ftile = jnp.asarray(tile, f32)
    dy0 = row_ty.astype(f32) * ftile - uy
    dy1 = dy0 + (ftile - 1.0)
    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    ca_safe = jnp.maximum(ca, 1e-12)
    dy_min2 = jnp.where(dy0 * dy1 > 0, jnp.minimum(dy0 * dy0, dy1 * dy1), 0.0)
    disc = ca * r2r - det * dy_min2
    sr = jnp.sqrt(jnp.maximum(disc, 0.0)) / ca_safe
    xc0 = -cb * dy0 / ca_safe
    xc1 = -cb * dy1 / ca_safe
    # half-pixel fp margin on both sides
    x_lo = ux + jnp.minimum(xc0, xc1) - sr - 0.5
    x_hi = ux + jnp.maximum(xc0, xc1) + sr + 0.5
    ex0 = jnp.clip(jnp.floor(x_lo / ftile), rx0_aabb, rx1_aabb)
    ex1 = jnp.clip(jnp.floor(x_hi / ftile) + 1.0, ex0, rx1_aabb)
    rx0 = ex0.astype(jnp.int32)
    row_w_raw = jnp.where(disc >= 0, (ex1 - ex0).astype(jnp.int32), 0)
    row_w = jnp.where(rows_ok, row_w_raw, 0)

    # Level 2: one slot per covered tile of each row. Patch slot m of row j
    # is tile (row_ty * gx + rx0) + (m - start2[j]), so
    # base = row_ty * gx + rx0 - start2 is again segment-constant per row.
    wcum = _scan1(row_w)
    total = wcum[-1]  # true (post-cull) patch count before the budget cap
    kept = jnp.minimum(total, max_patches)
    start2 = wcum - row_w
    base = row_ty * gx + rx0 - start2
    m = jnp.arange(max_patches, dtype=jnp.int32)
    in_range = m < kept
    prop_base, prop_ord = batched_cumsum([
        _propagate_marks(start2, base, max_patches),
        _propagate_marks(start2, row_ord, max_patches),
    ])
    tile_id = jnp.where(in_range, prop_base + m, n_tiles).astype(jnp.int32)
    gsid = jnp.where(in_range, prop_ord, -1)

    # Per-tile ranges from the ROW intervals, not from the sorted keys: a
    # searchsorted of 2k tile boundaries over the 573k sorted keys costs ~20
    # sequential gather rounds (~1.4 ms measured, scripts/bisect_perf.py
    # --section binning2); the same counts are one fused compare-reduce over
    # [T+1, max_rows] (~0.5 G lane ops) that XLA can also schedule in
    # parallel with the sort instead of serially after it. Row r's patches
    # occupy slots [start2_r, start2_r + w_r) covering tiles
    # [tlo_r, tlo_r + w_r); the budget keeps slots < kept, so the row's
    # kept width is min(w, kept - start2) clamped at 0 — summing interval
    # indicators reproduces the sorted array's tile ranges exactly,
    # including the drop-deepest truncation.
    tlo = row_ty * gx + rx0
    wk = jnp.maximum(jnp.minimum(row_w, kept - start2), 0)
    t_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    covered = (t_iota[:, None] >= tlo[None, :]) & (
        t_iota[:, None] < (tlo + wk)[None, :]
    )
    tile_cnt = jnp.sum(covered, axis=1, dtype=jnp.int32)
    tcum = jnp.cumsum(tile_cnt)
    tile_start = tcum - tile_cnt

    # Sort by tile id keeping depth order within each tile: the (tile, slot)
    # pair packs into one int32 key when the bit budget allows (unique keys
    # -> stability for free, and a single-key sort_key_val radix sort), else
    # fall back to a stable two-operand sort.
    mp_bits = max(1, (max_patches - 1).bit_length())
    on_tpu = jax.default_backend() == "tpu" and us.dtype != jnp.float64
    if env_flag("EGS_RADIX_SORT"):
        # Pallas two-pass counting sort (ops/pallas/radix.py): the patch
        # array is already in slot order, so the tile sort is a stable
        # small-alphabet partition — chunk-local bitonic + one DMA move per
        # (bucket, chunk) run replaces the comparator-network sort. Stable
        # by construction: no (tile, slot) key packing needed. Opt-in
        # pending the r4 on-chip A/B (replaces thrust::sort_by_key,
        # gausplat.cu:82).
        from easygaussiansplatting_tpu.ops.pallas.radix import (
            counting_sort_by_tile,
        )

        tile_sorted, gsid_sorted = counting_sort_by_tile(
            tile_id, gsid, n_tiles=n_tiles
        )
    elif (n_tiles + 1) << mp_bits <= 2**31:
        key = (tile_id << mp_bits) | m
        key_sorted, gsid_sorted = jax.lax.sort_key_val(key, gsid)
        tile_sorted = key_sorted >> mp_bits
    elif (n_tiles + 1) << mp_bits <= 2**32:
        # one more bit of headroom through uint32: flipping the sign bit
        # maps unsigned order onto int32 order, so the composite key still
        # rides the fast single-key radix sort_key_val (the stable variadic
        # two-operand sort it replaces measured ~1.5x slower). This is the
        # bench/eval regime: 2171 tiles x 2^20 patch slots needs 32 bits.
        sign = jnp.uint32(1 << 31)
        key_u = (tile_id.astype(jnp.uint32) << mp_bits) | m.astype(jnp.uint32)
        key = jax.lax.bitcast_convert_type(key_u ^ sign, jnp.int32)
        key_sorted, gsid_sorted = jax.lax.sort_key_val(key, gsid)
        ks_u = jax.lax.bitcast_convert_type(key_sorted, jnp.uint32) ^ sign
        tile_sorted = (ks_u >> mp_bits).astype(jnp.int32)
    elif on_tpu and env_flag("EGS_LEX_SORT"):
        # composite key overflows int32 (>2047 tiles at a 2^20 patch
        # budget — e.g. the 979x546 eval resolution): lexicographic
        # (tile, slot) two-word key through the Pallas bitonic sort; slot
        # uniqueness gives the required depth-stability. Measured SLOWER
        # in-context than XLA's stable variadic sort at 786k patches
        # (bench 12.77 vs 13.30 Mpix/s) — kept behind EGS_LEX_SORT=1 for
        # re-evaluation at larger budgets, where the bitonic network's
        # better scaling may flip the verdict.
        from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs

        tile_sorted, _, gsid_sorted = sort_pairs(tile_id, m, gsid, n_keys=2)
    else:
        tile_sorted, gsid_sorted = jax.lax.sort(
            (tile_id, gsid), dimension=0, is_stable=True, num_keys=1
        )

    out = {
        "patch_gsid": gsid_sorted,
        "patch_tile": tile_sorted,
        "tile_start": tile_start,
        "tile_cnt": tile_cnt,
        "total": total,
        "n_dropped": total - kept,
        "total_rows": total_rows,
        # rows past the row budget are dropped before their patches can be
        # counted, so they never show in n_dropped — report them separately
        # (the trainer folds both into its overflow signal)
        "rows_dropped": total_rows - jnp.minimum(total_rows, max_rows),
    }
    if gsid_counts:
        # Per-gaussian kept-patch count, original id order — the Pallas
        # backward's sort-reduce gradient accumulation (rasterize.py
        # _raster_table_bwd) turns these into segment-end positions, which
        # replaces a 786k-query searchsorted with one cheap cumsum. A
        # depth-sorted gaussian's patches are the contiguous expansion
        # slots [wcum_excl(rstart), wcum_excl(rstart + rows)), clipped to
        # the row and patch budgets exactly as the expansion itself clips.
        wcum_pad = jnp.concatenate([jnp.zeros(1, wcum.dtype), wcum])
        lo_cnt = jnp.minimum(wcum_pad[jnp.clip(rstart, 0, max_rows)], kept)
        hi_cnt = jnp.minimum(
            wcum_pad[jnp.clip(rstart + row_counts, 0, max_rows)], kept
        )
        count_sorted = (hi_cnt - lo_cnt).astype(jnp.int32)  # by depth rank
        # invert the depth permutation: counts_by_id[order[r]] = counts[r].
        # A key sort of (order, counts) IS that inversion (order is a
        # permutation, so the sorted keys are 0..n-1) — on TPU this rides
        # the Pallas bitonic sort; a 65k scatter-set would cost ~10x more.
        if (jax.default_backend() == "tpu" and us.dtype != jnp.float64
                and not env_flag("EGS_XLA_GRAD_SORT", default=True)):
            from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs

            _, by_id = sort_pairs(order, count_sorted)
        else:
            _, by_id = jax.lax.sort_key_val(order, count_sorted)
        out["gsid_counts"] = by_id
    return out


@partial(jax.jit, static_argnames=("k_chunk", "n_tiles", "interleave"))
def segment_layout(binning, *, k_chunk, n_tiles, interleave=1):
    """(chunk x tile) segment metadata for the streaming Pallas rasteriser.

    The kernels stream the *unpadded* sorted patch array in K-entry chunks;
    a chunk may span several tiles, so the grid iterates maximal runs that
    lie in one chunk AND one tile ("segments"). Segment boundaries are the
    union of the chunk boundaries and the tile starts, giving a static
    Q = max_patches // K + n_tiles grid. Compared to physically re-packing
    every tile's list to chunk-aligned slots, this removes the 1M-row
    alignment scatter, the alignment padding's DMA, and the backward
    unshuffle entirely.

    Returns [Q] int32 prefetch arrays:
      seg_chunk  — input chunk (block index into the packed patch array)
      seg_tile   — owning tile (empty tiles never appear; the caller masks
                   their outputs with tile_cnt)
      seg_lo/hi  — the segment's sublane range within the chunk (lo == hi
                   for zero-length segments)
      seg_pos    — position of the segment's first entry in its tile's list
      seg_first / seg_last — tile-boundary flags (blend-state init / output
                   write-back)
      chunk_tail — 1 on the last segment of each chunk (backward grad-block
                   zero-init, which walks segments in reverse)
    """
    start = binning["tile_start"]
    m = binning["patch_gsid"].shape[0]
    k = k_chunk
    n_chunks = m // k

    bounds = jnp.concatenate(
        [jnp.arange(n_chunks, dtype=jnp.int32) * k, start.astype(jnp.int32)]
    )
    seg_start = jnp.sort(bounds)
    seg_end = jnp.concatenate([seg_start[1:], jnp.full(1, m, jnp.int32)])
    seg_chunk = jnp.minimum(seg_start // k, n_chunks - 1)
    seg_lo = seg_start - seg_chunk * k
    seg_hi = jnp.minimum(seg_lo + (seg_end - seg_start), k)
    # owning tile: the last tile whose start <= seg_start (empty tiles lose
    # the tie and are skipped; their outputs are masked by tile_cnt outside)
    seg_tile = (
        jnp.searchsorted(start, seg_start, side="right").astype(jnp.int32) - 1
    )
    seg_tile = jnp.clip(seg_tile, 0, n_tiles - 1)
    seg_pos = seg_start - start[seg_tile]
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), seg_tile[:-1]])
    nxt = jnp.concatenate([seg_tile[1:], jnp.full(1, -1, jnp.int32)])
    nxt_chunk = jnp.concatenate([seg_chunk[1:], jnp.full(1, -1, jnp.int32)])
    # padding tail: slots past the kept patch count hold gsid -1 and sort to
    # the end; segments fully inside the tail carry no work. The budget runs
    # ~1.5x the true patch count (adaptive headroom), so gating on this flag
    # saves the kernels' compute on alpha=0 padding rows.
    kept = jnp.sum(binning["tile_cnt"])
    meta = {
        "seg_chunk": seg_chunk,
        "seg_tile": seg_tile,
        "seg_lo": seg_lo,
        "seg_hi": seg_hi,
        "seg_pos": seg_pos,
        "seg_first": (seg_tile != prev).astype(jnp.int32),
        "seg_last": (seg_tile != nxt).astype(jnp.int32),
        "chunk_tail": (seg_chunk != nxt_chunk).astype(jnp.int32),
        "seg_live": (seg_start < kept).astype(jnp.int32),
    }
    if interleave <= 1:
        meta["seg_slot"] = jnp.zeros_like(seg_chunk)
        return meta

    # Tile-interleaved segment order (r5): consecutive grid steps belong to
    # DIFFERENT tiles, so the per-tile transmittance carry chain — whose
    # serial latency through the sub-chunk scans/MXU contractions bounds
    # the backward kernel — no longer stalls the units between steps.
    # Streams = tile % interleave; segments are reordered round-robin
    # across streams (position within stream is the primary key), which
    # preserves every tile's internal segment order (the blend recurrence)
    # and every chunk's internal order under reversal. Each segment carries
    # its stream in seg_slot: the kernels keep one blend/carry state per
    # stream in scratch. The chunk-gradient flags are recomputed on the NEW
    # order (a chunk's segments are no longer adjacent): bwd_zero marks a
    # chunk's first visit in the backward's reverse walk, bwd_flush its
    # last — the backward accumulates in per-stream scratch and DMAs the
    # finished [16, k] chunk gradient block out at bwd_flush.
    q = seg_chunk.shape[0]
    stream = seg_tile % interleave
    pos_in_stream = jnp.zeros(q, jnp.int32)
    for p in range(interleave):
        msk = (stream == p).astype(jnp.int32)
        pos_in_stream = pos_in_stream + jnp.where(
            stream == p, jnp.cumsum(msk) - 1, 0
        )
    okey = pos_in_stream * interleave + stream
    _, perm = jax.lax.sort_key_val(okey, jnp.arange(q, dtype=jnp.int32))
    meta = {kk: v[perm] for kk, v in meta.items()}
    meta["seg_slot"] = stream[perm]
    # (chunk, stream) pair first/last positions in the permuted order. A
    # chunk's segments can live on SEVERAL streams (its tiles hash to
    # different slots), so the backward accumulates each pair in its own
    # stream scratch and flushes to a per-stream output plane; bwd_zero
    # marks a pair's first visit in the REVERSE walk (= last position),
    # bwd_flush its last (= first position). The never-visited (chunk,
    # stream) planes stay garbage and are masked out by pair_visited.
    pos = jnp.arange(q, dtype=jnp.int32)
    pair = meta["seg_chunk"] * interleave + meta["seg_slot"]
    npair = n_chunks * interleave
    first_pos = jnp.full(npair, q, jnp.int32).at[pair].min(pos)
    last_pos = jnp.full(npair, -1, jnp.int32).at[pair].max(pos)
    meta["bwd_zero"] = (pos == last_pos[pair]).astype(jnp.int32)
    meta["bwd_flush"] = (pos == first_pos[pair]).astype(jnp.int32)
    # [n_chunks, interleave] visited mask for the post-kernel merge
    meta["pair_visited"] = (last_pos >= 0).reshape(n_chunks, interleave)
    return meta


@partial(jax.jit, static_argnames=("max_per_tile",))
def dense_tile_lists(binning, *, max_per_tile):
    """[T, K] dense per-tile gaussian-index lists (-1 padded) from binning
    output. Convenience layout for the reference rasteriser and tests."""
    tile_start = binning["tile_start"]
    tile_cnt = binning["tile_cnt"]
    gsid = binning["patch_gsid"]
    k = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    idx = tile_start[:, None] + k
    ok = k < tile_cnt[:, None]
    idx = jnp.clip(idx, 0, gsid.shape[0] - 1)
    return jnp.where(ok, gsid[idx], -1)
