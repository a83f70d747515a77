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


@partial(jax.jit, static_argnames=("width", "height", "tile", "max_patches", "max_rows"))
def bin_gaussians(us, depths, areas, valid, *, width, height, tile=TILE, max_patches,
                  max_rows=None):
    """Build the per-tile draw lists.

    Patch expansion is two-level (gaussian -> covered tile-rows -> covered
    tiles) with every per-slot attribute produced by `_propagate` — the whole
    expansion is scatters, cumulative sums, and elementwise math: no integer
    divide/modulo and no large random gathers, the two ops TPUs punish.

    Returns dict:
      patch_gsid  [max_patches] int32 — original Gaussian index per patch,
                  sorted by (tile, depth); padding slots hold -1.
      tile_start  [T] int32, tile_cnt [T] int32 — per-tile ranges.
      total       int32 — true number of patches (before capping).
      n_dropped   int32 — patches beyond capacity (0 in healthy runs).
      total_rows  int32 — covered tile-rows (drives the max_rows budget).

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
    w = jnp.where(valid_s, x1 - x0, 0).astype(jnp.int32)

    # Level 1: one slot per covered tile-row of each gaussian. Row slot j of
    # gaussian i covers tile-row y0[i] + (j - rstart[i]), so the per-slot
    # quantity c1 = (y0 - rstart) * gx + x0 is segment-constant. Each
    # propagation stays a flat [max_patches] array — batching them as a
    # [max_patches, k] minor axis pads k up to the 128-lane tile and wastes
    # ~40x the scan bandwidth (measured slower).
    row_counts = jnp.where(valid_s, y1 - y0, 0).astype(jnp.int32)
    rcum = jnp.cumsum(row_counts)
    rstart = rcum - row_counts
    total_rows = rcum[-1]
    mr = jnp.arange(max_rows, dtype=jnp.int32)
    rows_ok = mr < jnp.minimum(total_rows, max_rows)
    c1, row_w_raw, row_ord = batched_cumsum([
        _propagate_marks(rstart, (y0 - rstart) * gx + x0, max_rows),
        _propagate_marks(rstart, w, max_rows),
        _propagate_marks(rstart, order, max_rows),
    ])
    row_w = jnp.where(rows_ok, row_w_raw, 0)

    # Level 2: one slot per covered tile of each row. Patch slot m of row j
    # is tile (row_ty * gx + x0) + (m - start2[j]), so
    # base = c1 + j * gx - start2 is again segment-constant.
    wcum = _scan1(row_w)
    total = jnp.sum(jnp.where(valid_s, w * (y1 - y0), 0))  # true pre-cap count
    kept = jnp.minimum(wcum[-1], max_patches)               # after both budgets
    start2 = wcum - row_w
    base = c1 + mr * gx - start2
    m = jnp.arange(max_patches, dtype=jnp.int32)
    in_range = m < kept
    prop_base, prop_ord = batched_cumsum([
        _propagate_marks(start2, base, max_patches),
        _propagate_marks(start2, row_ord, max_patches),
    ])
    tile_id = jnp.where(in_range, prop_base + m, n_tiles).astype(jnp.int32)
    gsid = jnp.where(in_range, prop_ord, -1)

    # Sort by tile id keeping depth order within each tile: the (tile, slot)
    # pair packs into one int32 key when the bit budget allows (unique keys
    # -> stability for free, and a single-key sort_key_val radix sort), else
    # fall back to a stable two-operand sort.
    mp_bits = max(1, (max_patches - 1).bit_length())
    tids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    if (n_tiles + 1) << mp_bits <= 2**31:
        key = (tile_id << mp_bits) | m
        key_sorted, gsid_sorted = jax.lax.sort_key_val(key, gsid)
        tile_sorted = key_sorted >> mp_bits
        # per-tile ranges by binary search over the sorted keys (a 1M-index
        # counting scatter costs ~8 ms; 2k binary searches are free)
        bounds = jnp.searchsorted(key_sorted, tids << mp_bits, side="left").astype(jnp.int32)
    else:
        tile_sorted, gsid_sorted = jax.lax.sort(
            (tile_id, gsid), dimension=0, is_stable=True, num_keys=1
        )
        bounds = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)

    tile_start = bounds[:n_tiles]
    tile_cnt = bounds[1:] - bounds[:-1]

    return {
        "patch_gsid": gsid_sorted,
        "patch_tile": tile_sorted,
        "tile_start": tile_start,
        "tile_cnt": tile_cnt,
        "total": total,
        "n_dropped": total - kept,
        "total_rows": total_rows,
    }


@partial(jax.jit, static_argnames=("k_chunk", "n_tiles"))
def segment_layout(binning, *, k_chunk, n_tiles):
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
    return {
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
