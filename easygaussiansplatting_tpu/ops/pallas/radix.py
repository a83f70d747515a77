"""Stable counting sort (LSD radix) with DMA-concatenated buckets.

TPU-native candidate replacement for the binning patch sort
(`jax.lax.sort_key_val` in ops/binning.py; the reference's
thrust::sort_by_key, /root/reference/gsplatcu/gausplat.cu:82). The key
observation: the patch array arrives in SLOT order (depth-major expansion),
so the tile sort is a *stable partition by a small alphabet* (tile id), not
a general sort — a counting sort moves every element exactly once, where a
bitonic network pays O(log^2 M) compare-exchange passes and XLA's variadic
sort a ~7 ns/key scalar comparator loop (BASELINE.md).

Per pass (digit = a bit-field of the bucket id):

1. **Chunk-local stable sort** (`sort.sort_blocks`): each K-element chunk is
   bitonic-sorted in VMEM by the composite (digit << pos_bits) | position —
   position makes keys unique, which both gives stability and keeps the
   network's non-stability harmless. After this, each chunk is a sequence
   of per-digit runs, and run (digit b, chunk c) precedes run (b, c+1) in
   the stable output order.
2. **Tables** (XLA, tiny): per-chunk run boundaries by batched
   searchsorted over the sorted digits ([C, B+1] queries), exclusive
   cumsums for each run's output start. No per-element work.
3. **Concatenation**: the output is the runs laid end-to-end in
   (bucket, chunk) order. On TPU a Pallas kernel walks runs in exactly
   that order (sequential grid), assembles each run 128-lane-aligned in
   VMEM (dynamic lane roll + a carry of the previous run's partial last
   row), and issues ONE static-size DMA per run at the run's dynamic
   output row — each write's garbage tail is overwritten by the next
   run's correct data, so variable-length runs ride fixed-size DMAs.
   Off-TPU (and as the parity oracle) an XLA scatter does the same move.

Two passes (tile & 63, then tile >> 6) cover any tile count; buckets of the
second pass are exact (a shift, no power-of-two padding).
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.pallas.sort import sort_blocks

LANES = 128


def _bucket_tables(digits_sorted, n_buckets, chunk):
    """Run tables from per-chunk-sorted digits.

    Returns ([C,B] run_lo, [C,B] run_len, [C,B] out_start) where run (c,b)
    occupies [run_lo, run_lo+run_len) of chunk c and lands at out_start in
    the concatenated (bucket-major, then chunk) output.
    """
    m = digits_sorted.shape[0]
    d2 = digits_sorted.reshape(m // chunk, chunk)
    queries = jnp.arange(n_buckets + 1, dtype=d2.dtype)
    bounds = jax.vmap(
        lambda row: jnp.searchsorted(row, queries, side="left")
    )(d2).astype(jnp.int32)  # [C, B+1]
    run_lo = bounds[:, :-1]
    run_len = bounds[:, 1:] - bounds[:, :-1]
    totals = jnp.sum(run_len, axis=0)  # [B]
    bucket_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(totals)[:-1]]
    )
    chunk_off = jnp.concatenate(
        [jnp.zeros((1, n_buckets), jnp.int32),
         jnp.cumsum(run_len, axis=0)[:-1]], axis=0
    )
    return run_lo, run_len, bucket_base[None, :] + chunk_off


def _concat_xla(arrs, digits_sorted, run_lo, run_len, out_start, chunk):
    """Oracle/off-TPU concatenation: one scatter by the computed
    destination permutation (XLA scatter is ~8 ns/index on TPU — the DMA
    kernel exists to beat exactly this)."""
    m = digits_sorted.shape[0]
    c = m // chunk
    d2 = digits_sorted.reshape(c, chunk)
    lo_g = jnp.take_along_axis(run_lo, d2, axis=1)
    os_g = jnp.take_along_axis(out_start, d2, axis=1)
    pos = jnp.broadcast_to(jnp.arange(chunk, dtype=jnp.int32)[None], (c, chunk))
    dest = (os_g + pos - lo_g).reshape(m)
    return [jnp.zeros(m, a.dtype).at[dest].set(a) for a in arrs]


def _rows_dma(r):
    """Rows per run DMA: >= r+2 (a chunk-run shifted to an arbitrary lane
    offset spans <= r+1 rows, +1 for the first-row patch), rounded UP to the
    int32 sublane tile. The rounding is a HARD hardware constraint, found by
    on-chip bisection (r4): a VMEM->HBM async copy whose sublane count is
    not a multiple of 8 dies with `TPU backend error (Internal)` — or hangs
    when copies overlap — while the same copy at 16 rows works at any
    (unaligned, overlapping, dynamic) destination row offset."""
    return (r + 2 + 7) & ~7


def _concat_kernel(lo_ref, len_ref, os_ref, *refs, n_arrays, r):
    """One grid step = one (bucket, chunk) run, visited bucket-major.

    Assembles the run's elements 128-lane-aligned to its output position
    and DMAs `_rows_dma(r)` rows at the (dynamic) output row. Writes
    overlap: each program's garbage tail rows are overwritten by the next
    program, whose first partial row is patched from the carry scratch (the
    previous run's last true output row). The TPU grid is sequential and
    every program waits on its own copy, so the overwrite order is the grid
    order by construction.
    """
    rows = _rows_dma(r)
    ins = refs[:n_arrays]                       # [r,128] chunk blocks (VMEM)
    outs = refs[n_arrays:2 * n_arrays]          # full outputs (ANY/HBM)
    apad = refs[2 * n_arrays:3 * n_arrays]      # [r+rows+8,128] shifted scratch
    asm = refs[3 * n_arrays:4 * n_arrays]       # [rows,128] assembled run
    carry = refs[4 * n_arrays:5 * n_arrays]     # [1,128] last true out row
    sems = refs[5 * n_arrays]                   # DMA sems, one per array

    s = pl.program_id(0)
    r_lo = lo_ref[s]
    r_len = len_ref[s]
    o_start = os_ref[s]

    @pl.when(s == 0)
    def _():
        for a in range(n_arrays):
            carry[a][:] = jnp.zeros((1, LANES), jnp.int32)

    @pl.when(r_len > 0)
    def _():
        phi = o_start % LANES          # lanes already filled in the out row
        row0 = o_start // LANES
        # flat shift: piece element q (output position row0*128 + q) reads
        # chunk_flat[q + s_e], aligning run element r_lo onto out lane phi
        s_e = r_lo - phi
        a_sh = s_e % LANES             # python-mod: in [0, 128)
        k = (s_e - a_sh) // LANES      # in [-1, r-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        t = (o_start + r_len - 1) // LANES - row0  # row holding o_end-1
        for a in range(n_arrays):
            # chunk_flat[q*128 + l + s_e] = rolled[q+k, l]   if l < 128-a_sh
            #                             = rolled[q+k+1, l] otherwise
            # with rolled[i, l] = chunk[i, (l + a_sh) % 128]
            rolled = pltpu.roll(ins[a][:], (LANES - a_sh) % LANES, 1)
            apad[a][0:1, :] = jnp.zeros((1, LANES), jnp.int32)
            apad[a][1:r + 1, :] = rolled
            apad[a][r + 1:, :] = jnp.zeros((rows + 7, LANES), jnp.int32)
            lo_rows = apad[a][pl.ds(k + 1, rows), :]   # rows q+k
            hi_rows = apad[a][pl.ds(k + 2, rows), :]   # rows q+k+1
            piece = jnp.where(lane < LANES - a_sh, lo_rows, hi_rows)
            # first-row patch: lanes < phi hold the previous run's output.
            # Lanes/rows past o_end stay garbage on purpose — the next
            # program overwrites them (or the caller's margin slice drops
            # them); only the carry row below must be exact.
            asm[a][:] = jnp.where(
                (row == 0) & (lane < phi),
                jnp.broadcast_to(carry[a][:], (rows, LANES)), piece,
            )
            carry[a][:] = asm[a][pl.ds(t, 1), :]
        for a in range(n_arrays):
            dma = pltpu.make_async_copy(
                asm[a], outs[a].at[pl.ds(row0, rows), :], sems.at[a]
            )
            dma.start()
        for a in range(n_arrays):
            pltpu.make_async_copy(
                asm[a], outs[a].at[pl.ds(row0, rows), :], sems.at[a]
            ).wait()


@partial(jax.jit, static_argnames=("n_arrays", "chunk", "interpret"))
def _concat_dma(arrs, run_lo, run_len, out_start, *, n_arrays, chunk,
                interpret):
    m = arrs[0].shape[0]
    n_chunks = m // chunk
    r = chunk // LANES
    rows = _rows_dma(r)
    n_buckets = run_lo.shape[1]
    # grid order: bucket-major (the output order); flatten tables to match
    lo_f = run_lo.T.reshape(-1)
    len_f = run_len.T.reshape(-1)
    os_f = out_start.T.reshape(-1)
    arrs2d = [a.reshape(m // LANES, LANES) for a in arrs]
    chunk_spec = pl.BlockSpec(
        (r, LANES), lambda s, *_: (s % n_chunks, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_buckets * n_chunks,),
        in_specs=[chunk_spec] * n_arrays,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_arrays,
        scratch_shapes=(
            [pltpu.VMEM((r + rows + 8, LANES), jnp.int32)] * n_arrays
            + [pltpu.VMEM((rows, LANES), jnp.int32)] * n_arrays
            + [pltpu.VMEM((1, LANES), jnp.int32)] * n_arrays
            + [pltpu.SemaphoreType.DMA((n_arrays,))]
        ),
    )
    kern = functools.partial(_concat_kernel, n_arrays=n_arrays, r=r)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m // LANES + rows, LANES), jnp.int32)
            for _ in range(n_arrays)
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lo_f, len_f, os_f, *arrs2d)
    return [o.reshape(-1)[:m] for o in outs]


def _bucket_pass(key, vals, digit, n_buckets, *, chunk, interpret, dma):
    """One stable counting-sort pass by `digit` (same length as key)."""
    m = key.shape[0]
    pos_bits = max(1, (m - 1).bit_length())
    assert (n_buckets - 1) << pos_bits <= 2**31 - 1, "composite overflows"
    comp = (digit << pos_bits) | jnp.arange(m, dtype=jnp.int32)
    sorted_arrs = sort_blocks(comp, key, *vals, block=chunk,
                              interpret=interpret)
    key_s = sorted_arrs[1]
    vals_s = sorted_arrs[2:]
    digit_s = sorted_arrs[0] >> pos_bits
    run_lo, run_len, out_start = _bucket_tables(digit_s, n_buckets, chunk)
    move = [key_s] + list(vals_s)
    if dma:
        out = _concat_dma(tuple(move), run_lo, run_len, out_start,
                          n_arrays=len(move), chunk=chunk,
                          interpret=interpret)
    else:
        out = _concat_xla(move, digit_s, run_lo, run_len, out_start, chunk)
    return out[0], out[1:]


def counting_sort(key, *vals, key_bound, chunk=32768, interpret=None,
                  dma=None):
    """Stable sort of (key, *vals) by key ascending; input order is the tie
    order. Keys must lie in [0, key_bound). int32 arrays only.

    LSD over 6-bit digits: ceil(log64(key_bound)) passes, the last pass
    with an exact (non-padded) bucket count. chunk: in-VMEM local-sort
    block; shrunk to the largest power of two dividing m. dma: force the
    Pallas DMA concatenation (default: on-TPU only; the XLA scatter path
    is the oracle elsewhere).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dma is None:
        dma = not interpret
    m = key.shape[0]
    chunk = min(chunk, m)
    while m % chunk:
        chunk //= 2
    if chunk < LANES:
        raise ValueError(f"m={m} has no usable pow2 chunk >= {LANES}")
    vals = list(vals)
    shift = 0
    while True:
        top = (key_bound - 1) >> shift  # max digit value at this level
        last = top < 64
        digit = (key >> shift) if last else (key >> shift) & 63
        key, vals = _bucket_pass(
            key, vals, digit, (top + 1) if last else 64,
            chunk=chunk, interpret=interpret, dma=dma,
        )
        if last:
            return (key, *vals)
        shift += 6


def counting_sort_by_tile(tile, *vals, n_tiles, **kw):
    """Binning's entry point: tile values in [0, n_tiles], where n_tiles
    itself is the padding bucket."""
    return counting_sort(tile, *vals, key_bound=n_tiles + 1, **kw)
