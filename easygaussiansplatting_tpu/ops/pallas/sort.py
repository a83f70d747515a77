"""Bitonic merge sort as Pallas TPU kernels.

TPU-native replacement for the reference's global key sort
(thrust::sort_by_key, /root/reference/gsplatcu/gausplat.cu:82). XLA's
variadic sort lowers to a scalar comparator loop costing ~7 ns/key on v5e —
latency-bound ~100x over byte cost (BASELINE.md "Where the real gap is").
A bitonic network is pure roll + compare + select at full VPU width, which
is exactly what the hardware is good at:

* the flat [M] array (M a power of two) is viewed as [M/128, 128] blocks of
  `block` elements; flat index = sublane * 128 + lane, so a compare-exchange
  at distance d is a sublane roll (d >= 128) or an in-row lane roll
  (d < 128) plus selects — no scalar loop anywhere;
* each block is bitonic-sorted locally in VMEM (one kernel, all
  seq <= block stages unrolled); merge rounds then alternate cross-block
  stages (partner block loaded via a second BlockSpec on the same operand,
  each program writing only its own block — race-free on the sequential TPU
  grid) with a single in-VMEM tail call for the remaining d < block stages;
* direction bits come from the *global* flat iota, so block programs need no
  special casing — (i & seq) == 0 is ascending, exactly textbook bitonic;
* payload columns ride through the same selects (any mix of int32/float32),
  so sort_pairs doubles as the gradient-reduction permutation engine — the
  deterministic replacement for atomicAdd scatter (kernel.cu:924-945) when
  combined with a segmented sum over the sorted keys.

Not stable: callers needing stability must make keys unique (binning packs
(tile, slot) into one int32 key for exactly this reason).
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _flat_iota(sub, block_offset):
    """Global flat index of each element of a [sub, 128] block."""
    s = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
    return block_offset + s * LANES + l


def _partner(x, j):
    """x[i ^ j] for all i of a [sub, 128] block (j < block size)."""
    if j >= LANES:
        up = jnp.roll(x, j // LANES, axis=0)
        dn = jnp.roll(x, -(j // LANES), axis=0)
    else:
        up = jnp.roll(x, j, axis=1)
        dn = jnp.roll(x, -j, axis=1)
    # i & j == 0 -> partner is at i + j (the "down"/forward roll source)
    s = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    l = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    flat = s * LANES + l
    return jnp.where((flat & j) == 0, dn, up)


def _lex_lt_gt(pks, ks):
    """partner-less-than / greater-than under lexicographic multi-word
    compare (word 0 most significant)."""
    lt = pks[0] < ks[0]
    eq = pks[0] == ks[0]
    for pk, k in zip(pks[1:], ks[1:]):
        lt = lt | (eq & (pk < k))
        eq = eq & (pk == k)
    return lt, ~lt & ~eq


def _stage(gflat, keys, vals, j, k, n_keys):
    """One bitonic compare-exchange stage at distance j inside sequences of
    length k, on one [sub, 128] block (j < block). The first n_keys arrays
    are compared lexicographically; the rest ride as payload."""
    pks = [_partner(x, j) for x in keys[:n_keys]]
    is_lower = (gflat & j) == 0
    asc = (gflat & k) == 0
    want_min = is_lower == asc
    lt, gt = _lex_lt_gt(pks, keys[:n_keys])
    # (Mosaic cannot select between two i1 vectors — use boolean algebra)
    take = (want_min & lt) | (~want_min & gt)
    keys = [jnp.where(take, pk, x) for pk, x in zip(pks, keys[:n_keys])]
    vals = [jnp.where(take, _partner(v, j), v) for v in vals]
    return keys, vals


def _local_kernel(*refs, block, n_arrays, n_keys, seq_from, seq_to,
                  live_blocks=None, independent=False):
    """All stages with seq in [seq_from, seq_to] and j < block, in VMEM.

    seq_from == 2: full local bitonic sort. seq_from == seq_to > block: the
    in-block tail (j = block/2 .. 1) of one merge round. `live_blocks` is
    for the INITIAL local sort only: before any merging, blocks at or past
    it hold only pad-key constants with identical payloads, so they copy
    through. It must NOT be applied to merge rounds — descending bitonic
    runs move pad keys to the run *front*, pushing live elements into tail
    blocks mid-network.

    `independent`: direction bits come from the BLOCK-LOCAL iota, so every
    block sorts ascending on its own (sort_blocks). The default global
    iota leaves adjacent blocks counter-directed — correct as the first
    phase of the full network, wrong for standalone per-block sorts.
    """
    ins = refs[:n_arrays]
    outs = refs[n_arrays:]
    sub = block // LANES
    gflat = _flat_iota(sub, 0 if independent else pl.program_id(0) * block)

    def run():
        keys = [r[:] for r in ins[:n_keys]]
        vals = [r[:] for r in ins[n_keys:]]
        k = seq_from
        while k <= seq_to:
            j = min(k // 2, block // 2)
            while j >= 1:
                keys, vals = _stage(gflat, keys, vals, j, k, n_keys)
                j //= 2
            k *= 2
        for r, v in zip(outs, keys + vals):
            r[:] = v

    if live_blocks is None:
        run()
    else:
        @pl.when(pl.program_id(0) < live_blocks)
        def _():
            run()

        @pl.when(pl.program_id(0) >= live_blocks)
        def _():
            for r, i in zip(outs, ins):
                r[:] = i[:]


def _cross_kernel(*refs, block, n_arrays, n_keys, j, k):
    """One cross-block stage: j >= block, partner block loaded via second
    BlockSpec; each program writes only its own block."""
    mine = refs[:n_arrays]
    other = refs[n_arrays : 2 * n_arrays]
    outs = refs[2 * n_arrays :]
    sub = block // LANES
    gflat = _flat_iota(sub, pl.program_id(0) * block)
    pks = [o[:] for o in other[:n_keys]]
    ks = [m[:] for m in mine[:n_keys]]
    is_lower = (gflat & j) == 0   # block-constant, but vector form is free
    asc = (gflat & k) == 0
    want_min = is_lower == asc
    lt, gt = _lex_lt_gt(pks, ks)
    take = (want_min & lt) | (~want_min & gt)
    for r, m, o in zip(outs, ks + [x[:] for x in mine[n_keys:]],
                       pks + [x[:] for x in other[n_keys:]]):
        r[:] = jnp.where(take, o, m)


def _shapes(arrs):
    return [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs]


@partial(jax.jit, static_argnames=(
    "block", "interpret", "n_arrays", "group", "n_keys", "live_blocks"))
def _sort_padded(arrs, *, block, interpret, n_arrays, group=None, n_keys=1,
                 live_blocks=None):
    m = arrs[0].shape[0]
    arrs2d = [a.reshape(m // LANES, LANES) for a in arrs]
    if group is None:
        # merge-phase fusion width: as many blocks per program as VMEM
        # allows (~2 MB per resident copy x in/out/partner), capped hard at
        # 64k elements for Mosaic compile time (instructions ~ stages x
        # vregs; a 256k-element group kernel took >10 min to compile on the
        # tunneled compiler, a 64k one is ~12k instructions)
        group = max(block, min(1 << 16, _pow2_floor((1 << 21) // n_arrays)))
    group = min(group, m)

    def call_local(arrs2d, blk, seq_from, seq_to, live=None):
        sub = blk // LANES
        own = pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        kern = functools.partial(
            _local_kernel, block=blk, n_arrays=n_arrays, n_keys=n_keys,
            seq_from=seq_from, seq_to=seq_to, live_blocks=live,
        )
        return pl.pallas_call(
            kern,
            grid=(m // blk,),
            in_specs=[own] * n_arrays,
            out_specs=[own] * n_arrays,
            out_shape=_shapes(arrs2d),
            interpret=interpret,
        )(*arrs2d)

    def call_cross(arrs2d, blk, j, k):
        sub = blk // LANES
        jb = j // blk
        own = pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        other = pl.BlockSpec(
            (sub, LANES), lambda i: (i ^ jb, 0), memory_space=pltpu.VMEM
        )
        kern = functools.partial(
            _cross_kernel, block=blk, n_arrays=n_arrays, n_keys=n_keys, j=j, k=k
        )
        return pl.pallas_call(
            kern,
            grid=(m // blk,),
            in_specs=[own] * n_arrays + [other] * n_arrays,
            out_specs=[own] * n_arrays,
            out_shape=_shapes(arrs2d),
            interpret=interpret,
        )(*arrs2d, *arrs2d)

    # local bitonic sort of every block (direction bits from the global
    # iota make adjacent blocks come out counter-directed, ready to merge);
    # all-padding blocks (constant pad keys) copy through untouched
    arrs2d = call_local(arrs2d, block, 2, block, live=live_blocks)
    seq = block * 2
    while seq <= m:
        # cross stages beyond the fused-group width: paired-block passes
        j = seq // 2
        while j >= group:
            arrs2d = call_cross(arrs2d, group, j, seq)
            j //= 2
        # all remaining stages of this merge round fused into one in-VMEM
        # pass over group-wide superblocks
        arrs2d = call_local(arrs2d, group, seq, seq)
        seq *= 2
    return [a.reshape(m) for a in arrs2d]


@partial(jax.jit, static_argnames=("block", "interpret", "n_arrays", "n_keys"))
def _sort_blocks_padded(arrs, *, block, interpret, n_arrays, n_keys):
    m = arrs[0].shape[0]
    arrs2d = [a.reshape(m // LANES, LANES) for a in arrs]
    sub = block // LANES
    own = pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(
        _local_kernel, block=block, n_arrays=n_arrays, n_keys=n_keys,
        seq_from=2, seq_to=block, live_blocks=None, independent=True,
    )
    out = pl.pallas_call(
        kern,
        grid=(m // block,),
        in_specs=[own] * n_arrays,
        out_specs=[own] * n_arrays,
        out_shape=_shapes(arrs2d),
        interpret=interpret,
    )(*arrs2d)
    return [a.reshape(m) for a in out]


def sort_blocks(keys, *vals, block, n_keys=1, interpret=None):
    """Sort each consecutive `block`-element slice INDEPENDENTLY (ascending
    by the first n_keys arrays lexicographically; remaining arrays ride as
    payload). The counting-sort passes of ops/pallas/radix.py use this as
    their in-VMEM chunk sorter; callers must pad to a multiple of `block`
    themselves (radix keys carry their own padding semantics). `block` must
    be a power of two multiple of 128."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = keys.shape[0]
    if block & (block - 1) or block % LANES or m % block:
        raise ValueError(f"block {block} must be a pow2 multiple of {LANES} "
                         f"dividing m={m}")
    arrs = [keys] + list(vals)
    return _sort_blocks_padded(tuple(arrs), block=block,
                               interpret=bool(interpret),
                               n_arrays=len(arrs), n_keys=n_keys)


def _pow2_floor(n):
    return 1 << (n.bit_length() - 1)


def _next_pow2(n):
    return 1 << (n - 1).bit_length()


def sort_pairs(keys, *vals, n_keys=1, block=32768, interpret=None,
               pad_key=None, n_live=None, group=None):
    """Sort by int32 `keys` ascending, carrying any number of int32/float32
    payload columns. With n_keys > 1 the first n_keys arrays (keys plus the
    leading vals) form one lexicographic multi-word key — the escape hatch
    when a composite key overflows 31 bits (e.g. binning's (tile, slot) at
    >2047 tiles). Not stable (make keys unique for stability).

    Arrays of any length are padded internally to a power of two with
    `pad_key` on the leading key word (default INT32_MAX, which must
    strictly exceed every real key so padding sorts last); results are
    sliced back to the input length. `n_live` (default: the input length)
    marks how many leading elements are real — whole blocks of padding
    skip their local sort. `group` (default: VMEM-sized, see _sort_padded)
    is the merge-phase fusion width; tests force it small so the
    cross-block kernel actually executes under the interpreter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = keys.shape[0]
    m_pad = max(_next_pow2(m), LANES * 8)
    if pad_key is None:
        pad_key = jnp.iinfo(jnp.int32).max
    block = min(block, m_pad)
    if n_live is None:
        n_live = m
    live_blocks = -(-n_live // block)
    if live_blocks >= m_pad // block:
        live_blocks = None  # nothing to skip
    arrs = [keys] + list(vals)
    if m_pad != m:
        pads = [jnp.full(m_pad - m, pad_key, keys.dtype)] + [
            jnp.zeros(m_pad - m, v.dtype) for v in vals
        ]
        arrs = [jnp.concatenate([a, p]) for a, p in zip(arrs, pads)]
    out = _sort_padded(tuple(arrs), block=block, interpret=bool(interpret),
                       n_arrays=len(arrs), n_keys=n_keys,
                       live_blocks=live_blocks, group=group)
    return [a[:m] for a in out]
