"""Differentiable Pallas rasterisation: packing, custom_vjp, and pallas_call
plumbing for the segmented chunk-grid kernels (kernels.py).

The autodiff boundary sits around the packed per-patch attribute array: the
row gather that builds it (one [N,16] table, jnp.take by patch gsid) is
differentiable JAX *outside* the custom_vjp, so its transpose — a
deterministic segment scatter-add of per-patch gradients onto Gaussians —
is synthesised by XLA and plays the role of the reference's atomicAdd
accumulation plus the Python matmul chain entry point
(/root/reference/gsplat/gsmodel.py:52-93). Inside the custom_vjp, forward
and backward are single pallas_calls whose grid streams (chunk x tile)
segments of the unpadded patch array; per-segment metadata rides in
scalar-prefetch arrays so the BlockSpec index maps can route each segment
to its input chunk and owning image tile.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.binning import segment_layout
from easygaussiansplatting_tpu.ops.pallas.kernels import (
    GRAD_ROWS,
    GRAD_USED,
    PACK_ROWS,
    backward_kernel,
    forward_kernel,
)

_META_KEYS = (
    "seg_chunk", "seg_tile", "seg_lo", "seg_hi", "seg_pos",
    "seg_first", "seg_last", "chunk_tail", "seg_live", "seg_slot",
)


def _use_interpret():
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("n_tiles", "gx", "tile", "k", "interpret",
                                   "n_slots"))
def _fwd_call(packed, meta, *, n_tiles, gx, tile, k, interpret, n_slots=1):
    p = tile * tile
    q_total = meta["seg_chunk"].shape[0]
    kern = functools.partial(forward_kernel, gx=gx, tile=tile, k=k)
    # index maps receive (grid idx, *scalar-prefetch refs)
    in_map = lambda s, chunk_ref, *_: (chunk_ref[s], 0)
    out_map = lambda s, chunk_ref, tile_ref, *_: (tile_ref[s], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(_META_KEYS),
        grid=(q_total,),
        in_specs=[
            pl.BlockSpec((k, PACK_ROWS), in_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), out_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            # one blend state per interleave stream; the n_slots == 1 layout
            # stays 2D and statically indexed — BIT-IDENTICAL kernel
            # structure to r4 (a [1, ...] leading dim + indexed access was
            # implicated in >15 min Mosaic compile stalls, r5)
            [
                pltpu.VMEM((n_slots, 3, p), jnp.float32),
                pltpu.VMEM((n_slots, 1, p), jnp.float32),
                pltpu.VMEM((n_slots, 1, p), jnp.int32),
                pltpu.SMEM((n_slots,), jnp.int32),
            ] if n_slots > 1 else [
                pltpu.VMEM((3, p), jnp.float32),   # tile color accumulator
                pltpu.VMEM((1, p), jnp.float32),   # transmittance
                pltpu.VMEM((1, p), jnp.int32),     # contributor counts
                pltpu.SMEM((1,), jnp.int32),       # tile-saturated flag
            ]
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(*(meta[kk] for kk in _META_KEYS), packed)


@partial(jax.jit, static_argnames=("n_tiles", "gx", "tile", "k", "interpret",
                                   "interleave"))
def _bwd_call(packed, meta, g_tiles, tau_tiles, cont_tiles,
              *, n_tiles, gx, tile, k, interpret, interleave=1):
    p = tile * tile
    m_total = packed.shape[0]
    q_total = meta["seg_chunk"].shape[0]
    inter = interleave > 1
    kern = functools.partial(backward_kernel, gx=gx, tile=tile, k=k,
                             q_total=q_total, interleaved=inter)
    rev_in = lambda i, chunk_ref, *_: (chunk_ref[q_total - 1 - i], 0)
    rev_tile = lambda i, chunk_ref, tile_ref, *_: (tile_ref[q_total - 1 - i], 0, 0)
    # per-tile max contributor count: lets the kernel's skip test stay scalar
    maxcont = jnp.max(cont_tiles[:, 0, :], axis=1).astype(jnp.int32)
    if inter:
        # tile-interleaved order: a chunk's segments are not adjacent, so
        # the grad block cannot ride the out-BlockSpec revisit pattern —
        # per-(chunk, stream) scratch accumulates and the kernel DMAs each
        # finished block into its stream's plane of the [P, GRAD_ROWS, M]
        # output (memory space ANY); planes merge below
        metas = [meta["bwd_zero" if kk == "chunk_tail" else kk]
                 for kk in _META_KEYS]
        extra = [meta["bwd_flush"], maxcont]
        out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch = [
            pltpu.VMEM((interleave, 1, p), jnp.float32),  # tau carry / stream
            pltpu.VMEM((interleave, 1, p), jnp.float32),  # color-grad carry
            pltpu.VMEM((interleave, GRAD_ROWS, k), jnp.float32),
            pltpu.SemaphoreType.DMA((interleave,)),
            pltpu.SMEM((interleave,), jnp.int32),         # pending-DMA flags
        ]
    else:
        metas = [meta[kk] for kk in _META_KEYS]
        extra = [maxcont]
        out_specs = [
            pl.BlockSpec(
                (GRAD_ROWS, k),
                lambda i, chunk_ref, *_: (0, chunk_ref[q_total - 1 - i]),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = [
            pltpu.VMEM((1, p), jnp.float32),  # transmittance carry
            pltpu.VMEM((1, p), jnp.float32),  # accumulated color-grad carry
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(_META_KEYS) + len(extra),
        grid=(q_total,),
        in_specs=[
            pl.BlockSpec((k, PACK_ROWS), rev_in, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), rev_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), rev_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), rev_tile, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out_shape = [jax.ShapeDtypeStruct(
        ((interleave, GRAD_ROWS, m_total) if inter
         else (GRAD_ROWS, m_total)), jnp.float32)]
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True)
        if inter else None,
        interpret=interpret,
    )(
        *metas, *extra,
        packed, g_tiles, tau_tiles, cont_tiles,
    )[0]
    if inter:
        # merge the per-stream planes: a (chunk, stream) pair owns disjoint
        # patch columns; never-visited pairs hold garbage — mask by the
        # visited table, then sum over streams
        n_chunks = m_total // k
        planes = out.reshape(interleave, GRAD_ROWS, n_chunks, k)
        vis = jnp.transpose(meta["pair_visited"])[:, None, :, None]
        out = jnp.sum(jnp.where(vis, planes, 0.0), axis=0).reshape(
            GRAD_ROWS, m_total)
    return out


def _pack(table, gsafe, live):
    """[N,16] attribute table -> [M,16] patch rows (64-byte row gather)."""
    return jnp.where(live[:, None], jnp.take(table, gsafe, axis=0), 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_table(dims, table, gsafe, live, meta):
    n_tiles, gx, tile, k, interpret, interleave = dims
    return _fwd_call(_pack(table, gsafe, live), meta,
                     n_tiles=n_tiles, gx=gx, tile=tile, k=k,
                     interpret=interpret, n_slots=interleave)


def _raster_table_fwd(dims, table, gsafe, live, meta):
    n_tiles, gx, tile, k, interpret, interleave = dims
    packed = _pack(table, gsafe, live)
    image, tau, cont = _fwd_call(
        packed, meta, n_tiles=n_tiles, gx=gx, tile=tile, k=k,
        interpret=interpret, n_slots=interleave
    )
    return (image, tau, cont), (packed, table.shape[0], gsafe, live, meta, tau, cont)


def _raster_table_bwd(dims, res, cotangents):
    n_tiles, gx, tile, k, interpret, interleave = dims
    packed, n, gsafe, live, meta, tau, cont = res
    g_img, _, _ = cotangents  # gradients w.r.t. tau/contrib are not propagated
    bwd_keys = _META_KEYS + (("bwd_zero", "bwd_flush", "pair_visited")
                             if interleave > 1 else ())
    grads16 = _bwd_call(  # [16, M] — lane-compact (see backward_kernel)
        packed, {kk: meta[kk] for kk in bwd_keys}, g_img, tau, cont,
        n_tiles=n_tiles, gx=gx, tile=tile, k=k, interpret=interpret,
        interleave=interleave,
    )
    rows_ct = jnp.where(live[None, :], grads16[:GRAD_USED], 0.0)
    # Deterministic per-gaussian gradient accumulation (B.6.2) — the
    # reference's atomicAdd (gsplatcu/kernel.cu:924-945). Only the 9 used
    # rows (u, conic, alpha, color) are reduced; the table cotangent is
    # zero-padded to PACK_ROWS after.
    from easygaussiansplatting_tpu.utils.envflag import env_flag

    if (meta.get("gsid_counts") is not None and not interpret
            and not env_flag("EGS_SCATTER_REDUCE")):
        dtable9 = _sort_reduce_grads(
            rows_ct, gsafe, live, meta["gsid_counts"], n
        )
    else:
        # XLA scatter-add: fine on CPU; on TPU it is latency-bound at
        # ~15 ns/index (~12 ms at 786k patches) — hence the sort-reduce
        dtable9 = jnp.zeros((GRAD_USED, n), jnp.float32).at[:, gsafe].add(rows_ct)
    dtable = jnp.concatenate(
        [dtable9, jnp.zeros((PACK_ROWS - GRAD_USED, n), jnp.float32)], axis=0
    )
    return dtable.T, None, None, {key: None for key in meta}


def _sort_reduce_grads(rows_ct, gsafe, live, gsid_counts, n):
    """Patch->gaussian gradient reduction as sort + segmented sum.

    The 9 per-patch gradient rows ride as payloads through the Pallas
    bitonic sort keyed by gaussian id (dead/padding patches key to
    INT32_MAX and sink to the end), a segmented inclusive scan (resetting
    at each key change, so sums never leave one gaussian's magnitude — no
    cumsum-difference cancellation) accumulates each gaussian's patches,
    and the per-gaussian totals are read at segment-end positions computed
    from binning's patch counts (a cumsum — no searchsorted over the patch
    array). Fully vectorized: replaces XLA's serial scatter loop.
    """
    from easygaussiansplatting_tpu.ops.pallas.scan import segmented_cumsum
    from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs

    m = gsafe.shape[0]
    key = jnp.where(live, gsafe, jnp.iinfo(jnp.int32).max)
    from easygaussiansplatting_tpu.utils.envflag import env_flag

    if env_flag("EGS_RADIX_REDUCE"):
        # counting-sort variant of the perm path: 3+ LSD passes over 6-bit
        # gsid digits (ops/pallas/radix.py) instead of the full bitonic
        # network; dead patches key to bucket n and sink to the end (the
        # sentinel is restored after so the segment-boundary flags below
        # see the same keys as the bitonic paths).
        from easygaussiansplatting_tpu.ops.pallas.radix import counting_sort

        skey, pos = counting_sort(
            jnp.where(live, gsafe, n), jnp.arange(m, dtype=jnp.int32),
            key_bound=n + 1,
        )
        skey = jnp.where(skey == n, jnp.iinfo(jnp.int32).max, skey)
        rows16 = jnp.concatenate(
            [rows_ct, jnp.zeros((PACK_ROWS - GRAD_USED, m), rows_ct.dtype)]
        )
        svals = jnp.take(rows16.T, pos, axis=0).T[:GRAD_USED]  # [9, M]
    elif env_flag("EGS_GRAD_PERM", default=True):
        # Bitonic payload width dominates sort cost (10 columns ~2x the
        # 2-column time): sort only (key, position), then move the 9
        # gradient rows with one 64-byte row gather through a transposed
        # [M,16] view. The per-gaussian sum order changes (slot order vs
        # whatever the network did), but both are deterministic. DEFAULT ON
        # since the r4 on-chip A/B (+0.24..0.29 Mpix/s in every pairing;
        # winner combo 14.97 vs 14.68 without); EGS_GRAD_PERM=0 restores
        # the 10-column payload sort.
        # EGS_XLA_GRAD_SORT (DEFAULT ON since the r5 on-chip A/B: 15.26
        # vs 14.97 Mpix/s): XLA's single-key radix sort_key_val measured
        # ~0.9 ms/573k keys in the r5 bisect vs ~2.3 ms for the Pallas
        # bitonic network chosen in r3 — XLA's sort improved since the
        # r3-era 4.4 ms/1M measurement. =0 restores the network.
        if env_flag("EGS_XLA_GRAD_SORT", default=True):
            skey, pos = jax.lax.sort_key_val(
                key, jnp.arange(m, dtype=jnp.int32))
        else:
            skey, pos = sort_pairs(key, jnp.arange(m, dtype=jnp.int32))
        rows16 = jnp.concatenate(
            [rows_ct, jnp.zeros((PACK_ROWS - GRAD_USED, m), rows_ct.dtype)]
        )
        svals = jnp.take(rows16.T, pos, axis=0).T[:GRAD_USED]  # [9, M]
    else:
        out = sort_pairs(key, *[rows_ct[i] for i in range(GRAD_USED)])
        skey = out[0]
        svals = jnp.stack(out[1:])  # [9, M]
    flags = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (skey[1:] != skey[:-1]).astype(jnp.int32)]
    )
    seg = segmented_cumsum(svals, flags)
    cum = jnp.cumsum(gsid_counts)
    end = jnp.clip(cum - 1, 0, m - 1)
    dense = jnp.take(seg, end, axis=1)  # [9, n]
    return jnp.where((gsid_counts > 0)[None, :], dense, 0.0)


_raster_table.defvjp(_raster_table_fwd, _raster_table_bwd)


def rasterize_pallas(us, cinv2ds, alphas, colors, binning, *, width, height,
                     tile=16, k_chunk=256, interpret=None, table=None):
    """Pallas-backed stage 6.

    `binning` is the dict from ops.binning.bin_gaussians; its max_patches
    must be a multiple of k_chunk (after rounding k_chunk up to 128).
    `table` — optionally the prebuilt [N,16] attribute table (the fused
    Pallas preprocess emits it directly, ops/pallas/preprocess.py); when
    given, the us/cinv2ds/alphas/colors args are ignored for packing and
    the per-arg concatenate below is skipped.
    Returns (image [3,H,W], aux with contrib [H,W] int32, final_tau [H,W]).
    """
    if interpret is None:
        interpret = _use_interpret()
    # HBM block slices along the lane (last) axis must be 128-aligned on TPU,
    # and the kernels' circular-doubling reductions (lanescan.prod_all) are
    # only correct for power-of-two axis lengths — round up to the next
    # power of two >= 128 (a non-pow2 k_chunk would silently corrupt the
    # transmittance product).
    k_chunk = max(128, 1 << (int(k_chunk) - 1).bit_length())
    assert k_chunk & (k_chunk - 1) == 0
    gx = -(-width // tile)
    gy = -(-height // tile)
    n_tiles = gx * gy
    p = tile * tile

    gsid = binning["patch_gsid"]
    m = gsid.shape[0]
    if m % k_chunk:
        raise ValueError(f"max_patches {m} must be a multiple of k_chunk {k_chunk}")
    # EGS_INTERLEAVE=P (r5 probe): round-robin the segment order across P
    # tile streams so consecutive grid steps carry independent blend states
    # — the per-tile transmittance chain's serial latency stops stalling
    # the units between steps (see binning.segment_layout / kernels.py).
    import os as _os

    interleave = int(_os.environ.get("EGS_INTERLEAVE", "1"))
    meta = dict(segment_layout(binning, k_chunk=k_chunk, n_tiles=n_tiles,
                               interleave=interleave))
    # per-gaussian patch counts ride along for the backward's sort-reduce
    # gradient accumulation (None -> XLA scatter fallback, e.g. off-TPU)
    meta["gsid_counts"] = binning.get("gsid_counts")
    gsafe = jnp.maximum(gsid, 0)
    live = gsid >= 0

    # Differentiable packing: one [N,16] attribute table row-gathered into
    # patch order (64-byte rows keep the random access transaction-
    # efficient). The transpose XLA synthesises for the VJP — a segment
    # scatter-add of per-patch gradients onto gaussians — is the
    # deterministic replacement for the reference's atomicAdd accumulation
    # (gsplatcu/kernel.cu:924-945). Dropped/padding patches (gsid -1) get
    # zero rows -> alpha' = 0 -> no contribution and no gradient.
    if table is None:
        table = jnp.concatenate(
            [us, cinv2ds, alphas[:, None], colors,
             jnp.zeros((us.shape[0], PACK_ROWS - 9), jnp.float32)],
            axis=1,
        )  # columns: ux uy ca cb cc alpha r g b pad

    dims = (n_tiles, gx, tile, k_chunk, bool(interpret), interleave)
    image_t, tau_t, cont_t = _raster_table(dims, table, gsafe, live, meta)

    # Tiles with no patches are never visited by any segment; fill them.
    nonempty = (binning["tile_cnt"] > 0)[:, None, None]
    image_t = jnp.where(nonempty, image_t, 0.0)
    tau_t = jnp.where(nonempty, tau_t, 1.0)
    cont_t = jnp.where(nonempty, cont_t, 0)

    # [T,3,P] -> [3,H,W]
    img = image_t.reshape(gy, gx, 3, tile, tile)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(3, gy * tile, gx * tile)
    img = img[:, :height, :width]
    tau = tau_t.reshape(gy, gx, tile, tile)
    tau = jnp.transpose(tau, (0, 2, 1, 3)).reshape(gy * tile, gx * tile)[:height, :width]
    cont = cont_t.reshape(gy, gx, tile, tile)
    cont = jnp.transpose(cont, (0, 2, 1, 3)).reshape(gy * tile, gx * tile)[:height, :width]

    aux = {
        "contrib": cont,
        "final_tau": tau,
        "n_patches": binning["total"],
    }
    return img, aux
