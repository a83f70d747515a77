"""Differentiable Pallas rasterisation: packing, custom_vjp, and pallas_call
plumbing for the streaming chunk-grid kernels (kernels.py).

The autodiff boundary sits around the packed per-patch attribute array: the
row gather/scatter that builds it is differentiable JAX *outside* the
custom_vjp, so its transpose — a deterministic segment scatter-add of
per-patch gradients onto Gaussians — is synthesised by XLA and plays the
role of the reference's atomicAdd accumulation plus the Python matmul chain
entry point (/root/reference/gsplat/gsmodel.py:52-93). Inside the
custom_vjp, forward and backward are single pallas_calls whose grid streams
the chunk-aligned patch array; per-chunk metadata rides in scalar-prefetch
arrays so the BlockSpec index maps can route each chunk to its owning image
tile.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.binning import chunk_layout
from easygaussiansplatting_tpu.ops.pallas.kernels import (
    GRAD_ROWS,
    PACK_ROWS,
    backward_kernel,
    forward_kernel,
)


def _use_interpret():
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("n_tiles", "gx", "tile", "k", "interpret"))
def _fwd_call(packed, meta, *, n_tiles, gx, tile, k, interpret):
    p = tile * tile
    q_total = packed.shape[0] // k
    kern = functools.partial(forward_kernel, gx=gx, tile=tile, k=k)
    # index maps receive (grid idx, *scalar-prefetch refs)
    out_map = lambda c, t_ref, *_: (t_ref[c], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # chunk_tile, chunk_pos, first, last, work
        grid=(q_total,),
        in_specs=[
            pl.BlockSpec((k, PACK_ROWS), lambda c, *_: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), out_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, p), jnp.float32),   # tile color accumulator
            pltpu.VMEM((1, p), jnp.float32),   # transmittance
            pltpu.VMEM((1, p), jnp.int32),     # contributor counts
            pltpu.SMEM((1,), jnp.int32),       # tile-saturated flag
        ],
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
    )(
        meta["chunk_tile"], meta["chunk_pos"], meta["chunk_first"],
        meta["chunk_last"], meta["chunk_work"], packed,
    )


@partial(jax.jit, static_argnames=("n_tiles", "gx", "tile", "k", "interpret"))
def _bwd_call(packed, meta, g_tiles, tau_tiles, cont_tiles,
              *, n_tiles, gx, tile, k, interpret):
    p = tile * tile
    capacity = packed.shape[0]
    q_total = capacity // k
    kern = functools.partial(backward_kernel, gx=gx, tile=tile, k=k, q_total=q_total)
    rev_map = lambda i, *_: (q_total - 1 - i, 0)
    tile_map = lambda i, t_ref, *_: (t_ref[q_total - 1 - i], 0, 0)
    # per-tile max contributor count: lets the kernel's skip test stay scalar
    maxcont = jnp.max(cont_tiles[:, 0, :], axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(q_total,),
        in_specs=[
            pl.BlockSpec((k, PACK_ROWS), rev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), tile_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, GRAD_ROWS), rev_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),  # transmittance carry
            pltpu.VMEM((1, p), jnp.float32),  # accumulated color-grad carry
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((capacity, GRAD_ROWS), jnp.float32)],
        interpret=interpret,
    )(
        meta["chunk_tile"], meta["chunk_pos"], meta["chunk_first"],
        meta["chunk_last"], meta["chunk_work"], maxcont,
        packed, g_tiles, tau_tiles, cont_tiles,
    )[0]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_packed(dims, packed, meta):
    n_tiles, gx, tile, k, interpret = dims
    return _fwd_call(packed, meta, n_tiles=n_tiles, gx=gx, tile=tile, k=k,
                     interpret=interpret)


def _raster_packed_fwd(dims, packed, meta):
    n_tiles, gx, tile, k, interpret = dims
    image, tau, cont = _fwd_call(
        packed, meta, n_tiles=n_tiles, gx=gx, tile=tile, k=k, interpret=interpret
    )
    return (image, tau, cont), (packed, meta, tau, cont)


def _raster_packed_bwd(dims, res, cotangents):
    n_tiles, gx, tile, k, interpret = dims
    packed, meta, tau, cont = res
    g_img, _, _ = cotangents  # gradients w.r.t. tau/contrib are not propagated
    grads = _bwd_call(
        packed, meta, g_img, tau, cont,
        n_tiles=n_tiles, gx=gx, tile=tile, k=k, interpret=interpret,
    )
    return grads, {key: None for key in meta}


_raster_packed.defvjp(_raster_packed_fwd, _raster_packed_bwd)


def rasterize_pallas(us, cinv2ds, alphas, colors, binning, *, width, height,
                     tile=16, k_chunk=256, interpret=None):
    """Pallas-backed stage 6.

    `binning` is the dict from ops.binning.bin_gaussians. Returns
    (image [3,H,W], aux with contrib [H,W] int32 and final_tau [H,W]).
    """
    if interpret is None:
        interpret = _use_interpret()
    # HBM block slices along the lane (last) axis must be 128-aligned on TPU.
    k_chunk = max(128, ((k_chunk + 127) // 128) * 128)
    gx = -(-width // tile)
    gy = -(-height // tile)
    n_tiles = gx * gy
    p = tile * tile

    m = binning["patch_gsid"].shape[0]
    capacity = m + n_tiles * k_chunk
    meta = chunk_layout(binning, k_chunk=k_chunk, capacity=capacity)
    gsid = binning["patch_gsid"]
    gsafe = jnp.maximum(gsid, 0)
    live = gsid >= 0

    # Differentiable packing: one [N,16] attribute table, row-gathered per
    # patch and row-scattered into the chunk-aligned layout. Whole 64-byte
    # rows keep the random accesses transaction-efficient — per-column
    # element gathers run ~10x slower on TPU. The transposes XLA synthesises
    # for the VJP (gather at newpos -> segment scatter-add onto gaussians)
    # are the deterministic replacement for the reference's atomicAdd
    # accumulation (gsplatcu/kernel.cu:924-945). Unwritten (padding) slots
    # stay zero -> alpha' = 0 -> no contribution and no gradient.
    table = jnp.concatenate(
        [us, cinv2ds, alphas[:, None], colors,
         jnp.zeros((us.shape[0], PACK_ROWS - 9), jnp.float32)],
        axis=1,
    )  # columns: ux uy ca cb cc alpha r g b pad
    rows = jnp.take(table, gsafe, axis=0)
    rows = jnp.where(live[:, None], rows, 0.0)
    # .add, not .set: destinations are unique and the base is zero, so the
    # results are identical — but XLA lowers scatter-add ~5x faster on TPU.
    packed = (
        jnp.zeros((capacity, PACK_ROWS), jnp.float32)
        .at[meta["patch_newpos"]]
        .add(rows, mode="drop")
    )

    dims = (n_tiles, gx, tile, k_chunk, bool(interpret))
    image_t, tau_t, cont_t = _raster_packed(dims, packed, meta)

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
        "n_aligned_total": meta["total"],
    }
    return img, aux
