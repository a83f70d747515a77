"""One-pass batched cumulative sum as a Pallas TPU kernel.

XLA lowers a 1M-element cumsum to a log-depth ladder of full-array passes
(~3 ms each on v5e); the binning pipeline needs several per render. This
kernel does one linear pass: the grid walks lane-blocks, each block computes
an in-register inclusive scan (log2 L shift+add rounds) and adds a carried
per-row running total kept in VMEM scratch. Multiple independent scans batch
along the *sublane* axis, which pads to 8 rows for free — batching along the
minor (lane) axis instead would pad each scan to 128 lanes and waste ~40x
the bandwidth.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 16384  # block width; 8 x 16384 x 4B = 0.5 MB in VMEM


def _inclusive_lane_scan(x):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    s = 1
    while s < x.shape[1]:
        y = y + jnp.where(lane >= s, jnp.roll(y, s, axis=1), jnp.zeros_like(y))
        s <<= 1
    return y


def _scan_kernel(x_ref, o_ref, carry):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    y = _inclusive_lane_scan(x_ref[:])
    o_ref[:] = y + carry[:]
    carry[:] = carry[:] + y[:, -1:]


@partial(jax.jit, static_argnames=("interpret",))
def multi_cumsum(rows, interpret=None):
    """Inclusive cumsum along axis 1 of an [R, M] int32/float32 array
    (R <= 8; M a multiple of 128). Falls back to jnp.cumsum off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return jnp.cumsum(rows, axis=1)
    r, m = rows.shape
    lanes = min(_LANES, m)
    if m % lanes:
        return jnp.cumsum(rows, axis=1)  # odd lengths: XLA fallback
    return pl.pallas_call(
        _scan_kernel,
        grid=(m // lanes,),
        in_specs=[pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, m), rows.dtype),
        scratch_shapes=[pltpu.VMEM((r, 1), rows.dtype)],
    )(rows)


def batched_cumsum(arrays, interpret=None):
    """Cumsum a list of equal-length 1D arrays in one kernel launch."""
    rows = jnp.stack(arrays, axis=0)
    out = multi_cumsum(rows, interpret=interpret)
    return [out[i] for i in range(len(arrays))]


def _seg_scan_kernel(x_ref, f_ref, o_ref, carry):
    """Inclusive SEGMENTED scan along lanes: the running sum resets at every
    flagged element, so totals never grow past one segment's magnitude — no
    cumsum-then-difference cancellation (the reason this exists; see
    ops/pallas/rasterize._raster_table_bwd)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    y = x_ref[:]                      # [R, L]
    g = jnp.minimum(f_ref[:], 1)      # [1, L] segment-start marks (int32 —
    # Mosaic's i1 vector rolls/selects are unreliable, keep flags integer)
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    s = 1
    while s < y.shape[1]:
        in_range = lane >= s
        # out-of-range shifts fill with the combine IDENTITY (0, 0): the
        # segmented-sum monoid's identity flag is 0 — a fill of 1 would mark
        # a phantom segment start at the block edge, and after the log
        # rounds that phantom gates the inter-block carry off every lane of
        # a block-spanning segment except the block's last
        y_sh = jnp.where(in_range, jnp.roll(y, s, axis=1), 0.0)
        g_sh = jnp.where(in_range, jnp.roll(g, s, axis=1), 0)
        y = y + jnp.where(g > 0, 0.0, y_sh)
        g = jnp.maximum(g, g_sh)
        s <<= 1
    # g now = "a true segment start lies in [block start .. lane]"; lanes
    # before the block's first start continue the previous block's segment
    out = y + jnp.where(g > 0, 0.0, carry[:])
    o_ref[:] = out
    carry[:] = out[:, -1:]


def _seg_cumsum_ref(vals, flags):
    f = jnp.broadcast_to(flags[None, :] != 0, vals.shape)

    def op(a, b):
        return (b[0] + jnp.where(b[1], 0.0, a[0]), a[1] | b[1])

    v, _ = jax.lax.associative_scan(op, (vals, f), axis=1)
    return v


@partial(jax.jit, static_argnames=("interpret",))
def segmented_cumsum(vals, flags, interpret=None):
    """Inclusive segmented cumsum along axis 1 of [R, M] float32 `vals`;
    `flags` [M] nonzero marks the first element of each segment (element 0
    is always a segment start). M a multiple of 128."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return _seg_cumsum_ref(vals, flags)
    r, m = vals.shape
    lanes = min(_LANES, m)
    if m % lanes:
        return _seg_cumsum_ref(vals, flags)
    flags = flags.astype(jnp.int32).at[0].set(1)[None, :]
    return pl.pallas_call(
        _seg_scan_kernel,
        grid=(m // lanes,),
        in_specs=[
            pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, m), vals.dtype),
        scratch_shapes=[pltpu.VMEM((r, 1), vals.dtype)],
    )(vals, flags)
