"""Axis prefix/suffix scans for Pallas TPU kernels.

The rasteriser keeps depth-ordered chunk entries along one axis of a 2D
block (entries x pixels), so the sequential transmittance recurrence of the
CUDA draw kernel becomes a prefix product across that axis. Hillis-Steele
doubling (log2 L steps of roll + select + combine) keeps everything in plain
products/sums — no log/exp round-trip, matching the sequential fp32 rounding
behaviour closely.

All functions take [A, B] arrays and scan along `axis` (default 0 — the
sublane axis, whose rotations are cheap in-register ops on TPU). They use
only ops Mosaic lowers well (roll, iota, where, mul/add) and also run under
the Pallas interpreter for CPU tests.
"""

import jax
import jax.numpy as jnp


def _axis_iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _shift_fwd(x, s, fill, axis):
    """x[i] <- x[i-s] along `axis`, positions i < s get `fill`."""
    idx = _axis_iota(x.shape, axis)
    return jnp.where(idx >= s, jnp.roll(x, s, axis=axis), fill)


def _shift_back(x, s, fill, axis):
    """x[i] <- x[i+s] along `axis`, positions i >= L-s get `fill`."""
    idx = _axis_iota(x.shape, axis)
    return jnp.where(idx < x.shape[axis] - s, jnp.roll(x, -s, axis=axis), fill)


def prefix_prod_exclusive(x, axis=0):
    """y[i] = prod_{j<i} x[j] (y[0] = 1)."""
    y = x
    s = 1
    while s < x.shape[axis]:
        y = y * _shift_fwd(y, s, 1.0, axis)
        s <<= 1
    return _shift_fwd(y, 1, 1.0, axis)


def prod_all(x, axis=0):
    """Every position gets the product over the whole axis (Mosaic lacks
    reduce_prod). Requires the axis length to be a power of two."""
    y = x
    s = 1
    while s < x.shape[axis]:
        y = y * jnp.roll(y, s, axis=axis)
        s <<= 1
    return y


def suffix_prod_inclusive(x, axis=0):
    """y[i] = prod_{j>=i} x[j]."""
    y = x
    s = 1
    while s < x.shape[axis]:
        y = y * _shift_back(y, s, 1.0, axis)
        s <<= 1
    return y


def suffix_sum_exclusive(x, axis=0):
    """y[i] = sum_{j>i} x[j] (y[L-1] = 0)."""
    y = x
    s = 1
    while s < x.shape[axis]:
        y = y + _shift_back(y, s, 0.0, axis)
        s <<= 1
    return _shift_back(y, 1, 0.0, axis)


# Backwards-compatible lane-axis aliases
def lane_prod_all(x):
    return prod_all(x, axis=1)
