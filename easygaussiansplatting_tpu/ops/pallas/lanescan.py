"""Lane-axis prefix/suffix scans for Pallas TPU kernels.

The rasteriser keeps depth-ordered chunk entries along the *lane* dimension
(and pixels along sublanes), so the sequential transmittance recurrence of
the CUDA draw kernel becomes a prefix product across lanes. Hillis-Steele
doubling (log2 L steps of roll + select + combine) keeps everything in plain
products/sums — no log/exp round-trip, matching the sequential fp32 rounding
behaviour closely.

All functions take [S, L] arrays and scan along axis 1 (lanes). They use only
ops Mosaic lowers well (roll, iota, where, mul/add), and also run under the
Pallas interpreter for CPU tests.
"""

import jax
import jax.numpy as jnp


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _shift_right(x, s, fill):
    """x[i] <- x[i-s], positions i < s get `fill`."""
    lane = _lane_iota(x.shape)
    return jnp.where(lane >= s, jnp.roll(x, s, axis=1), fill)


def _shift_left(x, s, fill):
    """x[i] <- x[i+s], positions i >= L-s get `fill`."""
    lane = _lane_iota(x.shape)
    return jnp.where(lane < x.shape[1] - s, jnp.roll(x, -s, axis=1), fill)


def prefix_prod_exclusive(x):
    """y[i] = prod_{j<i} x[j] (y[0] = 1)."""
    y = x
    s = 1
    while s < x.shape[1]:
        y = y * _shift_right(y, s, 1.0)
        s <<= 1
    return _shift_right(y, 1, 1.0)


def lane_prod_all(x):
    """Every lane gets the product of all lanes (Mosaic lacks reduce_prod).
    Requires L to be a power of two (circular doubling)."""
    y = x
    s = 1
    while s < x.shape[1]:
        y = y * jnp.roll(y, s, axis=1)
        s <<= 1
    return y


def suffix_prod_inclusive(x):
    """y[i] = prod_{j>=i} x[j]."""
    y = x
    s = 1
    while s < x.shape[1]:
        y = y * _shift_left(y, s, 1.0)
        s <<= 1
    return y


def suffix_sum_exclusive(x):
    """y[i] = sum_{j>i} x[j] (y[L-1] = 0)."""
    y = x
    s = 1
    while s < x.shape[1]:
        y = y + _shift_left(y, s, 0.0)
        s <<= 1
    return _shift_left(y, 1, 0.0)
