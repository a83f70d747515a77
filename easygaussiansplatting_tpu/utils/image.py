"""Image metrics and layout helpers."""

import jax.numpy as jnp
import numpy as np


def psnr(img, ref, max_val=1.0):
    """Peak signal-to-noise ratio between two images (any matching shape).

    The reference never computes PSNR (SURVEY.md §5); added here because the
    benchmark contract (BASELINE.md) is time-to-PSNR.
    """
    xp = jnp if isinstance(img, jnp.ndarray) else np
    mse = xp.mean((img - ref) ** 2)
    return 10.0 * xp.log10(max_val**2 / mse)


def pad_to_multiple(x, multiple, axis, value=0.0):
    """Pad axis of x up to the next multiple; returns (padded, original_size)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return xp.pad(x, widths, constant_values=value), size
