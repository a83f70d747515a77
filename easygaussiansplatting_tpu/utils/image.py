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


def rainbow_sh(scalars, scalar_min=0.0, scalar_max=255.0):
    """Map scalars to rainbow RGB and convert to degree-0 SH coefficients.

    Capability parity with the reference's point-cloud colormap
    (/root/reference/gsplat/utils.py:84-118): a 5-segment HSV-style ramp
    (blue -> cyan -> green -> yellow -> red), inverted so small values are
    red; returns (rgb - 0.5) / Y0 like the reference. Vectorised numpy,
    re-derived from the ramp's segment structure.
    """
    sh_c0 = 0.28209479177387814
    s = np.asarray(scalars, np.float32).reshape(-1)
    v = np.clip(1.0 - (s - scalar_min) / (scalar_max - scalar_min), 0.0, 1.0)
    h = v * 5.0 + 1.0
    i = np.floor(h).astype(np.int32)
    f = h - i
    f = np.where(i % 2 == 0, 1.0 - f, f)
    n = 1.0 - f
    colors = np.zeros((s.shape[0], 3), np.float32)
    colors[i <= 1] = np.stack([n, np.zeros_like(n), np.ones_like(n)], 1)[i <= 1]
    colors[i == 2] = np.stack([np.zeros_like(n), n, np.ones_like(n)], 1)[i == 2]
    colors[i == 3] = np.stack([np.zeros_like(n), np.ones_like(n), n], 1)[i == 3]
    colors[i == 4] = np.stack([n, np.ones_like(n), np.zeros_like(n)], 1)[i == 4]
    colors[i >= 5] = np.stack([np.ones_like(n), n, np.zeros_like(n)], 1)[i >= 5]
    return (colors - 0.5) / sh_c0


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
