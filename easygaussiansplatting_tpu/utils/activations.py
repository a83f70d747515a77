"""Parameter activations mapping raw (optimised) values to physical ones.

Same activation pairs as the reference training model
(/root/reference/gsplat/utils.py:121-151): alphas = sigmoid(raw),
scales = exp(raw), rots = L2-normalised raw quaternions, shs = concat of the
degree-0 block and the padded degree-1..3 block.

Written array-namespace generic (numpy or jax.numpy) so the float64 golden
model and the fp32 JAX path share one definition.
"""

import jax.numpy as jnp


def _xp(x):
    # jax arrays and numpy arrays both expose __array_namespace__-ish modules
    # via their type; cheap dispatch on module name is enough here.
    return jnp if isinstance(x, jnp.ndarray) else __import__("numpy")


def get_alphas(alphas_raw):
    xp = _xp(alphas_raw)
    return 1.0 / (1.0 + xp.exp(-alphas_raw))


def get_alphas_raw(alphas):
    xp = _xp(alphas) if not isinstance(alphas, float) else jnp
    if isinstance(alphas, float):
        import math

        return math.log(alphas / (1.0 - alphas))
    return xp.log(alphas / (1.0 - alphas))


def get_scales(scales_raw):
    return _xp(scales_raw).exp(scales_raw)


def get_scales_raw(scales):
    if isinstance(scales, float):
        import math

        return math.log(scales)
    return _xp(scales).log(scales)


def get_rots(rots_raw):
    xp = _xp(rots_raw)
    norm = xp.linalg.norm(rots_raw, axis=-1, keepdims=True)
    return rots_raw / norm


def get_shs(low_shs, high_shs):
    return _xp(low_shs).concatenate([low_shs, high_shs], axis=-1)
