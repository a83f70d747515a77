"""Fixed-capacity Gaussian pool — the trainable model.

The reference grows/shrinks its parameter tensors during densification and
rebuilds optimiser state by concatenation/masking
(/root/reference/gsplat/gsmodel.py:96-166). Under jit that would recompile on
every density change, so the TPU-native design is a *fixed-capacity pool with
an alive mask*: prune clears mask bits, clone/split writes into free slots,
and every shape (and sharding) stays static. Raw (unactivated) parameters and
learning-rate groups match gsmodel.py:96-129.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.utils.activations import (
    get_alphas,
    get_alphas_raw,
    get_rots,
    get_scales,
    get_scales_raw,
)

SH_REST_DIM = 45  # degree 1..3 coefficients * RGB


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pws", "low_shs", "high_shs", "alphas_raw", "scales_raw", "rots_raw", "alive"],
    meta_fields=[],
)
@dataclasses.dataclass
class GaussianPool:
    pws: jax.Array         # [CAP, 3]
    low_shs: jax.Array     # [CAP, 3]   degree-0 SH (RGB)
    high_shs: jax.Array    # [CAP, 45]  degrees 1-3
    alphas_raw: jax.Array  # [CAP]      logit opacity
    scales_raw: jax.Array  # [CAP, 3]   log scales
    rots_raw: jax.Array    # [CAP, 4]   unnormalised wxyz
    alive: jax.Array       # [CAP] bool

    @property
    def capacity(self):
        return self.pws.shape[0]

    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    def activated(self):
        """Returns (pws, shs [CAP,48], alphas, scales, rots, alive)."""
        shs = jnp.concatenate([self.low_shs, self.high_shs], axis=-1)
        return (
            self.pws,
            shs,
            get_alphas(self.alphas_raw),
            get_scales(self.scales_raw),
            get_rots(self.rots_raw),
            self.alive,
        )

    def params(self):
        """The trainable leaves as a dict (alive is not trained)."""
        return {
            "pws": self.pws,
            "low_shs": self.low_shs,
            "high_shs": self.high_shs,
            "alphas_raw": self.alphas_raw,
            "scales_raw": self.scales_raw,
            "rots_raw": self.rots_raw,
        }

    def replace_params(self, params):
        return dataclasses.replace(self, **params)


def pool_from_arrays(pws, rots, scales, alphas, shs, capacity=None, dtype=jnp.float32):
    """Build a pool from activated arrays (e.g. SfM init or a loaded .ply).

    shs may have any multiple-of-3 width <= 48; degree-1..3 coefficients are
    padded with the reference's 0.001 init (gsmodel.py:110).
    """
    n = pws.shape[0]
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < number of gaussians {n}")
    shs = np.asarray(shs, np.float32).reshape(n, -1)
    low = shs[:, :3]
    high = np.full((n, SH_REST_DIM), 1e-3, np.float32)
    rest = shs[:, 3:]
    high[:, : rest.shape[1]] = rest

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out, dtype)

    alive = np.zeros(cap, bool)
    alive[:n] = True
    return GaussianPool(
        pws=pad(np.asarray(pws, np.float32)),
        low_shs=pad(low),
        high_shs=pad(high),
        alphas_raw=pad(np.asarray(get_alphas_raw(np.clip(np.asarray(alphas, np.float64), 1e-6, 1 - 1e-6)), np.float32)),
        scales_raw=pad(np.asarray(get_scales_raw(np.maximum(np.asarray(scales, np.float64), 1e-12)), np.float32)),
        rots_raw=pad(np.asarray(rots, np.float32), fill=1.0),
        alive=jnp.asarray(alive),
    )


def render_pool(pool, cam, us_offset=None, backend="tiled", **kw):
    """Render a pool; `us_offset` [CAP,2] (zeros) exposes d(loss)/d(screen-u)
    for densification stats — the JAX equivalent of the reference's dummy
    `us` input (gsmodel.py:196-199)."""
    from easygaussiansplatting_tpu.ops.rasterize import render

    pws, shs, alphas, scales, rots, alive = pool.activated()
    return render(
        pws, shs, alphas, scales, rots, cam,
        alive=alive, us_offset=us_offset, backend=backend, **kw,
    )
