"""Checkpoint / resume.

The reference only *saves* activated parameters every 10 epochs and cannot
resume — optimiser state is lost (/root/reference/train.py:78-83,
SURVEY.md §5). Here a checkpoint captures the full training state: raw pool
parameters + alive mask, Adam moments + step count, densification stats, the
PRNG key, and the epoch counter — so training restarts bit-exactly.

Format: a single .npz (host numpy arrays, flat `group/name` keys). Restoring
onto a mesh is the caller's job (parallel.train.shard_pool) — checkpoints
stay layout-agnostic, which also makes them portable across mesh shapes,
the standard JAX/orbax practice.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.models.gaussians import GaussianPool
from easygaussiansplatting_tpu.train.density import DensityStats
from easygaussiansplatting_tpu.train.optimizer import AdamState

_POOL_FIELDS = ["pws", "low_shs", "high_shs", "alphas_raw", "scales_raw", "rots_raw", "alive"]
_PARAM_FIELDS = _POOL_FIELDS[:-1]


def save_checkpoint(path, pool, adam_state, stats, *, epoch, key=None):
    out = {"meta/epoch": np.asarray(epoch, np.int64)}
    if key is not None:
        out["meta/key"] = np.asarray(jax.random.key_data(key))
    for f in _POOL_FIELDS:
        out[f"pool/{f}"] = np.asarray(getattr(pool, f))
    out["adam/count"] = np.asarray(adam_state.count)
    for f in _PARAM_FIELDS:
        out[f"adam/mu/{f}"] = np.asarray(adam_state.mu[f])
        out[f"adam/nu/{f}"] = np.asarray(adam_state.nu[f])
    out["stats/grad_accum"] = np.asarray(stats.grad_accum)
    out["stats/cunt"] = np.asarray(stats.cunt)
    np.savez(path, **out)


def load_checkpoint(path):
    """Returns (pool, adam_state, stats, epoch, key-or-None)."""
    z = np.load(path)
    pool = GaussianPool(**{f: jnp.asarray(z[f"pool/{f}"]) for f in _POOL_FIELDS})
    adam_state = AdamState(
        count=jnp.asarray(z["adam/count"]),
        mu={f: jnp.asarray(z[f"adam/mu/{f}"]) for f in _PARAM_FIELDS},
        nu={f: jnp.asarray(z[f"adam/nu/{f}"]) for f in _PARAM_FIELDS},
    )
    stats = DensityStats(
        grad_accum=jnp.asarray(z["stats/grad_accum"]),
        cunt=jnp.asarray(z["stats/cunt"]),
    )
    epoch = int(z["meta/epoch"])
    key = jax.random.wrap_key_data(jnp.asarray(z["meta/key"])) if "meta/key" in z else None
    return pool, adam_state, stats, epoch, key
