"""Adaptive density control on the fixed-capacity pool.

Replaces the reference's tensor-growing densification
(/root/reference/gsplat/gsmodel.py:214-331) with jit-stable masked-pool
operations: prune clears alive bits (and the freed rows' Adam state), clone /
split write into free slots. Decision rules and thresholds are the
reference's exactly:

* prune: alpha < 0.005 or max-scale > 0.1 * scene_size (gsmodel.py:234-238);
* among survivors with mean screen-space gradient >= 4e-7: clone (exact copy)
  if max-scale <= 0.01 * scene_size else split (gsmodel.py:250-285);
* split: new Gaussian at pw + R(q) @ N(0, diag(scales)), with scales * 0.6 for
  the new entry — the original is left untouched, as in the reference;
* alpha reset: clamp alive alphas_raw to logit(0.01) from above and zero the
  alpha group's Adam state (gsmodel.py:320-331).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from easygaussiansplatting_tpu.utils.activations import (
    get_alphas,
    get_alphas_raw,
    get_rots,
    get_scales,
    get_scales_raw,
)
from easygaussiansplatting_tpu.utils.quaternion import rotate_vector_by_quaternion


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["grad_accum", "cunt"],
    meta_fields=[],
)
@dataclasses.dataclass
class DensityStats:
    grad_accum: jax.Array  # [CAP] accumulated ||dL/du||
    cunt: jax.Array        # [CAP] int32 visibility counts


def density_stats_init(capacity):
    return DensityStats(
        grad_accum=jnp.zeros(capacity, jnp.float32),
        cunt=jnp.zeros(capacity, jnp.int32),
    )


def update_density_stats(stats, dloss_dus, visible):
    """Accumulate screen-space gradient norms for visible Gaussians
    (docs/backward.md B.8: the zero-valued us_offset whose gradient is
    exactly dL/du per Gaussian)
    (gsmodel.py:214-230)."""
    grad = jnp.linalg.norm(dloss_dus, axis=-1)
    return DensityStats(
        grad_accum=stats.grad_accum + jnp.where(visible, grad, 0.0),
        cunt=stats.cunt + visible.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("config",))
def densify_and_prune(pool, adam_state, stats, key, scene_size, config):
    """One density update. Returns (pool, adam_state, stats, report dict)."""
    from easygaussiansplatting_tpu.train.optimizer import zero_state_rows

    cap = pool.capacity
    alive = pool.alive
    alphas = get_alphas(pool.alphas_raw)
    scales = get_scales(pool.scales_raw)
    max_scale = jnp.max(scales, axis=1)

    # --- prune ---
    prune = alive & (
        (alphas < config.alpha_threshold) | (max_scale > config.big_threshold_scale * scene_size)
    )
    alive = alive & ~prune
    adam_state = zero_state_rows(adam_state, prune)

    # --- candidates ---
    grads_avg = jnp.where(stats.cunt > 0, stats.grad_accum / jnp.maximum(stats.cunt, 1), 0.0)
    grads_avg = jnp.where(jnp.isnan(grads_avg), 0.0, grads_avg)
    selected = alive & (grads_avg >= config.grad_threshold)
    is_small = max_scale <= config.scale_threshold_scale * scene_size
    clone = selected & is_small
    split = selected & ~is_small
    cand = clone | split

    # --- new-entry parameters (for every slot; only candidates get used) ---
    rots = get_rots(pool.rots_raw)
    noise = jax.random.normal(key, (cap, 3)) * scales
    offset = rotate_vector_by_quaternion(rots, noise)
    new_pws = jnp.where(split[:, None], pool.pws + offset, pool.pws)
    new_scales_raw = jnp.where(
        split[:, None],
        get_scales_raw(scales * config.split_scale_factor),
        pool.scales_raw,
    )

    # --- slot assignment: k-th candidate -> k-th free slot ---
    free_order = jnp.argsort(alive, stable=True)          # dead slots first
    cand_order = jnp.argsort(~cand, stable=True)          # candidates first
    n_free = jnp.sum(~alive)
    n_cand = jnp.sum(cand)
    n_new = jnp.minimum(n_free, n_cand)
    k = jnp.arange(cap)
    src = cand_order  # source row for k-th new entry
    dst = jnp.where(k < n_new, free_order, cap)  # cap = dropped (out of range)

    def place(dst_arr, src_vals):
        return dst_arr.at[dst].set(src_vals[src], mode="drop")

    filled = jnp.zeros(cap, bool).at[dst].set(True, mode="drop")
    new_pool = dataclasses.replace(
        pool,
        pws=place(pool.pws, new_pws),
        low_shs=place(pool.low_shs, pool.low_shs),
        high_shs=place(pool.high_shs, pool.high_shs),
        alphas_raw=place(pool.alphas_raw, pool.alphas_raw),
        scales_raw=place(pool.scales_raw, new_scales_raw),
        rots_raw=place(pool.rots_raw, pool.rots_raw),
        alive=alive | filled,
    )

    # fresh Adam state for filled slots (reference zero-extends, gsmodel.py:132-149)
    adam_state = zero_state_rows(adam_state, filled)

    report = {
        "n_pruned": jnp.sum(prune),
        "n_cloned": jnp.sum(clone),
        "n_split": jnp.sum(split),
        "n_dropped": n_cand - n_new,
        "n_alive": jnp.sum(new_pool.alive),
    }
    return new_pool, adam_state, density_stats_init(cap), report


def reset_alpha(pool, adam_state, config):
    """Clamp opacities to reset_alpha_val from above; zero alpha Adam state
    (gsmodel.py:320-331)."""
    raw_val = get_alphas_raw(config.reset_alpha_val)
    new_raw = jnp.where(
        pool.alive & (pool.alphas_raw > raw_val), raw_val, pool.alphas_raw
    )
    pool = dataclasses.replace(pool, alphas_raw=new_raw)
    mu = dict(adam_state.mu)
    nu = dict(adam_state.nu)
    mu["alphas_raw"] = jnp.zeros_like(mu["alphas_raw"])
    nu["alphas_raw"] = jnp.zeros_like(nu["alphas_raw"])
    return pool, dataclasses.replace(adam_state, mu=mu, nu=nu)
