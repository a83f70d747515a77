"""Masked per-group Adam with surgical state access.

The reference uses one torch Adam with six parameter groups at different LRs
and performs densification surgery directly on exp_avg/exp_avg_sq rows
(/root/reference/gsplat/gsmodel.py:117-166). A stock optax.adam hides its
state inside nested transforms, so this is a small explicit implementation:
state is a flat dict-of-pytrees (mu, nu) whose rows densification can zero
in place. Semantics match torch.optim.Adam (eps added *outside* the sqrt),
eps = 1e-15 per the reference (train.py:32).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from easygaussiansplatting_tpu.utils.schedule import get_expon_lr_func


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["count", "mu", "nu"],
    meta_fields=[],
)
@dataclasses.dataclass
class AdamState:
    count: jax.Array  # scalar int32
    mu: dict          # same structure as params
    nu: dict


def adam_init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))


def make_lr_fns(config, scene_size, max_steps):
    """Per-group learning rates; pws follows the log-lerp decay schedule
    (gsmodel.py:181-184)."""
    pws_sched = get_expon_lr_func(
        lr_init=config.lr_pws_init_scale * scene_size,
        lr_final=config.lr_pws_final_scale * scene_size,
        lr_delay_mult=config.lr_delay_mult,
        max_steps=max_steps,
    )
    return {
        "pws": pws_sched,
        "low_shs": lambda step: config.lr_low_shs,
        "high_shs": lambda step: config.lr_high_shs,
        "alphas_raw": lambda step: config.lr_alphas,
        "scales_raw": lambda step: config.lr_scales,
        "rots_raw": lambda step: config.lr_rots,
    }


def adam_update(grads, state, params, lr_fns, b1=0.9, b2=0.999, eps=1e-15):
    """One Adam step. lr_fns: dict group-name -> fn(step) -> lr."""
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1**cf
    bc2 = 1.0 - b2**cf

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        g = grads[k]
        mu = b1 * state.mu[k] + (1.0 - b1) * g
        nu = b2 * state.nu[k] + (1.0 - b2) * g * g
        mhat = mu / bc1
        nhat = nu / bc2
        lr = lr_fns[k](state.count)
        new_params[k] = params[k] - lr * mhat / (jnp.sqrt(nhat) + eps)
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(count=count, mu=new_mu, nu=new_nu)


def zero_state_rows(state, mask):
    """Zero mu/nu rows where mask is True (used after prune so freed slots
    restart with clean optimiser state, mirroring prune_params
    gsmodel.py:152-166)."""

    def z(x):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return dataclasses.replace(
        state, mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu)
    )
