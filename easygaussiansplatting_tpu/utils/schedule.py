"""Learning-rate schedules.

`get_expon_lr_func` reproduces the log-linear (exponential) decay with
sine-eased warm-up delay used for Gaussian positions in the reference
(/root/reference/gsplat/utils.py:7-43, itself from Plenoxels/JaxNeRF). Here
it is written with jnp so the schedule can live inside a jitted optax
transform (step is a traced scalar).
"""

import jax.numpy as jnp


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: jnp.zeros_like(jnp.asarray(step, jnp.float32))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return schedule
