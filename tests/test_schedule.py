"""LR schedule parity with the reference's log-lerp decay
(/root/reference/gsplat/utils.py:7-43, from Plenoxels/JaxNeRF)."""

import numpy as np

from easygaussiansplatting_tpu.utils.schedule import get_expon_lr_func


def _reference_schedule(lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps):
    """Re-derivation of the reference formula in plain numpy."""

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def test_schedule_matches_reference_formula():
    cases = [
        dict(lr_init=1e-4, lr_final=1e-6, lr_delay_steps=0, lr_delay_mult=0.01, max_steps=30_000),
        dict(lr_init=5e-3, lr_final=5e-5, lr_delay_steps=500, lr_delay_mult=0.1, max_steps=10_000),
    ]
    for kw in cases:
        ours = get_expon_lr_func(**kw)
        ref = _reference_schedule(**kw)
        for step in [0, 1, 100, 499, 500, 5_000, 9_999, 10_000, 50_000]:
            np.testing.assert_allclose(
                float(ours(step)), ref(step), rtol=1e-4,  # TPU exp/log precision
                err_msg=f"{kw} step={step}",
            )


def test_schedule_endpoints_and_negative():
    f = get_expon_lr_func(lr_init=1e-2, lr_final=1e-4, max_steps=1000)
    np.testing.assert_allclose(float(f(0)), 1e-2, rtol=1e-4)
    np.testing.assert_allclose(float(f(1000)), 1e-4, rtol=1e-4)
    assert float(f(-5)) == 0.0
    assert float(get_expon_lr_func(0.0, 0.0)(123)) == 0.0
