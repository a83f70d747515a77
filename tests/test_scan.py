"""One-pass Pallas cumsum kernel: fallback path + kernel (interpret) parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.pallas import scan


def test_multi_cumsum_fallback_matches_numpy(rng):
    rows = jnp.asarray(rng.integers(-5, 5, size=(3, 4096)), jnp.int32)
    out = scan.multi_cumsum(rows)  # off-TPU: jnp fallback
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(np.asarray(rows), axis=1))


def test_scan_kernel_interpret(rng):
    """Run the actual kernel through the Pallas interpreter."""
    rows = jnp.asarray(rng.integers(-5, 5, size=(2, 512)), jnp.int32)
    lanes = 128
    out = pl.pallas_call(
        scan._scan_kernel,
        grid=(rows.shape[1] // lanes,),
        in_specs=[pl.BlockSpec((2, lanes), lambda c: (0, c), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rows.shape, rows.dtype),
        scratch_shapes=[pltpu.VMEM((2, 1), rows.dtype)],
        interpret=True,
    )(rows)
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(np.asarray(rows), axis=1))


def test_batched_cumsum_list(rng):
    arrays = [jnp.asarray(rng.integers(0, 9, size=1024), jnp.int32) for _ in range(4)]
    outs = scan.batched_cumsum(arrays)
    for a, o in zip(arrays, outs):
        np.testing.assert_array_equal(np.asarray(o), np.cumsum(np.asarray(a)))
