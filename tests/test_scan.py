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


def test_segmented_cumsum_matches_numpy():
    import numpy as np
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.ops.pallas.scan import (
        _seg_cumsum_ref,
        segmented_cumsum,
    )

    rng = np.random.default_rng(0)
    r, m = 4, 512
    vals = rng.normal(size=(r, m)).astype(np.float32)
    flags = (rng.random(m) < 0.1).astype(np.int32)
    flags[0] = 1
    want = np.zeros_like(vals)
    run = np.zeros(r, np.float32)
    for i in range(m):
        run = np.where(flags[i], 0.0, run) + vals[:, i]
        want[:, i] = run
    got = np.asarray(segmented_cumsum(jnp.asarray(vals), jnp.asarray(flags)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    ref = np.asarray(_seg_cumsum_ref(jnp.asarray(vals), jnp.asarray(flags)))
    np.testing.assert_allclose(ref, want, atol=1e-5)


def test_seg_scan_kernel_interpret_block_spanning():
    """Drive _seg_scan_kernel itself through the Pallas interpreter (the
    segmented_cumsum wrapper short-circuits to the XLA reference off-TPU,
    which is how a carry bug once shipped). Segments deliberately span
    lane-block boundaries: every lane of a spanning segment after a boundary
    must still receive the previous block's partial sum."""
    from easygaussiansplatting_tpu.ops.pallas import scan

    rng = np.random.default_rng(3)
    r, m, lanes = 3, 512, 128
    vals = jnp.asarray(rng.normal(size=(r, m)), jnp.float32)
    for starts in (
        [0, 300],              # one segment spans blocks 0-2, one 2-3
        [0],                   # a single segment over all four blocks
        [0, 127, 128, 400],    # starts at and next to a block edge
    ):
        flags = np.zeros(m, np.int32)
        flags[starts] = 1
        out = pl.pallas_call(
            scan._seg_scan_kernel,
            grid=(m // lanes,),
            in_specs=[
                pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, lanes), lambda c: (0, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
            scratch_shapes=[pltpu.VMEM((r, 1), jnp.float32)],
            interpret=True,
        )(vals, jnp.asarray(flags)[None, :])
        want = np.asarray(scan._seg_cumsum_ref(vals, jnp.asarray(flags)))
        np.testing.assert_allclose(
            np.asarray(out), want, atol=1e-5, err_msg=f"starts={starts}"
        )
