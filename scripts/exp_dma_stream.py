"""Experiment: validate the dynamic-offset DMA streaming pattern that the
persistent (tile-grid) rasteriser kernels rely on: an HBM-resident patch
array read in K-row chunks at arbitrary runtime offsets, double-buffered,
with results accumulated in VMEM. Not shipped in the package — a proving
ground for ops/pallas/stream kernels."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 128


def kernel(offs_ref, rows_ref, x_hbm, out_ref, scratch, sems):
    q = pl.program_id(0)

    def dma(slot, qi):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(offs_ref[qi], K), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(q == 0)
    def _():
        dma(0, 0).start()

    @pl.when(q + 1 < pl.num_programs(0))
    def _():
        dma((q + 1) % 2, q + 1).start()

    dma(q % 2, q).wait()
    data = scratch[q % 2]
    rows = rows_ref[q]
    sub = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    data = jnp.where(sub < rows, data, 0.0)
    out_ref[0] = jnp.sum(data, axis=0, keepdims=True)


def main():
    rng = np.random.default_rng(0)
    m, q_total = 1 << 18, 4096
    x = rng.normal(size=(m, 16)).astype(np.float32)
    offs = rng.integers(0, m - K, size=q_total).astype(np.int32)
    rows = rng.integers(1, K + 1, size=q_total).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q_total,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, 16), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, 16), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = jax.jit(lambda o, r, x: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_total, 1, 16), jnp.float32),
    )(o, r, x))

    t0 = time.time()
    out = fn(jnp.asarray(offs), jnp.asarray(rows), jnp.asarray(x))
    out.block_until_ready()
    print(f"compile+run {time.time() - t0:.1f}s")
    out = np.asarray(out)[:, 0, :]
    want = np.stack([x[o:o + K][: r].sum(0) for o, r in zip(offs, rows)])
    err = np.abs(out - want).max()
    print("max err:", err, "OK" if err < 1e-3 else "FAIL")

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(jnp.asarray(offs), jnp.asarray(rows), jnp.asarray(x))
        _ = float(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{q_total} chunked DMA reads of [128,16]: {best*1e3:.2f} ms "
          f"({best*1e9/q_total:.0f} ns/chunk)")


if __name__ == "__main__":
    main()
