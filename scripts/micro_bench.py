"""Micro-benchmarks: per-grid-step Pallas overhead + binning sub-steps.

Isolates where the rasteriser wall-clock goes:
  A. streaming grid with NO output writes (pure input-DMA pipeline)
  B. + dynamically-indexed (revisited) VMEM output blocks
  C. + the real blend compute
  D. binning sub-steps (argsort N, expansion, patch sort, layout scatter)
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 256
ROWS = 16


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt*1e3:9.3f} ms")
    return out


def variant_a(q_total, packed, tiles):
    def kern(tile_ref, in_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_total,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda c, *_: (0, c), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tiles, packed)


def variant_b(q_total, n_tiles, packed, tiles):
    p = 256

    def kern(tile_ref, in_ref, img_ref, tau_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            img_ref[0] = jnp.zeros((3, p), jnp.float32)
            tau_ref[0] = jnp.ones((p, 1), jnp.float32)

        img_ref[0] = img_ref[0] + in_ref[0:3, :]

    out_map = lambda c, t_ref: (t_ref[c], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_total,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda c, *_: (0, c), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 3, p), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), out_map, memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
        ],
    )(tiles, packed)


def variant_vmem_resident(q_total, n_tiles, packed, tiles):
    """Whole image lives in a VMEM scratch, written out once at the end."""
    p = 256

    def kern(tile_ref, in_ref, img_ref, acc):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        t = tile_ref[c]
        acc[t] = acc[t] + jnp.sum(in_ref[0:3, :], axis=1)

        @pl.when(c == q_total - 1)
        def _():
            img_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_total,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda c, *_: (0, c), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_tiles, 3), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_tiles, 3), jnp.float32)],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3), jnp.float32),
    )(tiles, packed)


def main():
    q_total = 6266
    n_tiles = 2170
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(ROWS, q_total * K)), jnp.float32)
    # realistic: ~2-3 consecutive chunks per tile, non-decreasing
    tiles = jnp.asarray(
        np.minimum(np.sort(rng.integers(0, n_tiles, q_total)), n_tiles - 1), jnp.int32
    )

    timeit("A: stream only (no outputs)", jax.jit(partial(variant_a, q_total)), packed, tiles)
    timeit("B: + dyn-indexed out blocks", jax.jit(partial(variant_b, q_total, n_tiles)), packed, tiles)
    timeit("V: VMEM-resident accum", jax.jit(partial(variant_vmem_resident, q_total, n_tiles)), packed, tiles)

    # ---- binning sub-steps ----
    n = 65536
    max_patches = 2**20
    depths = jnp.asarray(rng.uniform(1, 10, n), jnp.float32)
    timeit("D1: argsort N", jax.jit(lambda d: jnp.argsort(d)), depths)

    cum = jnp.asarray(np.sort(rng.integers(0, max_patches, n)), jnp.int32)
    m = jnp.arange(max_patches, dtype=jnp.int32)
    timeit("D2: searchsorted expand (1M over 65k)",
           jax.jit(lambda c, m: jnp.searchsorted(c, m, side="right")), cum, m)

    tile_id = jnp.asarray(rng.integers(0, n_tiles, max_patches), jnp.int32)
    gsid = jnp.asarray(rng.integers(0, n, max_patches), jnp.int32)
    timeit("D3a: lax.sort pair stable (1M)",
           jax.jit(lambda t, g: jax.lax.sort((t, g), dimension=0, is_stable=True, num_keys=1)),
           tile_id, gsid)
    timeit("D3b: sort_key_val u32 (1M)",
           jax.jit(lambda t, g: jax.lax.sort_key_val(t, g)), tile_id, gsid)
    key64 = tile_id.astype(jnp.int64) << 20 | m.astype(jnp.int64)
    timeit("D3c: sort_key_val i64 (1M)",
           jax.jit(lambda t, g: jax.lax.sort_key_val(t, g)), key64, gsid)

    newpos = jnp.asarray(rng.permutation(max_patches + 1000)[:max_patches], jnp.int32)
    timeit("D4: scatter 1M",
           jax.jit(lambda np_, g: jnp.full(max_patches + 1000, -1, jnp.int32).at[np_].set(g, mode="drop")),
           newpos, gsid)
    timeit("D5: gather 1M x 9 rows",
           jax.jit(lambda g, d: jnp.take(d, g, axis=0)), gsid,
           jnp.asarray(rng.normal(size=(n, 9)), jnp.float32))


if __name__ == "__main__":
    main()
