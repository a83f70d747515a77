"""Counting-sort (radix) parity: ops/pallas/radix.py vs XLA's stable sort.

The module has two movement engines — the XLA-scatter oracle and the Pallas
DMA-concatenation kernel (interpret mode here; the real DMA path on TPU).
Both must reproduce a stable sort by tile exactly, including the adversarial
layouts the sequential-overwrite DMA trick has to survive: empty buckets,
zero-length runs, whole-chunk single-bucket runs, and the padding bucket.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.ops.pallas.radix import counting_sort_by_tile

jax.config.update("jax_platforms", "cpu")


def _oracle(tile, gsid, m_key=None):
    # stable sort by tile; np.argsort(kind="stable") is the reference
    order = np.argsort(np.asarray(tile), kind="stable")
    return np.asarray(tile)[order], np.asarray(gsid)[order]


def _run(tile, gsid, n_tiles, dma, chunk=512):
    out = counting_sort_by_tile(
        jnp.asarray(tile, jnp.int32), jnp.asarray(gsid, jnp.int32),
        n_tiles=n_tiles, chunk=chunk, interpret=True, dma=dma,
    )
    return [np.asarray(o) for o in out]


def _check(tile, gsid, n_tiles, dma, chunk=512):
    ts, gs = _run(tile, gsid, n_tiles, dma, chunk)
    te, ge = _oracle(tile, gsid)
    np.testing.assert_array_equal(ts, te)
    np.testing.assert_array_equal(gs, ge)


@pytest.mark.parametrize("dma", [False, True])
def test_random_tiles(dma):
    rng = np.random.default_rng(0)
    m, n_tiles = 2048, 300  # > 64 buckets: exercises both passes
    tile = rng.integers(0, n_tiles + 1, m)
    gsid = rng.integers(-1, 5000, m)
    _check(tile, gsid, n_tiles, dma)


@pytest.mark.parametrize("dma", [False, True])
def test_single_pass_small_alphabet(dma):
    rng = np.random.default_rng(1)
    m, n_tiles = 1024, 50  # <= 64 buckets: single pass
    tile = rng.integers(0, n_tiles + 1, m)
    gsid = rng.integers(0, 100, m)
    _check(tile, gsid, n_tiles, dma)


@pytest.mark.parametrize("dma", [False, True])
def test_skew_all_one_tile(dma):
    # whole-chunk runs: k hits its r-1 extreme in the concat kernel
    m = 1024
    tile = np.full(m, 7)
    gsid = np.arange(m)
    _check(tile, gsid, 100, dma)


@pytest.mark.parametrize("dma", [False, True])
def test_empty_buckets_and_padding_bucket(dma):
    rng = np.random.default_rng(2)
    m, n_tiles = 1536, 200
    # only a few hot tiles + the padding bucket n_tiles; most buckets empty
    tile = rng.choice([3, 64, 65, 130, n_tiles], m)
    gsid = rng.integers(0, 10, m)
    _check(tile, gsid, n_tiles, dma)


@pytest.mark.parametrize("dma", [False, True])
def test_presorted_and_reverse(dma):
    m, n_tiles = 1024, 150
    tile = np.sort(np.random.default_rng(3).integers(0, n_tiles, m))
    gsid = np.arange(m)
    _check(tile, gsid, n_tiles, dma)
    _check(tile[::-1].copy(), gsid, n_tiles, dma)


def test_stability_within_tile():
    # equal tiles must keep input order: gsid was written in input order
    rng = np.random.default_rng(4)
    m, n_tiles = 2048, 90  # two passes (91 > 64)
    tile = rng.integers(0, n_tiles, m)
    for dma in (False, True):
        ts, gs = _run(tile, np.arange(m), n_tiles, dma)
        for t in np.unique(tile)[:8]:
            seg = gs[ts == t]
            assert (np.diff(seg) > 0).all(), f"tile {t} not stable ({dma=})"


@pytest.mark.parametrize("dma", [False, True])
def test_multi_pass_large_key_bound(dma):
    # 3 LSD passes (key_bound 70000 > 64^2): the gradient-reduce regime,
    # keys = gaussian ids with the dead-patch sentinel bucket at the top
    from easygaussiansplatting_tpu.ops.pallas.radix import counting_sort

    rng = np.random.default_rng(6)
    m, bound = 2048, 70000
    key = rng.integers(0, bound, m)
    key[rng.random(m) < 0.1] = bound - 1  # sentinel bucket
    pos = np.arange(m)
    ks, ps = counting_sort(
        jnp.asarray(key, jnp.int32), jnp.asarray(pos, jnp.int32),
        key_bound=bound, chunk=512, interpret=True, dma=dma,
    )
    order = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(np.asarray(ks), key[order])
    np.testing.assert_array_equal(np.asarray(ps), pos[order])


@pytest.mark.parametrize("dma", [False, True])
def test_odd_m_chunk_shrink(dma):
    # m = 1536 = 3 * 512: chunk auto-shrinks to a dividing power of two
    rng = np.random.default_rng(5)
    m, n_tiles = 1536, 300
    tile = rng.integers(0, n_tiles + 1, m)
    _check(tile, np.arange(m), n_tiles, dma, chunk=1024)
