"""Pallas bitonic merge sort: correctness vs numpy on CPU (interpret mode).

Sizes are kept small — interpret mode executes every unrolled network stage
individually. On-chip correctness at 1M keys is exercised by
scripts/micro_bench.py and implicitly by every Pallas-backend render once
binning routes through sort_pairs on TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs


@pytest.mark.parametrize("m,block", [(1024, 1024), (2048, 1024), (1500, 1024)])
def test_sort_pairs_matches_numpy(m, block):
    rng = np.random.default_rng(m)
    k = rng.integers(-(2**28), 2**28, size=m).astype(np.int32)
    v = np.arange(m, dtype=np.int32)
    f = rng.normal(size=m).astype(np.float32)
    ks, vs, fs = sort_pairs(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(f), block=block,
        interpret=True,
    )
    ks, vs, fs = map(np.asarray, (ks, vs, fs))
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ks, k[order])
    # payload rows travel with their key (unique keys -> exact permutation)
    np.testing.assert_array_equal(k[vs], ks)
    np.testing.assert_array_equal(f[vs], fs)


def test_sort_pairs_duplicate_keys():
    rng = np.random.default_rng(7)
    m = 1024
    k = rng.integers(0, 17, size=m).astype(np.int32)  # heavy duplication
    f = rng.normal(size=m).astype(np.float32)
    ks, fs = sort_pairs(jnp.asarray(k), jnp.asarray(f), interpret=True)
    ks, fs = np.asarray(ks), np.asarray(fs)
    np.testing.assert_array_equal(ks, np.sort(k))
    # the multiset of (key, payload) pairs is preserved
    got = sorted(zip(ks.tolist(), fs.tolist()))
    want = sorted(zip(k.tolist(), f.tolist()))
    assert got == want


def test_sort_pairs_already_sorted_and_reversed():
    m = 1024
    k = np.arange(m, dtype=np.int32)
    ks, = sort_pairs(jnp.asarray(k), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), k)
    ks, = sort_pairs(jnp.asarray(k[::-1].copy()), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), k)


def test_sort_lexicographic_two_word_keys():
    rng = np.random.default_rng(11)
    m = 1024
    hi = rng.integers(0, 5, size=m).astype(np.int32)
    lo = rng.permutation(m).astype(np.int32)
    pay = rng.integers(0, 10**6, size=m).astype(np.int32)
    his, los, pays = sort_pairs(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
        n_keys=2, interpret=True,
    )
    his, los, pays = map(np.asarray, (his, los, pays))
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(his, hi[order])
    np.testing.assert_array_equal(los, lo[order])
    np.testing.assert_array_equal(pays, pay[order])


def test_sort_live_block_skip():
    """Trailing pad-constant blocks may skip their local sort without
    changing the result."""
    rng = np.random.default_rng(13)
    n_live = 900
    pad = np.iinfo(np.int32).max
    k = np.full(2048, pad, np.int32)
    k[:n_live] = rng.integers(0, 2**28, size=n_live)
    v = np.arange(2048, dtype=np.int32)
    ks, vs = sort_pairs(jnp.asarray(k), jnp.asarray(v), block=1024,
                        n_live=n_live, interpret=True)
    ks = np.asarray(ks)
    np.testing.assert_array_equal(ks, np.sort(k))
    np.testing.assert_array_equal(k[np.asarray(vs)][:n_live], ks[:n_live])


@pytest.mark.parametrize("n_live", [4096, 2900])
def test_sort_cross_block_merge_stages(n_live):
    """Force the merge-phase fusion width (group) below the array size so
    the CROSS-BLOCK kernel (partner block via second BlockSpec) actually
    executes under the interpreter — at default sizes every test fuses the
    whole merge into the in-VMEM local path and _cross_kernel never runs
    off-chip (the failure mode that shipped the segmented-scan carry bug)."""
    rng = np.random.default_rng(int(n_live))
    m = 4096
    pad = np.iinfo(np.int32).max
    k = np.full(m, pad, np.int32)
    k[:n_live] = rng.integers(0, 2**28, size=n_live)
    v = np.arange(m, dtype=np.int32)
    f = rng.normal(size=m).astype(np.float32)
    ks, vs, fs = sort_pairs(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(f),
        block=512, group=512, n_live=n_live, interpret=True,
    )
    ks, vs, fs = map(np.asarray, (ks, vs, fs))
    np.testing.assert_array_equal(ks, np.sort(k))
    np.testing.assert_array_equal(k[vs][:n_live], ks[:n_live])
    np.testing.assert_array_equal(f[vs][:n_live], fs[:n_live])
