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
