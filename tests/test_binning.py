"""Tile binning vs the golden model's per-tile draw lists."""

import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.ops import binning


def _scene(rng, n=128, width=64, height=48):
    us = rng.uniform(-10, 74, size=(n, 2))
    depths = rng.uniform(-1, 10, size=n)
    areas = rng.integers(1, 12, size=(n, 2)).astype(np.float64)
    valid = depths >= 0.2
    return us, depths, areas, valid


def test_binning_matches_golden_lists(rng):
    width, height = 64, 48
    us, depths, areas, valid = _scene(rng)
    out = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=4096,
    )
    lists_g, (gx, gy) = golden.tile_lists(us, areas.astype(np.int64), depths, width, height)

    gsid = np.asarray(out["patch_gsid"])
    start = np.asarray(out["tile_start"])
    cnt = np.asarray(out["tile_cnt"])
    total_g = sum(len(v) for v in lists_g.values())
    assert int(out["total"]) == total_g
    assert int(out["n_dropped"]) == 0
    for t in range(gx * gy):
        mine = gsid[start[t] : start[t] + cnt[t]]
        np.testing.assert_array_equal(mine, lists_g[t])


def test_binning_overflow_drops_deepest(rng):
    width, height = 64, 48
    us, depths, areas, valid = _scene(rng)
    cap = 100
    out = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=cap,
    )
    assert int(out["n_dropped"]) == int(out["total"]) - cap
    kept = np.asarray(out["patch_gsid"])
    kept = kept[kept >= 0]
    assert len(kept) == cap
    # every kept gaussian is at most as deep as every dropped one
    kept_max = depths[np.unique(kept)].max()
    all_valid = np.where(valid)[0]
    # the deepest valid gaussians should be the dropped ones
    assert kept_max <= depths[all_valid].max() + 1e-9


def test_dense_tile_lists_roundtrip(rng):
    width, height = 64, 48
    us, depths, areas, valid = _scene(rng)
    out = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=4096,
    )
    kmax = int(np.asarray(out["tile_cnt"]).max())
    dense = np.asarray(binning.dense_tile_lists(out, max_per_tile=kmax))
    start = np.asarray(out["tile_start"])
    cnt = np.asarray(out["tile_cnt"])
    gsid = np.asarray(out["patch_gsid"])
    for t in range(dense.shape[0]):
        np.testing.assert_array_equal(dense[t, : cnt[t]], gsid[start[t] : start[t] + cnt[t]])
        assert np.all(dense[t, cnt[t] :] == -1)


def test_row_budget_drops_deepest(rng):
    width, height = 64, 48
    us, depths, areas, valid = _scene(rng)
    full = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=4096,
    )
    rows = int(full["total_rows"])
    assert rows > 8
    capped = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=4096, max_rows=rows // 2,
    )
    assert int(capped["n_dropped"]) > 0
    kept = np.asarray(capped["patch_gsid"])
    kept = kept[kept >= 0]
    # kept patches are a depth-prefix: all from the shallowest gaussians
    kept_max = depths[np.unique(kept)].max()
    dropped_ids = np.setdiff1d(np.unique(np.asarray(full["patch_gsid"])), np.unique(kept))
    dropped_ids = dropped_ids[dropped_ids >= 0]
    if len(dropped_ids):
        assert kept_max <= depths[dropped_ids].max() + 1e-9
    # with max_rows == full rows, identical output
    same = binning.bin_gaussians(
        jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
        jnp.asarray(areas, jnp.float32), jnp.asarray(valid),
        width=width, height=height, max_patches=4096, max_rows=((rows + 127)//128)*128,
    )
    np.testing.assert_array_equal(np.asarray(same["patch_gsid"]), np.asarray(full["patch_gsid"]))
