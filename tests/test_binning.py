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
    # the row budget bit: un-materialised rows show via total_rows (their
    # patch counts are unknowable once ellipse culling sizes rows lazily)
    assert int(capped["total_rows"]) > rows // 2
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


def test_ellipse_culling_shrinks_but_preserves_image(rng):
    """Skip-ellipse row culling must drop patches (anisotropic splats leave
    AABB corners empty) yet leave the rendered image EXACTLY as the AABB
    candidate set produces — dropped tiles contain no pixel with
    alpha' >= ALPHA_SKIP, which the blend skips anyway."""
    import jax

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
    from easygaussiansplatting_tpu.ops import stages

    width, height = 96, 80
    scene = make_synthetic_scene(seed=11, n_gaussians=256, n_cams=1,
                                 width=width, height=height, log_scale_mean=-1.2)
    cam = scene["cameras"][0]
    shs = np.zeros((256, 48), np.float32)
    shs[:, :3] = scene["shs"]
    aux = stages.preprocess(
        jnp.asarray(scene["pws"], jnp.float32), jnp.asarray(shs),
        jnp.asarray(scene["alphas"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rots"], jnp.float32), cam)

    kw = dict(width=width, height=height, max_patches=2**13)
    aabb = binning.bin_gaussians(
        aux["us"], aux["depths"], aux["areas"], aux["valid"], **kw)
    culled = binning.bin_gaussians(
        aux["us"], aux["depths"], aux["areas"], aux["valid"],
        cinv2ds=aux["cinv2ds"], alphas=aux["alphas"], **kw)
    n_aabb, n_cull = int(aabb["total"]), int(culled["total"])
    assert n_cull < n_aabb, (n_cull, n_aabb)
    # every culled-away candidate is invisible: the two candidate sets give
    # the same blend, to fp-identical pixels
    from easygaussiansplatting_tpu.ops.rasterize_tiled import rasterize_tiled

    img_a, _ = rasterize_tiled(
        aux["us"], aux["cinv2ds"], aux["alphas"], aux["colors"],
        aabb["patch_gsid"], aabb["tile_start"], aabb["tile_cnt"],
        width=width, height=height, tile=16, k_chunk=64, n_chunks=16)

    img_c, _ = rasterize_tiled(
        aux["us"], aux["cinv2ds"], aux["alphas"], aux["colors"],
        culled["patch_gsid"], culled["tile_start"], culled["tile_cnt"],
        width=width, height=height, tile=16, k_chunk=64, n_chunks=16)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_a), atol=1e-6)


def test_gsid_counts_match_histogram():
    """binning's per-gaussian kept-patch counts == histogram of patch_gsid
    (they drive the sort-reduce gradient path's segment-end positions)."""
    import jax.numpy as jnp
    import numpy as np

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
    from easygaussiansplatting_tpu.ops import stages
    from easygaussiansplatting_tpu.ops.binning import bin_gaussians

    scene = make_synthetic_scene(seed=4, n_gaussians=96, n_cams=1, width=64, height=48)
    cam = scene["cameras"][0]
    aux = stages.preprocess(
        jnp.asarray(scene["pws"], jnp.float32), jnp.asarray(scene["shs"], jnp.float32),
        jnp.asarray(scene["alphas"], jnp.float32), jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rots"], jnp.float32), cam, sh_degree=0,
    )
    for max_patches, max_rows in [(2048, 2048), (128, 128)]:  # ample + overflowing
        b = bin_gaussians(
            aux["us"], aux["depths"], aux["areas"], aux["valid"],
            width=64, height=48, max_patches=max_patches, max_rows=max_rows,
            cinv2ds=aux["cinv2ds"], alphas=aux["alphas"], gsid_counts=True,
        )
        gsid = np.asarray(b["patch_gsid"])
        counts = np.asarray(b["gsid_counts"])
        hist = np.bincount(gsid[gsid >= 0], minlength=96)
        np.testing.assert_array_equal(counts, hist)
        # segment-end invariant: patches are tile-sorted, but the counts
        # drive end positions in a gsid-sorted view
        assert counts.sum() == (gsid >= 0).sum()


def test_uint32_key_branch_matches_int31_branch(rng):
    """When (n_tiles+1) << bits(max_patches) lands in (2^31, 2^32], the
    composite sort key rides uint32 with the sign bit flipped; the patch
    lists must match the int31 single-key path bit for bit."""
    # 128x256 = 32768 tiles (tile=4); mp_bits 15 -> int31 branch,
    # mp_bits 16 -> uint32 branch
    width, height, tile = 512, 1024, 4
    n = 512
    us = rng.uniform(-20, 530, size=(n, 2))
    depths = rng.uniform(0.3, 10, size=n)
    areas = rng.integers(1, 30, size=(n, 2)).astype(np.float64)
    valid = np.ones(n, bool)
    args = (jnp.asarray(us, jnp.float32), jnp.asarray(depths, jnp.float32),
            jnp.asarray(areas, jnp.float32), jnp.asarray(valid))
    kw = dict(width=width, height=height, tile=tile)
    a = binning.bin_gaussians(*args, max_patches=32768, **kw)   # int31 path
    b = binning.bin_gaussians(*args, max_patches=65536, **kw)   # uint32 path
    assert int(a["n_dropped"]) == 0 and int(b["n_dropped"]) == 0
    total = int(a["total"])
    assert total == int(b["total"]) and total > 1000
    np.testing.assert_array_equal(
        np.asarray(a["patch_gsid"])[:total], np.asarray(b["patch_gsid"])[:total])
    np.testing.assert_array_equal(np.asarray(a["tile_start"]), np.asarray(b["tile_start"]))
    np.testing.assert_array_equal(np.asarray(a["tile_cnt"]), np.asarray(b["tile_cnt"]))
