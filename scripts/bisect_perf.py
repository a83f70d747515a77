"""Fine-grained perf bisection of the fwd+bwd step at bench scale.

Times each binning sub-stage and each backward component inside real jitted
programs (micro-benchmarks of isolated gather/scatter on this backend report
bogus times; see CLAUDE.md)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import time

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
from easygaussiansplatting_tpu.ops import stages
from easygaussiansplatting_tpu.ops.binning import (
    _propagate_marks, _scan1, bin_gaussians, gaussian_rects, num_tiles, segment_layout,
)
from easygaussiansplatting_tpu.ops.pallas.scan import batched_cumsum

W, H, N = 979, 546, 65536
MAXP, MAXR, K = 573440, 262144, 512  # the r4-landed defaults


def timeit(label, fn, *args, iters=10, timed=True):
    out = fn(*args)
    if not timed:  # section filtered out: run once for its outputs only
        jax.block_until_ready(out)
        return out
    jax.block_until_ready(out)
    # warm the scalar-read program too — its one-time dispatch/compile over
    # the tunnel must not be charged to the timed window
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # a value read: the tunneled backend's block_until_ready can return early.
    # Index ON DEVICE and transfer 4 bytes — np.asarray of the full leaf
    # ships it over the tunnel (36 MB for the bwd-kernel row = ~200 ms of
    # pure transfer inside the timing window)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--section", choices=["all", "binning", "binning2", "raster", "pre", "loss"],
                    default="all",
                    help="time only one pipeline section (each sub-program "
                         "pays a full tunnel compile on a cold cache — "
                         "filter to the rows under study)")
    args = ap.parse_args()
    sec = args.section

    scene = make_synthetic_scene(seed=0, n_gaussians=N, n_cams=1, width=W,
                                 height=H, log_scale_mean=-3.6)
    cam = scene["cameras"][0]
    shs = np.zeros((N, 48), np.float32)
    shs[:, :3] = scene["shs"]
    params = tuple(jnp.asarray(x, jnp.float32) for x in (
        scene["pws"], shs, scene["alphas"], scene["scales"], scene["rots"]))

    aux = jax.jit(lambda p: stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam))(params)
    jax.block_until_ready(aux)
    us, depths, areas, valid = aux["us"], aux["depths"], aux["areas"], aux["valid"]

    # ---- binning sub-stages ----
    gx, gy = num_tiles(W, H)

    @jax.jit
    def part_depth_sort(depths, valid):
        fkeys = jnp.where(valid, depths, jnp.inf)
        keys = jax.lax.bitcast_convert_type(fkeys, jnp.int32)
        return jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))

    if sec in ("all", "binning"):
        timeit("bin: depth sort (65k)", part_depth_sort, depths, valid)

        _, order = part_depth_sort(depths, valid)
        rects, valid2 = jax.jit(lambda u, a, v: gaussian_rects(u, a, v, W, H))(us, areas, valid)
        rects_s, valid_s = rects[order], valid2[order]

        @jax.jit
        def part_l1_scatters(rects_s, valid_s, order):
            x0, y0, x1, y1 = rects_s[:, 0], rects_s[:, 1], rects_s[:, 2], rects_s[:, 3]
            w = jnp.where(valid_s, x1 - x0, 0).astype(jnp.int32)
            row_counts = jnp.where(valid_s, y1 - y0, 0).astype(jnp.int32)
            rcum = jnp.cumsum(row_counts)
            rstart = rcum - row_counts
            return batched_cumsum([
                _propagate_marks(rstart, (y0 - rstart) * gx + x0, MAXR),
                _propagate_marks(rstart, w, MAXR),
                _propagate_marks(rstart, order, MAXR),
            ])

        c1, row_w, row_ord = timeit("bin: L1 scatters+scan (65k->262k)", part_l1_scatters,
                                    rects_s, valid_s, order)

        @jax.jit
        def part_l2_scatters(c1, row_w):
            wcum = _scan1(row_w)
            start2 = wcum - row_w
            mr = jnp.arange(MAXR, dtype=jnp.int32)
            base = c1 + mr * gx - start2
            return batched_cumsum([
                _propagate_marks(start2, base, MAXP),
                _propagate_marks(start2, row_w * 0, MAXP),  # stand-in 2nd scatter
            ])

        timeit("bin: L2 scatters+scan (262k->786k)", part_l2_scatters, c1, row_w)

        @jax.jit
        def part_patch_sort(c1):
            m = jnp.arange(MAXP, dtype=jnp.int32)
            fake_tile = (m * 2170 // MAXP).astype(jnp.int32)  # sorted-ish keys
            mp_bits = (MAXP - 1).bit_length()
            key = (fake_tile << mp_bits) | m
            return jax.lax.sort_key_val(key, m)

        timeit("bin: patch sort (786k int32)", part_patch_sort, c1)

    if sec == "binning2":
        # Finer decomposition with NON-FOLDABLE inputs (the original
        # part_patch_sort row was iota-derived and XLA constant-folded the
        # whole sort) plus an explicit dispatch-floor row: every isolated
        # program pays ~4 ms of tunnel dispatch per call, so real cost =
        # row - floor.
        timeit("floor (x+1 on [8,128])", jax.jit(lambda x: x + 1.0),
               jnp.zeros((8, 128), jnp.float32))

        binning = jax.jit(lambda: bin_gaussians(
            us, depths, areas, valid, width=W, height=H, max_patches=MAXP,
            max_rows=MAXR, cinv2ds=aux["cinv2ds"], alphas=aux["alphas"]))()
        jax.block_until_ready(binning)
        # rebuild the real intermediates the sub-rows need
        fkeys = jnp.where(valid, depths, jnp.inf)
        keys0 = jax.lax.bitcast_convert_type(fkeys, jnp.int32)
        _, order = jax.lax.sort_key_val(keys0, jnp.arange(N, dtype=jnp.int32))
        rects, valid2 = jax.jit(lambda u, a, v: gaussian_rects(u, a, v, W, H))(
            us, areas, valid)
        rects_s, valid_s = rects[order], valid2[order]
        y0, y1 = rects_s[:, 1], rects_s[:, 3]
        row_counts = jnp.where(valid_s, y1 - y0, 0).astype(jnp.int32)
        rcum = jnp.cumsum(row_counts)
        rstart = rcum - row_counts
        gtab = jnp.concatenate([us, aux["cinv2ds"], aux["alphas"][:, None],
                                rects[:, 0:1].astype(jnp.float32),
                                rects[:, 2:3].astype(jnp.float32)], axis=1)
        row_ord = jax.jit(lambda: _scan1(_propagate_marks(
            rstart, order, MAXR)))()
        row_gs = jnp.clip(row_ord, 0, N - 1)
        jax.block_until_ready((gtab, row_gs))

        # real tile ids/gsids out of the finished binning (unsorted slot
        # order reconstructed by inverting the sort is impossible — instead
        # shuffle the SORTED ids with a fixed permutation: same key
        # distribution, not foldable)
        perm = np.random.RandomState(0).permutation(MAXP)
        tile_shuf = jnp.asarray(np.asarray(binning["patch_tile"])[perm])
        gsid_shuf = jnp.asarray(np.asarray(binning["patch_gsid"])[perm])

        @jax.jit
        def part_real_sort(tile_id, gsid):
            mvec = jnp.arange(MAXP, dtype=jnp.int32)
            sign = jnp.uint32(1 << 31)
            mp_bits = (MAXP - 1).bit_length()
            key_u = (tile_id.astype(jnp.uint32) << mp_bits) | mvec.astype(jnp.uint32)
            key = jax.lax.bitcast_convert_type(key_u ^ sign, jnp.int32)
            return jax.lax.sort_key_val(key, gsid)

        timeit("bin2: patch sort REAL (573k)", part_real_sort, tile_shuf, gsid_shuf)

        @jax.jit
        def part_sort_nopayload(tile_id):
            mvec = jnp.arange(MAXP, dtype=jnp.int32)
            sign = jnp.uint32(1 << 31)
            mp_bits = (MAXP - 1).bit_length()
            key_u = (tile_id.astype(jnp.uint32) << mp_bits) | mvec.astype(jnp.uint32)
            key = jax.lax.bitcast_convert_type(key_u ^ sign, jnp.int32)
            return jax.lax.sort(key)

        timeit("bin2: patch sort key-only (573k)", part_sort_nopayload, tile_shuf)

        @jax.jit
        def part_gtab_gather(gtab, row_gs):
            return jnp.take(gtab, row_gs, axis=0)

        timeit("bin2: gtab row gather (262k x 32B)", part_gtab_gather, gtab, row_gs)

        @jax.jit
        def part_depth_plus_gathers(depths, valid, us, areas):
            fkeys = jnp.where(valid, depths, jnp.inf)
            keys = jax.lax.bitcast_convert_type(fkeys, jnp.int32)
            _, order = jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))
            rects, v2 = gaussian_rects(us, areas, valid, W, H)
            return rects[order], v2[order]

        timeit("bin2: depth sort + N gathers", part_depth_plus_gathers,
               depths, valid, us, areas)

        @jax.jit
        def part_gsid_counts(order, row_w, rstart, row_counts):
            wcum = _scan1(row_w)
            kept = jnp.minimum(wcum[-1], MAXP)
            wcum_pad = jnp.concatenate([jnp.zeros(1, wcum.dtype), wcum])
            lo_cnt = jnp.minimum(wcum_pad[jnp.clip(rstart, 0, MAXR)], kept)
            hi_cnt = jnp.minimum(
                wcum_pad[jnp.clip(rstart + row_counts, 0, MAXR)], kept)
            count_sorted = (hi_cnt - lo_cnt).astype(jnp.int32)
            from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs
            _, by_id = sort_pairs(order, count_sorted)
            return by_id

        row_w = jnp.minimum(rects_s[:, 2] - rects_s[:, 0], 3).astype(jnp.int32)[:MAXR] \
            if MAXR <= N else jnp.ones((MAXR,), jnp.int32)
        timeit("bin2: gsid_counts chain", part_gsid_counts,
               order, row_w, rstart, row_counts)

        @jax.jit
        def part_l2_scan_only(row_w):
            return _scan1(row_w)

        timeit("bin2: L2 row_w cumsum (262k)", part_l2_scan_only, row_w)

        @jax.jit
        def part_l2_one_scatter(rstart):
            return _propagate_marks(jnp.clip(rstart * 2, 0, MAXP - 1), rstart, MAXP)

        timeit("bin2: ONE scatter at 573k", part_l2_one_scatter, rstart)

        @jax.jit
        def part_l2_cumsum_only(x2):
            return batched_cumsum([x2[0], x2[1]])

        x2 = jnp.zeros((2, MAXP), jnp.int32) + tile_shuf[None, :]
        timeit("bin2: batched cumsum [2,573k]", part_l2_cumsum_only, x2)

        @jax.jit
        def part_bounds(key_sorted):
            sign = jnp.uint32(1 << 31)
            mp_bits = (MAXP - 1).bit_length()
            tids = jnp.arange(gx * gy + 1, dtype=jnp.int32)
            tkeys = jax.lax.bitcast_convert_type(
                (tids.astype(jnp.uint32) << mp_bits) ^ sign, jnp.int32)
            return jnp.searchsorted(key_sorted, tkeys, side="left").astype(jnp.int32)

        key_sorted, _ = part_real_sort(tile_shuf, gsid_shuf)
        timeit("bin2: bounds searchsorted (2172q)", part_bounds, key_sorted)

        # full bin TOTAL with the ellipse culling ON (the production config;
        # the r4 'bin: TOTAL' row ran without conics) and its ablation
        timeit("bin2: TOTAL (ellipse+counts ON)",
               jax.jit(lambda: bin_gaussians(
                   us, depths, areas, valid, width=W, height=H,
                   max_patches=MAXP, max_rows=MAXR, cinv2ds=aux["cinv2ds"],
                   alphas=aux["alphas"], gsid_counts=True)))
        timeit("bin2: TOTAL (no ellipse, no counts)",
               jax.jit(lambda: bin_gaussians(
                   us, depths, areas, valid, width=W, height=H,
                   max_patches=MAXP, max_rows=MAXR)))
        return

    # binning/meta feed the raster rows; --section pre/loss never use them —
    # skip both (each is a full cold tunnel compile the flag exists to avoid)
    tbin = sec in ("all", "binning")
    if sec in ("all", "binning", "raster"):
        binf = jax.jit(lambda: bin_gaussians(us, depths, areas, valid, width=W,
                                             height=H, max_patches=MAXP, max_rows=MAXR))
        binning = timeit("bin: TOTAL", binf, timed=tbin)

        meta = jax.jit(lambda b: segment_layout(b, k_chunk=K, n_tiles=gx * gy))(binning)
        if tbin:
            timeit("bin: segment_layout", lambda b: segment_layout(b, k_chunk=K, n_tiles=gx * gy), binning)

    # ---- raster fwd / bwd in isolation ----
    if sec in ("all", "raster"):
        from easygaussiansplatting_tpu.ops.pallas import rasterize as R

        gsid = binning["patch_gsid"]
        gsafe, live = jnp.maximum(gsid, 0), gsid >= 0
        table = jnp.concatenate([
            us, aux["cinv2ds"], aux["alphas"][:, None], aux["colors"],
            jnp.zeros((N, 7), jnp.float32)], axis=1)
        n_tiles = gx * gy
        dims = (n_tiles, gx, 16, K, False, 1)

        fwd1 = jax.jit(lambda t: R._raster_table(dims, t, gsafe, live, meta))
        image_t, tau_t, cont_t = timeit("raster fwd (pallas_call+pack)", fwd1, table)

        packed = R._pack(table, gsafe, live)

        fwdk = jax.jit(lambda p: R._fwd_call(p, meta, n_tiles=n_tiles, gx=gx, tile=16,
                                             k=K, interpret=False))
        timeit("raster fwd kernel only", fwdk, packed)

        g_tiles = jnp.ones_like(image_t)

        bwdk = jax.jit(lambda p, g: R._bwd_call(p, meta, g, tau_t, cont_t,
                                                n_tiles=n_tiles, gx=gx, tile=16,
                                                k=K, interpret=False))
        grads16 = timeit("raster bwd kernel only", bwdk, packed, g_tiles)

        @jax.jit
        def part_scatter_add(grads16):
            return jnp.zeros((16, N), jnp.float32).at[:, gsafe].add(
                jnp.where(live[None, :], grads16, 0.0)).T

        timeit("bwd scatter-add (786k->65k)", part_scatter_add, grads16)

        # the production patch->gaussian reduction (EGS_GRAD_PERM default):
        # 2-col bitonic perm sort + 64-byte row gather + segmented scan
        gsid_counts = jnp.zeros((N,), jnp.int32).at[gsafe].add(
            live.astype(jnp.int32))

        @jax.jit
        def part_sort_reduce(grads16):
            rows_ct = jnp.where(live[None, :], grads16[:R.GRAD_USED], 0.0)
            return R._sort_reduce_grads(rows_ct, gsafe, live, gsid_counts, N)

        timeit("bwd grad-reduce (perm sort+segscan)", part_sort_reduce, grads16)

        @jax.jit
        def vjp_full(t):
            def f(t):
                im, _, _ = R._raster_table(dims, t, gsafe, live, meta)
                return jnp.sum(im)
            return jax.grad(f)(t)

        timeit("raster fwd+bwd via custom_vjp", vjp_full, table)

    # ---- preprocess fwd+bwd ----
    if sec in ("all", "pre"):
        @jax.jit
        def pre_grad(p):
            def f(p):
                a = stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam)
                return (jnp.sum(a["us"]) + jnp.sum(a["cinv2ds"]) + jnp.sum(a["colors"])
                        + jnp.sum(a["alphas"]) + jnp.sum(a["depths"]))
            return jax.grad(f)(p)

        timeit("preprocess fwd",
               jax.jit(lambda p: stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam)),
               params)
        timeit("preprocess fwd+bwd", pre_grad, params)

        from easygaussiansplatting_tpu.ops.pallas.preprocess import fused_preprocess

        @jax.jit
        def fpre_grad(p):
            def f(p):
                a = fused_preprocess(p[0], p[1], p[2], p[3], p[4], cam)
                return (jnp.sum(a["table"]) + jnp.sum(a["alphas"])
                        + jnp.sum(a["depths"]))
            return jax.grad(f)(p)

        timeit("fused preprocess fwd",
               jax.jit(lambda p: fused_preprocess(p[0], p[1], p[2], p[3], p[4], cam)),
               params)
        timeit("fused preprocess fwd+bwd", fpre_grad, params)

    # ---- loss ----
    if sec in ("all", "loss"):
        from easygaussiansplatting_tpu.ops.loss import gau_loss

        img = jnp.zeros((3, H, W), jnp.float32)
        gt = jnp.zeros((3, H, W), jnp.float32)
        timeit("loss fwd+bwd", jax.jit(jax.grad(lambda i: gau_loss(i, gt))), img)


if __name__ == "__main__":
    main()
