"""In-context nested-prefix ablation of bin_gaussians (r5).

Isolated sub-stage timings over the tunnel carry a +-1.4 ms dispatch floor
(scripts/bisect_perf.py --section binning2 measured the SAME trivial
program anywhere from 2.9 to 4.4 ms), which is larger than most of the
stages being measured. This driver instead times a ladder of PREFIX
programs — prefix_k jits the first k stages of the real binning pipeline
and returns a tiny reduce — so each stage's cost is the difference of two
adjacent in-context measurements, the same methodology as
scripts/ablate_step.py (BASELINE.md "in-context attribution").
"""

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
    ALPHA_SKIP, _propagate_marks, _scan1, gaussian_rects, num_tiles,
    segment_layout,
)
from easygaussiansplatting_tpu.ops.pallas.scan import batched_cumsum

W, H, N = 979, 546, 65536
MAXP, MAXR = 573440, 262144
GX, GY = num_tiles(W, H)
NT = GX * GY


def build_prefix(k_stage, us, depths, areas, valid, cinv2ds, alphas):
    """Returns a jitted thunk running binning stages 1..k_stage on the
    (closed-over, device-resident) preprocess outputs."""
    f32 = jnp.float32

    def run():
        # every stage APPENDS to out (replacing it would let XLA dead-code
        # eliminate earlier stages: the r5 first run measured prefix 10 at
        # -3.2 ms because dropping gsid_sorted from the outputs deleted the
        # patch sort)
        out = []
        # 1: depth sort
        fkeys = jnp.where(valid, depths, jnp.inf)
        keys = jax.lax.bitcast_convert_type(fkeys, jnp.int32)
        _, order = jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))
        out.append(order[-1])
        if k_stage >= 2:  # rect build + gathers into depth order
            rects, valid2 = gaussian_rects(us, areas, valid, W, H)
            rects_s = rects[order]
            valid_s = valid2[order] & (
                jax.lax.stop_gradient(alphas)[order] >= ALPHA_SKIP)
            out += [rects_s[-1, 0], valid_s[-1]]
        if k_stage >= 3:  # row counts + rstart
            y0, y1 = rects_s[:, 1], rects_s[:, 3]
            row_counts = jnp.where(valid_s, y1 - y0, 0).astype(jnp.int32)
            rcum = jnp.cumsum(row_counts)
            rstart = rcum - row_counts
            total_rows = rcum[-1]
            out.append(total_rows)
        if k_stage >= 4:  # L1 propagate (2 scatters + batched cumsum)
            mr = jnp.arange(MAXR, dtype=jnp.int32)
            rows_ok = mr < jnp.minimum(total_rows, MAXR)
            ty0_prop, row_ord = batched_cumsum([
                _propagate_marks(rstart, rects_s[:, 1] - rstart, MAXR),
                _propagate_marks(rstart, order, MAXR),
            ])
            row_ty = ty0_prop + mr
            row_gs = jnp.clip(row_ord, 0, N - 1)
            out += [row_ty[-1], row_gs[-1]]
        if k_stage >= 5:  # gtab build + row gather
            usg = jax.lax.stop_gradient(us).astype(f32)
            cg_ = jax.lax.stop_gradient(cinv2ds).astype(f32)
            ag = jnp.maximum(jax.lax.stop_gradient(alphas).astype(f32), 1e-12)
            r2 = jnp.maximum(2.0 * jnp.log(ag / ALPHA_SKIP) * (1.0 + 1e-5)
                             + 1e-4, 0.0)
            gtab = jnp.concatenate(
                [usg, cg_, r2[:, None], rects[:, 0:1].astype(f32),
                 rects[:, 2:3].astype(f32)], axis=1)
            g = jnp.take(gtab, row_gs, axis=0)
            out.append(g[-1, 0])
        if k_stage >= 6:  # per-row ellipse extents
            ux, uy, ca, cb, cc = g[:, 0], g[:, 1], g[:, 2], g[:, 3], g[:, 4]
            r2r, rx0_aabb, rx1_aabb = g[:, 5], g[:, 6], g[:, 7]
            ftile = jnp.asarray(16, f32)
            dy0 = row_ty.astype(f32) * ftile - uy
            dy1 = dy0 + (ftile - 1.0)
            det = jnp.maximum(ca * cc - cb * cb, 1e-12)
            ca_safe = jnp.maximum(ca, 1e-12)
            dy_min2 = jnp.where(dy0 * dy1 > 0,
                                jnp.minimum(dy0 * dy0, dy1 * dy1), 0.0)
            disc = ca * r2r - det * dy_min2
            sr = jnp.sqrt(jnp.maximum(disc, 0.0)) / ca_safe
            xc0 = -cb * dy0 / ca_safe
            xc1 = -cb * dy1 / ca_safe
            x_lo = ux + jnp.minimum(xc0, xc1) - sr - 0.5
            x_hi = ux + jnp.maximum(xc0, xc1) + sr + 0.5
            ex0 = jnp.clip(jnp.floor(x_lo / ftile), rx0_aabb, rx1_aabb)
            ex1 = jnp.clip(jnp.floor(x_hi / ftile) + 1.0, ex0, rx1_aabb)
            rx0 = ex0.astype(jnp.int32)
            row_w = jnp.where(rows_ok & (disc >= 0),
                              (ex1 - ex0).astype(jnp.int32), 0)
            out.append(row_w[-1])
        if k_stage >= 7:  # wcum + start2/base + tile counts/bounds
            wcum = _scan1(row_w)
            total = wcum[-1]
            kept = jnp.minimum(total, MAXP)
            start2 = wcum - row_w
            base = row_ty * GX + rx0 - start2
            tlo = row_ty * GX + rx0
            wk = jnp.maximum(jnp.minimum(row_w, kept - start2), 0)
            t_iota = jnp.arange(NT, dtype=jnp.int32)
            covered = (t_iota[:, None] >= tlo[None, :]) & (
                t_iota[:, None] < (tlo + wk)[None, :])
            tile_cnt = jnp.sum(covered, axis=1, dtype=jnp.int32)
            tcum = jnp.cumsum(tile_cnt)
            tile_start = tcum - tile_cnt
            out += [tile_start[-1], base[-1]]
        if k_stage >= 8:  # L2 propagate + key build
            m = jnp.arange(MAXP, dtype=jnp.int32)
            in_range = m < kept
            prop_base, prop_ord = batched_cumsum([
                _propagate_marks(start2, base, MAXP),
                _propagate_marks(start2, row_ord, MAXP),
            ])
            tile_id = jnp.where(in_range, prop_base + m, NT).astype(jnp.int32)
            gsid = jnp.where(in_range, prop_ord, -1)
            out += [tile_id[-1], gsid[-1]]
        if k_stage >= 9:  # the patch sort
            mp_bits = (MAXP - 1).bit_length()
            sign = jnp.uint32(1 << 31)
            key_u = ((tile_id.astype(jnp.uint32) << mp_bits)
                     | m.astype(jnp.uint32))
            key = jax.lax.bitcast_convert_type(key_u ^ sign, jnp.int32)
            key_sorted, gsid_sorted = jax.lax.sort_key_val(key, gsid)
            out += [gsid_sorted[-1], key_sorted[-1]]
        if k_stage >= 10:  # gsid_counts chain
            from easygaussiansplatting_tpu.ops.pallas.sort import sort_pairs

            wcum_pad = jnp.concatenate([jnp.zeros(1, wcum.dtype), wcum])
            lo_cnt = jnp.minimum(wcum_pad[jnp.clip(rstart, 0, MAXR)], kept)
            hi_cnt = jnp.minimum(
                wcum_pad[jnp.clip(rstart + row_counts, 0, MAXR)], kept)
            count_sorted = (hi_cnt - lo_cnt).astype(jnp.int32)
            _, by_id = sort_pairs(order, count_sorted)
            out.append(by_id[-1])
        if k_stage >= 11:  # segment layout
            binning = {
                "tile_start": tile_start,
                "tile_cnt": tile_cnt,
                "patch_gsid": gsid_sorted,
            }
            meta = segment_layout(binning, k_chunk=512, n_tiles=NT)
            out.append(meta["seg_tile"][-1])
        return jnp.stack([jnp.asarray(o, jnp.float32).reshape(())
                          for o in out]).sum()

    return jax.jit(run)


LABELS = [
    "1 depth sort",
    "2 rect gathers",
    "3 rcum/rstart",
    "4 L1 propagate",
    "5 gtab row gather",
    "6 ellipse extents",
    "7 wcum+tilecnt",
    "8 L2 propagate",
    "9 patch sort",
    "10 gsid_counts",
    "11 segment_layout",
]


def main():
    scene = make_synthetic_scene(seed=0, n_gaussians=N, n_cams=1, width=W,
                                 height=H, log_scale_mean=-3.6)
    cam = scene["cameras"][0]
    shs = np.zeros((N, 48), np.float32)
    shs[:, :3] = scene["shs"]
    params = tuple(jnp.asarray(x, jnp.float32) for x in (
        scene["pws"], shs, scene["alphas"], scene["scales"], scene["rots"]))
    aux = jax.jit(lambda p: stages.preprocess(*p, cam))(params)
    jax.block_until_ready(aux)
    args = (aux["us"], aux["depths"], aux["areas"], aux["valid"],
            aux["cinv2ds"], aux["alphas"])

    prev = 0.0
    for k in range(1, 12):
        fn = build_prefix(k, *args)
        v = fn()
        jax.block_until_ready(v)
        float(v)  # warm the readback
        iters = 10
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                v = fn()
            float(v)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"prefix {LABELS[k-1]:22s} {best*1e3:8.3f} ms   "
              f"(+{(best-prev)*1e3:7.3f})", flush=True)
        prev = best


if __name__ == "__main__":
    main()
