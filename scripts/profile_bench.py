"""Breakdown timing of the bench-scale pipeline on the current backend."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import time

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
from easygaussiansplatting_tpu.ops import stages
from easygaussiansplatting_tpu.ops.binning import bin_gaussians
from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import render


def timeit(label, fn, *args, iters=5, trials=3):
    # a VALUE READ after warm-up (not block_until_ready, which the tunneled
    # backend can satisfy while the compile is still in flight — the first
    # timed rows then absorb minutes of queued compile); best-of-trials
    # guards against transient tunnel stalls
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:32s} {best*1e3:9.2f} ms", flush=True)
    return out


def main(width=979, height=546, n_gaussians=65536, max_patches=573440,
         max_rows=262144, k_chunk=512):  # budget = the r4-landed default
    scene = make_synthetic_scene(seed=0, n_gaussians=n_gaussians, n_cams=1, width=width,
                                 height=height, log_scale_mean=-3.6)
    cam = scene["cameras"][0]
    n = scene["pws"].shape[0]
    shs = np.zeros((n, 48), np.float32)
    shs[:, :3] = scene["shs"]
    params = tuple(
        jnp.asarray(x, jnp.float32)
        for x in (scene["pws"], shs, scene["alphas"], scene["scales"], scene["rots"])
    )
    gt = jnp.zeros((3, height, width), jnp.float32)

    pre = jax.jit(lambda p: stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam))
    aux = timeit("preprocess (stages 1-5)", pre, params)

    binf = jax.jit(
        lambda a: bin_gaussians(
            a["us"], a["depths"], a["areas"], a["valid"],
            width=width, height=height, tile=16, max_patches=max_patches,
            max_rows=max_rows, cinv2ds=a["cinv2ds"], alphas=a["alphas"],
            gsid_counts=True,
        )
    )
    binning = timeit("binning (production args)", binf, aux)
    print(f"{'  total patches':32s} {int(binning['total']):9d}  dropped {int(binning['n_dropped'])}")

    fwd = jax.jit(
        lambda p: render(*p, cam, backend="pallas", max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk)[0]
    )
    timeit("render fwd (pallas)", fwd, params)

    def loss_fn(p):
        img, _ = render(*p, cam, backend="pallas", max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk)
        return gau_loss(img, gt)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    timeit("fwd+bwd full", vg, params)

    l1 = jax.jit(jax.value_and_grad(lambda p: jnp.abs(render(*p, cam, backend='pallas', max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk)[0] - gt).mean()))
    timeit("fwd+bwd (L1 only)", l1, params)

    # in-context ablation of the gradient-reduction strategy: the same full
    # fwd+bwd step with the sort-reduce swapped for the XLA scatter
    # (EGS_SCATTER_REDUCE gates the branch inside _raster_table_bwd; a new
    # jit wrapper forces a retrace so the flag takes effect)
    import os

    os.environ["EGS_SCATTER_REDUCE"] = "1"
    try:
        vg2 = jax.jit(jax.value_and_grad(
            lambda p: gau_loss(render(*p, cam, backend="pallas",
                                      max_patches=max_patches,
                                      max_rows=max_rows,
                                      k_chunk=k_chunk)[0], gt)))
        timeit("fwd+bwd (XLA-scatter reduce)", vg2, params)
    finally:
        del os.environ["EGS_SCATTER_REDUCE"]


if __name__ == "__main__":
    import sys

    kw = {}
    if len(sys.argv) > 1:
        kw["n_gaussians"] = int(sys.argv[1])
    main(**kw)
