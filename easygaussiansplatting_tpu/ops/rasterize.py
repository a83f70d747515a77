"""Unified differentiable render API with selectable rasteriser backend.

This is the layer the training loop and user code call — the JAX counterpart
of the reference's GSFunction (/root/reference/gsplat/gsmodel.py:6-93), with
autodiff replacing the saved-Jacobian plumbing.

Backends:
  "tiled"  — vectorised tiled rasteriser, plain AD (ops/rasterize_tiled.py)
  "dense"  — O(N*H*W) scan rasteriser, plain AD (tests/tiny scenes)
  "pallas" — Pallas TPU kernels under jax.custom_vjp (ops/pallas)

`us_offset` (zeros, [N,2]) is added to the projected screen positions so
grad(loss, us_offset) yields the per-Gaussian screen-space gradient used by
densification — the reference achieves the same with a dummy `us` tensor
(gsmodel.py:196-199).
"""

import jax

from easygaussiansplatting_tpu.ops import stages


def resolve_backend(backend):
    """"auto" -> the production backend for the current platform: the Pallas
    kernels on TPU, the tiled-AD rasteriser elsewhere (Pallas off-TPU runs
    under the interpreter — correct but far too slow to be a default)."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "tiled"
    return backend


def raster_from_aux(
    us, cinv2ds, alphas, colors, depths, areas, valid, *,
    width, height, backend="tiled", tile=16, max_patches=2**18, max_rows=None,
    k_chunk=64, n_chunks=16, need_grads=True, table=None,
):
    """Stage 6 alone: bin + rasterise already-preprocessed attributes.

    This is the boundary the parallel layer wraps in shard_map: stages 1-5
    run GSPMD-sharded over the (data, gs) mesh, the per-camera attribute
    arrays are all-gathered over the gs axis at this function's entry, and
    binning + the Pallas kernels run unsharded per data-shard (the Mosaic
    custom call cannot be auto-partitioned by GSPMD). Returns
    (image [3,H,W], raster-aux dict).
    """
    backend = resolve_backend(backend)
    if backend == "dense":
        from easygaussiansplatting_tpu.ops.rasterize_ref import rasterize_dense

        image, contrib, final_tau = rasterize_dense(
            us, cinv2ds, alphas, colors, depths, areas, valid,
            width=width, height=height, tile=tile,
        )
        return image, {"contrib": contrib, "final_tau": final_tau}

    from easygaussiansplatting_tpu.ops.binning import bin_gaussians

    binning = bin_gaussians(
        jax.lax.stop_gradient(us),
        jax.lax.stop_gradient(depths),
        jax.lax.stop_gradient(areas),
        valid,
        width=width, height=height, tile=tile, max_patches=max_patches,
        max_rows=max_rows,
        # skip-ellipse row culling: candidate set stays pixel-exact vs the
        # AABB (see bin_gaussians) while patches drop 25-40%
        cinv2ds=cinv2ds, alphas=alphas,
        # the Pallas backward's sort-reduce gradient path needs per-gaussian
        # patch counts (see _raster_table_bwd); inference renders
        # (need_grads=False) skip that work — a backward through one still
        # works via the XLA scatter fallback
        gsid_counts=(need_grads and backend == "pallas"
                     and jax.default_backend() == "tpu"),
    )

    if backend == "tiled":
        from easygaussiansplatting_tpu.ops.rasterize_tiled import rasterize_tiled

        image, raux = rasterize_tiled(
            us, cinv2ds, alphas, colors,
            binning["patch_gsid"], binning["tile_start"], binning["tile_cnt"],
            width=width, height=height, tile=tile,
            k_chunk=k_chunk, n_chunks=n_chunks,
        )
    elif backend == "pallas":
        from easygaussiansplatting_tpu.ops.pallas.rasterize import rasterize_pallas

        image, raux = rasterize_pallas(
            us, cinv2ds, alphas, colors, binning,
            width=width, height=height, tile=tile, k_chunk=k_chunk,
            table=table,
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    return image, {**raux, "binning": binning}


def render(
    pws, shs, alphas, scales, rots, cam,
    alive=None, us_offset=None, sh_degree=3, backend="tiled",
    tile=16, max_patches=2**18, max_rows=None, k_chunk=64, n_chunks=16,
    need_grads=True,
):
    """Returns (image [3,H,W], aux dict)."""
    from easygaussiansplatting_tpu.utils.envflag import env_flag

    table = None
    # Fused Pallas preprocess (stages 1-5 + table build in one kernel):
    # DEFAULT ON for TPU since the r4 on-chip A/B at the landed defaults
    # (15.19 vs 14.99 Mpix/s fwd+bwd, 31.0 vs 30.5 fwd-only — same-session
    # pair; at the old SUB=128 config it was a wash, BASELINE.md). CPU /
    # interpret runs default to the stages chain (the parity baseline);
    # EGS_FUSED_PRE=0/1 overrides either way.
    fused_default = jax.default_backend() == "tpu"
    if (env_flag("EGS_FUSED_PRE", default=fused_default)
            and resolve_backend(backend) == "pallas"):
        # Limitation vs the stages path: camera-parameter gradients are not
        # propagated (the fused vjp returns zeros for the camera vector);
        # cameras are not trained anywhere in this framework.
        from easygaussiansplatting_tpu.ops.pallas.preprocess import (
            fused_preprocess,
            offset_table,
        )

        aux = fused_preprocess(
            pws, shs, alphas, scales, rots, cam, alive=alive,
            sh_degree=sh_degree,
        )
        table, us = offset_table(aux.pop("table"), us_offset)
        aux["us"] = us
    else:
        aux = stages.preprocess(
            pws, shs, alphas, scales, rots, cam, alive=alive,
            sh_degree=sh_degree,
        )
        us = aux["us"]
        if us_offset is not None:
            us = us + us_offset
            aux["us"] = us

    image, raux = raster_from_aux(
        us, aux["cinv2ds"], aux["alphas"], aux["colors"], aux["depths"],
        aux["areas"], aux["valid"],
        width=cam.width, height=cam.height, backend=backend, tile=tile,
        max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk,
        n_chunks=n_chunks, need_grads=need_grads, table=table,
    )
    return image, {**aux, **raux}
