"""Sharded batched training step (pjit/GSPMD).

Scaling design (SURVEY.md §2.9 — the reference has no distributed layer; this
is the TPU-native extension):

* **data axis**: each step renders a *batch* of cameras, sharded one-or-more
  per device along ``data``. The reference trains one image per step
  (/root/reference/train.py:45-48); batching is how a pod slice turns into
  wall-clock speedup. Per-camera losses are averaged; the parameter gradient
  reduction over the batch is an XLA-inserted ``psum`` over ICI that the
  latency-hiding scheduler overlaps with the backward pass.
* **gs axis**: the Gaussian pool (parameters, Adam moments, densification
  stats) is sharded along its capacity axis. Stages 1-5 (project/cov3d/cov2d/
  SH/conic — embarrassingly parallel over Gaussians) run on the shards; the
  rasteriser consumes the gathered per-Gaussian attributes (XLA inserts the
  all-gather where the binning sort needs global order).

Everything here is plain ``jax.jit`` + sharding constraints — no hand-written
collectives; the mesh layout determines whether they ride ICI or DCN.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from easygaussiansplatting_tpu.ops import stages
from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import raster_from_aux
from easygaussiansplatting_tpu.train.density import update_density_stats
from easygaussiansplatting_tpu.train.optimizer import adam_update, make_lr_fns


def stack_cameras(cams):
    """Stack a list of Camera pytrees (equal W/H) into one batched Camera."""
    import dataclasses

    w, h = cams[0].width, cams[0].height
    if any(c.width != w or c.height != h for c in cams):
        raise ValueError("stack_cameras requires equal image sizes")
    cams = [dataclasses.replace(c, id=0) for c in cams]  # ids are per-camera meta
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def _row_spec(x, axis_name="gs"):
    if getattr(x, "ndim", 0) == 0:
        return P()
    return P(axis_name, *([None] * (x.ndim - 1)))


def pool_shardings(mesh, tree, axis_name="gs"):
    """NamedSharding tree: leading (capacity) axis sharded over `axis_name`,
    scalars replicated."""
    return jax.tree.map(lambda x: NamedSharding(mesh, _row_spec(x, axis_name)), tree)


def shard_pool(mesh, *trees, axis_name="gs"):
    """device_put each pytree with row sharding over the gs axis. Leading
    dims must be divisible by the axis size (round the pool capacity up)."""
    out = tuple(
        jax.device_put(t, pool_shardings(mesh, t, axis_name)) for t in trees
    )
    return out[0] if len(out) == 1 else out


def shard_batch(mesh, tree, axis_name="data"):
    """device_put a batched pytree with the leading axis over `axis_name`."""
    return jax.device_put(
        tree, jax.tree.map(lambda x: NamedSharding(mesh, _row_spec(x, axis_name)), tree)
    )


def batched_raster_fn(mesh, config, width, height, with_table=False):
    """[B,N,*] attribute arrays -> [B,3,H,W] images.

    The raster stage (binning + stage-6 kernels) cannot be auto-partitioned
    by GSPMD when the backend is a Pallas (Mosaic) custom call, so it runs
    under shard_map: sharded over ``data`` (each device rasterises its local
    cameras), with the per-camera attribute arrays all-gathered over the
    ``gs`` axis at entry — the explicit "gather compacted attributes to tile
    owners over ICI" step of SURVEY.md §2.9. The VJP runs under the same
    shard_map; the cotangents leave sharded over ``data`` and GSPMD carries
    the chain back onto the gs-sharded parameters.

    ``with_table``: accept the fused preprocess's prebuilt [B,N,16]
    attribute table as an 8th argument (the EGS_FUSED_PRE path).
    """

    k_chunk, n_chunks = config.raster_chunks()

    def one(us, cinv2ds, alphas, colors, depths, areas, valid, table=None):
        image, _ = raster_from_aux(
            us, cinv2ds, alphas, colors, depths, areas, valid,
            width=width, height=height, backend=config.backend,
            tile=config.tile, max_patches=config.max_patches,
            max_rows=config.max_rows, k_chunk=k_chunk,
            n_chunks=n_chunks, table=table,
        )
        return image

    n_args = 8 if with_table else 7
    batched = jax.vmap(one)
    from easygaussiansplatting_tpu.ops.rasterize import resolve_backend

    if resolve_backend(config.backend) == "pallas":
        spec = P("data")
        batched = jax.shard_map(
            batched, mesh=mesh, in_specs=(spec,) * n_args, out_specs=spec,
            check_vma=False,
        )
    return batched


def fused_batched_preprocess(mesh, config):
    """shard_map'ed fused Pallas preprocess (ops/pallas/preprocess.py) over
    the full (data, gs) mesh: each device runs the fused kernel on its
    gaussian shard for its local cameras — a Mosaic call cannot be
    auto-partitioned by GSPMD, which is why the default stages path stays
    plain vmapped jnp under GSPMD. Selected by EGS_FUSED_PRE=1 with the
    Pallas backend (make_sharded_train_step)."""
    from easygaussiansplatting_tpu.ops.pallas.preprocess import fused_preprocess

    def local(pws, shs, alphas, scales, rots, alive, bcam):
        return jax.vmap(
            lambda cam: fused_preprocess(
                pws, shs, alphas, scales, rots, cam, alive=alive,
                sh_degree=config.sh_degree,
            )
        )(bcam)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("gs"),) * 6 + (P("data"),),
        out_specs=P("data", "gs"),
        check_vma=False,
    )


def make_sharded_train_step(mesh, config, scene_size, max_steps):
    """Batched, sharded version of train.loop.make_train_step.

    Signature of the returned step:
        step(pool, adam_state, stats, batched_cam, gt_images [B,3,H,W])
          -> (pool, adam_state, stats, mean_loss)

    Gradients are those of the *mean* per-camera loss (the reference's recipe
    is batch=1, where mean == the per-image loss). Density stats accumulate
    the summed screen gradient and OR-ed visibility across the batch.
    """
    lr_fns = make_lr_fns(config, scene_size, max_steps)

    from easygaussiansplatting_tpu.ops.rasterize import resolve_backend
    from easygaussiansplatting_tpu.utils.envflag import env_flag

    # same default rule as ops/rasterize.py render: fused preprocess is the
    # TPU production config (r4 A/B winner); CPU keeps the stages baseline
    use_fused = (env_flag("EGS_FUSED_PRE", default=jax.default_backend() == "tpu")
                 and resolve_backend(config.backend) == "pallas")

    @jax.jit
    def step(pool, adam_state, stats, bcam, gt_images):
        params = pool.params()
        params = jax.lax.with_sharding_constraint(params, pool_shardings(mesh, params))
        us_offset = jnp.zeros((pool.capacity, 2), jnp.float32)
        raster = batched_raster_fn(mesh, config, bcam.width, bcam.height,
                                   with_table=use_fused)
        fused_pre = fused_batched_preprocess(mesh, config) if use_fused else None

        def loss_fn(params, us_offset):
            p = pool.replace_params(params)
            pws, shs, alphas, scales, rots, alive = p.activated()

            if use_fused:
                # stages 1-5 + table build as one Mosaic kernel per
                # (camera, gs-shard) under shard_map (EGS_FUSED_PRE)
                from easygaussiansplatting_tpu.ops.pallas.preprocess import (
                    offset_table,
                )

                aux = fused_pre(pws, shs, alphas, scales, rots, alive, bcam)
                table, us = offset_table(aux["table"], us_offset)
                extra = (table,)
            else:
                # stages 1-5: embarrassingly parallel over (camera, gaussian)
                # — GSPMD spreads the [B, N, *] work over the (data, gs) mesh
                aux = jax.vmap(
                    lambda cam: stages.preprocess(
                        pws, shs, alphas, scales, rots, cam,
                        alive=alive, sh_degree=config.sh_degree,
                    )
                )(bcam)
                us = aux["us"] + us_offset[None]
                extra = ()

            images = raster(
                us, aux["cinv2ds"], aux["alphas"], aux["colors"],
                aux["depths"], aux["areas"], aux["valid"], *extra,
            )
            losses = jax.vmap(lambda im, gt: gau_loss(im, gt, config.loss_lambda))(
                images, gt_images
            )
            return jnp.mean(losses), aux["depths"]

        (loss, depths), (gparams, g_us) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, us_offset)

        new_params, adam_state = adam_update(
            gparams, adam_state, params, lr_fns,
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        )
        new_params = jax.lax.with_sharding_constraint(
            new_params, pool_shardings(mesh, new_params)
        )
        visible = jnp.any(depths >= 0.2, axis=0) & pool.alive
        stats = update_density_stats(stats, g_us, visible)
        return pool.replace_params(new_params), adam_state, stats, loss

    return step


def make_banded_train_step(mesh, config, scene_size, max_steps):
    """Single-camera training step sharded by TILE-ROW BANDS over ALL mesh
    devices — the batch < data-axis case of SURVEY §2.9's "image tiles
    sharded for stage 6" (make_sharded_train_step idles devices when the
    batch is smaller than the data axis; this step uses every device on
    ONE image).

    Each device renders its contiguous band of tile rows PLUS a 16-px halo
    on each side and computes the per-pixel L1/SSIM terms locally; band
    sums are psum'd and normalised globally. The decomposition is EXACT:
    the loss's SSIM is a zero-padded SAME 11x11 blur (ops/loss.py), so a
    pixel's ssim_map value depends only on image rows within +-5 — inside
    the halo — and rows outside the true image are masked to zero exactly
    like the global blur's zero padding truncates there. Gradients flow
    through the per-band custom_vjp rasterisations; shard_map's transpose
    psums the replicated-input cotangents across bands (the band analogue
    of the batch gradient reduction).

    Stages 1-5 run via the GSPMD stages path (not the fused Pallas
    preprocess — acceptable: this step exists for the batch < data-axis
    regime where stage-6 parallelism, not preprocess fusion, is the win).

    Returns step(pool, adam_state, stats, cam, gt_image [3,H,W])
    -> (pool, adam_state, stats, loss).
    """
    from easygaussiansplatting_tpu.ops.loss import (
        _depthwise_blur, _gaussian_window,
    )

    lr_fns = make_lr_fns(config, scene_size, max_steps)
    k_chunk, n_chunks = config.raster_chunks()
    ndev = int(mesh.devices.size)
    axes = tuple(mesh.axis_names)
    tile = config.tile
    # one tile row of halo; must cover the SSIM window radius (5)
    assert tile >= 5, "band halo (one tile row) must cover the SSIM window"
    halo = tile
    keff = max(128, 1 << (int(k_chunk) - 1).bit_length())
    share = -(-config.max_patches * 5 // (2 * max(ndev, 1)))
    mp = max(keff, -(-share // keff) * keff)
    mrows = (None if config.max_rows is None
             else max(1, -(-config.max_rows * 5 // (2 * max(ndev, 1)))))

    @jax.jit
    def step(pool, adam_state, stats, cam, gt_image):
        params = pool.params()
        params = jax.lax.with_sharding_constraint(params, pool_shardings(mesh, params))
        us_offset = jnp.zeros((pool.capacity, 2), jnp.float32)
        h, w = cam.height, cam.width
        gy = -(-h // tile)
        sub_h = -(-gy // ndev) * tile
        h_loc = sub_h + 2 * halo
        npix = 3 * h * w

        def band_loss(us, cinv2ds, al, colors, depths, areas, valid, gt):
            d = jax.lax.axis_index(axes[0])
            for ax in axes[1:]:
                d = d * mesh.shape[ax] + jax.lax.axis_index(ax)
            y0 = d * sub_h - halo  # global row of local row 0 (may be < 0)
            us_b = us - jnp.stack([jnp.zeros((), us.dtype),
                                   y0.astype(us.dtype)])
            image, _ = raster_from_aux(
                us_b, cinv2ds, al, colors, depths, areas, valid,
                width=w, height=h_loc, backend=config.backend, tile=tile,
                max_patches=mp, max_rows=mrows, k_chunk=k_chunk,
                n_chunks=n_chunks,
            )
            # rows outside the true image must be ZERO on both operands —
            # that is exactly the global blur's zero padding there
            gyrow = y0 + jnp.arange(h_loc)
            in_img = ((gyrow >= 0) & (gyrow < h))[None, :, None]
            image = jnp.where(in_img, image, 0.0)
            gt_b = jax.lax.dynamic_slice(
                jnp.pad(gt, ((0, 0), (halo, sub_h * ndev + halo - h), (0, 0))),
                (0, d * sub_h, 0), (3, h_loc, w),
            )
            owned = (in_img & ((gyrow >= d * sub_h)
                               & (gyrow < (d + 1) * sub_h))[None, :, None])

            l1_sum = jnp.sum(jnp.where(owned, jnp.abs(image - gt_b), 0.0))
            window = _gaussian_window()
            mu1 = _depthwise_blur(image, window)
            mu2 = _depthwise_blur(gt_b, window)
            mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
            s1 = _depthwise_blur(image * image, window) - mu1_sq
            s2 = _depthwise_blur(gt_b * gt_b, window) - mu2_sq
            s12 = _depthwise_blur(image * gt_b, window) - mu1_mu2
            c1, c2 = 0.01**2, 0.03**2
            smap = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
                (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
            ssim_sum = jnp.sum(jnp.where(owned, smap, 0.0))
            l1_sum = jax.lax.psum(l1_sum, axes)
            ssim_sum = jax.lax.psum(ssim_sum, axes)
            lam = config.loss_lambda
            return ((1.0 - lam) * l1_sum / npix
                    + lam * (1.0 - ssim_sum / npix))

        banded = jax.shard_map(
            band_loss, mesh=mesh, in_specs=(P(),) * 8, out_specs=P(),
            check_vma=False,
        )

        def loss_fn(params, us_offset):
            p = pool.replace_params(params)
            pws, shs, alphas, scales, rots, alive = p.activated()
            aux = stages.preprocess(
                pws, shs, alphas, scales, rots, cam, alive=alive,
                sh_degree=config.sh_degree,
            )
            us = aux["us"] + us_offset
            loss = banded(
                us, aux["cinv2ds"], aux["alphas"], aux["colors"],
                aux["depths"], aux["areas"], aux["valid"], gt_image,
            )
            return loss, aux["depths"]

        (loss, depths), (gparams, g_us) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, us_offset)
        new_params, adam_state = adam_update(
            gparams, adam_state, params, lr_fns,
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        )
        new_params = jax.lax.with_sharding_constraint(
            new_params, pool_shardings(mesh, new_params)
        )
        visible = (depths >= 0.2) & pool.alive
        stats = update_density_stats(stats, g_us, visible)
        return pool.replace_params(new_params), adam_state, stats, loss

    return step


def make_sharded_render(mesh, config, *, tile_sharded=None, with_aux=False):
    """Jitted whole-image render of a (sharded) pool for eval/inference.

    Stages 1-5 run gs-sharded under GSPMD. Stage 6 (binning + rasteriser):

    * ``tile_sharded=True`` (the default on multi-device meshes with the
      Pallas backend) splits the image into contiguous tile-row bands, one
      per device of the flattened (data, gs) mesh. Each device receives the
      full per-Gaussian attribute arrays (the all-gather the shard_map
      boundary inserts — SURVEY.md §2.9 "image tiles sharded for stage 6,
      all_gather of visible Gaussians to tile owners") and bins + rasterises
      only its band, so single-image eval/viewer latency scales with the
      mesh instead of every device replicating the full frame.
    * ``tile_sharded=False`` keeps the fully-replicated raster — the parity
      baseline (and the only choice for a 1-device mesh or non-Pallas
      backends, where plain GSPMD already partitions the tiled rasteriser).

    Bands don't split patches evenly, so each device gets a patch budget
    of 4x the even share (``config.max_patches / n_devices``), capped at
    the full ``config.max_patches`` — concentrated scenes can put several
    bands' worth of patches in one band, and an eval render must not
    silently truncate. ``with_aux=True`` additionally returns
    ``{"n_dropped": total}`` (psum over devices) so callers can verify the
    band budgets didn't truncate; healthy scenes report 0.
    """

    k_chunk, n_chunks = config.raster_chunks()
    ndev = int(mesh.devices.size)
    axes = tuple(mesh.axis_names)
    if tile_sharded is None:
        tile_sharded = ndev > 1

    from easygaussiansplatting_tpu.ops.rasterize import resolve_backend

    use_bands = (
        tile_sharded and ndev > 1 and resolve_backend(config.backend) == "pallas"
    )

    @jax.jit
    def render_fn(pool, cam):
        pws, shs, alphas, scales, rots, alive = pool.activated()
        aux = stages.preprocess(
            pws, shs, alphas, scales, rots, cam, alive=alive,
            sh_degree=config.sh_degree,
        )
        args = (
            aux["us"], aux["cinv2ds"], aux["alphas"], aux["colors"],
            aux["depths"], aux["areas"], aux["valid"],
        )

        if use_bands:
            tile = config.tile
            gy = -(-cam.height // tile)
            sub_h = -(-gy // ndev) * tile  # band height (whole tile rows)
            # per-band budgets: 2.5x the even share, chunk-aligned (the
            # rasteriser requires max_patches % k_chunk == 0 after k_chunk
            # rounds up to a power of two >= 128)
            keff = max(128, 1 << (int(k_chunk) - 1).bit_length())
            share = -(-config.max_patches * 4 // ndev)
            mp = min(-(-config.max_patches // keff) * keff,
                     max(keff, -(-share // keff) * keff))
            mrows = (None if config.max_rows is None
                     else max(1, min(config.max_rows,
                                     -(-config.max_rows * 4 // ndev))))

            def band(us, cinv2ds, al, colors, depths, areas, valid):
                # flattened device index, data-major (must match the
                # out_specs P(axes) layout of the stacked bands)
                d = jax.lax.axis_index(axes[0])
                for ax in axes[1:]:
                    d = d * mesh.shape[ax] + jax.lax.axis_index(ax)
                y_off = (d * sub_h).astype(us.dtype)
                us_b = us - jnp.stack([jnp.zeros_like(y_off), y_off])
                image, raux = raster_from_aux(
                    us_b, cinv2ds, al, colors, depths, areas, valid,
                    width=cam.width, height=sub_h, backend=config.backend,
                    tile=tile, max_patches=mp, max_rows=mrows,
                    k_chunk=k_chunk, n_chunks=n_chunks, need_grads=False,
                )
                b = raux["binning"]
                dropped = jax.lax.psum(
                    b.get("n_dropped", 0) + b.get("rows_dropped", 0), axes
                )
                return image[None], dropped

            band = jax.shard_map(
                band, mesh=mesh, in_specs=(P(),) * 7,
                out_specs=(P(axes), P()), check_vma=False,
            )
            parts, dropped = band(*args)  # [ndev, 3, sub_h, W]
            img = jnp.transpose(parts, (1, 0, 2, 3)).reshape(
                3, ndev * sub_h, cam.width
            )[:, :cam.height]
            return (img, {"n_dropped": dropped}) if with_aux else img

        def one(us, cinv2ds, al, colors, depths, areas, valid):
            image, raux = raster_from_aux(
                us, cinv2ds, al, colors, depths, areas, valid,
                width=cam.width, height=cam.height, backend=config.backend,
                tile=config.tile, max_patches=config.max_patches,
                max_rows=config.max_rows, k_chunk=k_chunk,
                n_chunks=n_chunks, need_grads=False,
            )
            b = raux.get("binning", {})
            dropped = b.get("n_dropped", 0) + b.get("rows_dropped", 0)
            return image, jnp.asarray(dropped, jnp.int32)

        if resolve_backend(config.backend) == "pallas":
            one = jax.shard_map(
                one, mesh=mesh, in_specs=(P(),) * 7, out_specs=(P(), P()),
                check_vma=False,
            )
        img, dropped = one(*args)
        return (img, {"n_dropped": dropped}) if with_aux else img

    return render_fn
