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

from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import render
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

    @jax.jit
    def step(pool, adam_state, stats, bcam, gt_images):
        params = pool.params()
        params = jax.lax.with_sharding_constraint(params, pool_shardings(mesh, params))
        us_offset = jnp.zeros((pool.capacity, 2), jnp.float32)

        def loss_fn(params, us_offset):
            p = pool.replace_params(params)
            pws, shs, alphas, scales, rots, alive = p.activated()

            def one(cam, gt):
                image, aux = render(
                    pws, shs, alphas, scales, rots, cam,
                    alive=alive, us_offset=us_offset,
                    backend=config.backend, tile=config.tile,
                    max_patches=config.max_patches, max_rows=config.max_rows,
                    k_chunk=config.k_chunk,
                    n_chunks=config.n_chunks, sh_degree=config.sh_degree,
                )
                return gau_loss(image, gt, config.loss_lambda), aux["depths"]

            losses, depths = jax.vmap(one)(bcam, gt_images)
            return jnp.mean(losses), depths

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


def make_sharded_render(mesh, config):
    """Jitted whole-image render of a (sharded) pool for eval/inference."""

    @jax.jit
    def render_fn(pool, cam):
        pws, shs, alphas, scales, rots, alive = pool.activated()
        image, _ = render(
            pws, shs, alphas, scales, rots, cam,
            alive=alive, backend=config.backend, tile=config.tile,
            max_patches=config.max_patches, k_chunk=config.k_chunk,
            n_chunks=config.n_chunks, sh_degree=config.sh_degree,
        )
        return image

    return render_fn
