"""Sharded epoch driver: batched multi-chip training.

Extends the reference recipe (/root/reference/train.py:44-83 — one camera per
step) to B cameras per step over the mesh's data axis, keeping the densify /
alpha-reset cadence. Cameras are bucketed by image size (one jit cache entry
per size); batches are formed within a bucket.
"""

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from easygaussiansplatting_tpu.parallel.distributed import (
    process_batch_rows,
    put_batch,
    put_replicated,
    reshard_like,
)
from easygaussiansplatting_tpu.parallel.train import (
    make_sharded_render,
    make_sharded_train_step,
    shard_pool,
    stack_cameras,
)
from easygaussiansplatting_tpu.train.density import (
    densify_and_prune,
    density_stats_init,
    reset_alpha,
)
from easygaussiansplatting_tpu.train.optimizer import adam_init
from easygaussiansplatting_tpu.utils.image import psnr


def train_sharded(pool, cameras, gt_images, config, scene_size, mesh, batch=None,
                  seed=0, log_fn=print, eval_every=10, epoch_cb=None,
                  adam_state=None, stats=None, start_epoch=0, key=None,
                  banded=False):
    """Full training over a device mesh. Pass adam_state/stats/start_epoch/key
    (from train.checkpoint.load_checkpoint) to resume. Returns
    (pool, history).

    ``banded=True`` trains ONE camera per step with stage 6 sharded by
    tile-row bands over the whole mesh (make_banded_train_step) — the
    batch < data-axis configuration where the batched step would idle
    devices. Single-host only.
    """
    if banded:
        if jax.process_count() > 1:
            raise ValueError("banded training is single-host (bands psum "
                             "over the whole mesh)")
        batch = 1
    elif batch is None:
        batch = mesh.shape["data"]
    if not banded and batch % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch {batch} must be a multiple of the data axis {mesh.shape['data']}"
        )
    if pool.capacity % mesh.shape["gs"] != 0:
        raise ValueError(
            f"pool capacity {pool.capacity} not divisible by gs axis {mesh.shape['gs']}"
        )

    multihost = jax.process_count() > 1
    if multihost and log_fn is print and jax.process_index() != 0:
        log_fn = lambda *a, **k: None  # noqa: E731 — only host 0 narrates
    # every process runs the identical rng stream, so batch selection and
    # densify decisions agree host-to-host without any exchange
    rng = np.random.default_rng(seed + start_epoch)
    if key is None:
        key = jax.random.PRNGKey(seed)
    n = len(cameras)
    steps_per_epoch = max(1, n // batch)
    max_steps = config.epochs * steps_per_epoch
    if banded:
        from easygaussiansplatting_tpu.parallel.train import make_banded_train_step

        step = make_banded_train_step(mesh, config, scene_size, max_steps)
    else:
        step = make_sharded_train_step(mesh, config, scene_size, max_steps)
    render_fn = make_sharded_render(mesh, config)

    buckets = defaultdict(list)
    for i, c in enumerate(cameras):
        buckets[(c.width, c.height)].append(i)

    if adam_state is None:
        adam_state = adam_init(pool.params())
    if stats is None:
        stats = density_stats_init(pool.capacity)

    def to_mesh(pool, adam_state, stats):
        if not multihost:
            return shard_pool(mesh, pool, adam_state, stats)
        leaves = jax.tree.leaves(pool)
        if isinstance(leaves[0], jax.Array) and not leaves[0].is_fully_addressable:
            return reshard_like(mesh, (pool, adam_state, stats))
        return put_replicated(mesh, (pool, adam_state, stats))

    pool, adam_state, stats = to_mesh(pool, adam_state, stats)
    # rows of each global batch this process feeds (all of them single-host)
    my_rows = process_batch_rows(mesh, batch) if multihost else list(range(batch))
    if multihost:
        # per-process local slices must be host data for put_batch
        gt_store = [np.asarray(im, np.float32) for im in gt_images]
    else:
        # keep every frame device-resident: re-uploading B frames per step
        # costs seconds over tunneled links; the per-step stack then runs
        # device-to-device
        gt_store = [jnp.asarray(im, jnp.float32) for im in gt_images]

    history = {"loss": [], "psnr": [], "n_alive": [], "epoch_time": []}
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        losses = []
        for idxs in _epoch_batches(buckets, batch, rng):
            if banded:
                i = idxs[0]
                pool, adam_state, stats, loss = step(
                    pool, adam_state, stats, cameras[i], gt_store[i]
                )
                losses.append(loss)
                continue
            local = [idxs[r] for r in my_rows]
            bcam = put_batch(mesh, stack_cameras([cameras[i] for i in local]))
            if multihost:
                gt = put_batch(mesh, np.stack([gt_store[i] for i in local]))
            else:
                gt = jax.device_put(
                    jnp.stack([gt_store[i] for i in local]),
                    jax.sharding.NamedSharding(mesh, P("data")),
                )
            pool, adam_state, stats, loss = step(pool, adam_state, stats, bcam, gt)
            losses.append(loss)
        avg_loss = float(jnp.mean(jnp.stack(losses)))
        history["loss"].append(avg_loss)
        history["epoch_time"].append(time.time() - t0)

        e = epoch + 1
        if e % config.densify_every_epochs == 0 and e <= config.densify_until_epoch and e > 1:
            key, sub = jax.random.split(key)
            pool, adam_state, stats, report = densify_and_prune(
                pool, adam_state, stats, sub, scene_size, config
            )
            pool, adam_state, stats = to_mesh(pool, adam_state, stats)
            log_fn(
                f"[epoch {e}] densify: pruned={int(report['n_pruned'])} "
                f"cloned={int(report['n_cloned'])} split={int(report['n_split'])} "
                f"alive={int(report['n_alive'])}"
            )
        if e % config.reset_alpha_every_epochs == 0 and e < config.epochs:
            # never end training on a reset: the final model would carry the
            # clamped opacities (the reference resets unconditionally,
            # train.py:75-77, and suffers exactly this when epochs % 15 == 0)
            pool, adam_state = reset_alpha(pool, adam_state, config)
            log_fn(f"[epoch {e}] alpha reset")

        history["n_alive"].append(int(pool.n_alive()))
        if e % eval_every == 0 or e == config.epochs:
            img = render_fn(pool, cameras[0])
            p = float(psnr(jnp.clip(img, 0, 1), jnp.clip(jnp.asarray(gt_store[0]), 0, 1)))
            history["psnr"].append((e, p))
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} psnr={p:.2f} "
                   f"alive={history['n_alive'][-1]} ({history['epoch_time'][-1]:.1f}s)")
        else:
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} alive={history['n_alive'][-1]} "
                   f"({history['epoch_time'][-1]:.1f}s)")
        if epoch_cb is not None:
            from easygaussiansplatting_tpu.train.loop import call_epoch_cb

            call_epoch_cb(epoch_cb, e, pool, adam_state, stats, key, history)
    return pool, history


def _epoch_batches(buckets, batch, rng):
    """Shuffled batches of camera indices, each within one (W,H) bucket.
    Short remainders are padded by re-sampling the bucket (keeps shapes
    static for jit)."""
    out = []
    for idxs in buckets.values():
        order = rng.permutation(idxs)
        for i in range(0, len(order), batch):
            chunk = list(order[i : i + batch])
            while len(chunk) < batch:
                chunk.append(int(rng.choice(idxs)))
            out.append(chunk)
    rng.shuffle(out)
    return out
