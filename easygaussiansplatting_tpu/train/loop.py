"""Training loop: jitted step + epoch driver.

The TPU counterpart of the reference trainer (/root/reference/train.py:14-84):
batch = one camera per step, loss = 0.8 L1 + 0.2 DSSIM, Adam(eps=1e-15) with
per-group LRs, screen-gradient accumulation after every step, densify every 5
epochs until epoch 50, alpha reset every 15 epochs. Densification runs as a
separate jitted pure function on the fixed pool, so the hot step never
recompiles.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import render
from easygaussiansplatting_tpu.train.config import TrainConfig
from easygaussiansplatting_tpu.train.density import (
    densify_and_prune,
    density_stats_init,
    reset_alpha,
    update_density_stats,
)
from easygaussiansplatting_tpu.train.optimizer import adam_init, adam_update, make_lr_fns
from easygaussiansplatting_tpu.utils.image import psnr


def render_pool_image(pool, cam, config, us_offset=None):
    pws, shs, alphas, scales, rots, alive = pool.activated()
    return render(
        pws, shs, alphas, scales, rots, cam,
        alive=alive, us_offset=us_offset,
        backend=config.backend, tile=config.tile, max_patches=config.max_patches,
        max_rows=config.max_rows, k_chunk=config.k_chunk, n_chunks=config.n_chunks,
        sh_degree=config.sh_degree,
    )


def make_train_step(config: TrainConfig, scene_size: float, max_steps: int,
                    max_patches=None):
    lr_fns = make_lr_fns(config, scene_size, max_steps)
    if max_patches is not None:
        import dataclasses

        config = dataclasses.replace(config, max_patches=max_patches)

    @jax.jit
    def train_step(pool, adam_state, stats, cam, gt_image):
        params = pool.params()
        us_offset = jnp.zeros((pool.capacity, 2), jnp.float32)

        def loss_fn(params, us_offset):
            p = pool.replace_params(params)
            image, aux = render_pool_image(p, cam, config, us_offset=us_offset)
            return gau_loss(image, gt_image, config.loss_lambda), aux

        (loss, aux), (gparams, g_us) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, us_offset)
        new_params, adam_state = adam_update(
            gparams, adam_state, params, lr_fns,
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        )
        # visibility mask for densify stats: reference uses depths > MIN_DEPTH
        # (gsmodel.py:50); restrict to alive slots on the pool
        visible = (aux["depths"] >= 0.2) & pool.alive
        stats = update_density_stats(stats, g_us, visible)
        binning = aux.get("binning")
        n_patches = binning["total"] if binning is not None else jnp.int32(0)
        return pool.replace_params(new_params), adam_state, stats, loss, n_patches

    return train_step


class PatchBudget:
    """Epoch-granular adaptive max_patches (multiple of 16384 for the scan
    kernel; one jit cache entry per size)."""

    def __init__(self, config: TrainConfig):
        self.config = config
        self.value = _round_budget(config.max_patches)

    def update(self, observed_max: int) -> bool:
        """Returns True if the budget changed (recompile needed)."""
        if not self.config.adaptive_budget:
            return False
        want = _round_budget(int(observed_max * self.config.budget_headroom))
        if observed_max > 0.9 * self.value or want < 0.5 * self.value:
            if want != self.value:
                self.value = want
                return True
        return False


def _round_budget(n, quantum=16384):
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def train(pool, cameras, gt_images, config: TrainConfig, scene_size, seed=0,
          log_fn=print, eval_every=10, epoch_cb=None,
          adam_state=None, stats=None, start_epoch=0, key=None):
    """Full training. cameras: list of Camera (same W,H); gt_images: list of
    [3,H,W] arrays. Pass adam_state/stats/start_epoch/key (from
    train.checkpoint.load_checkpoint) to resume. Returns (pool, history)."""
    rng = np.random.default_rng(seed + start_epoch)
    if key is None:
        key = jax.random.PRNGKey(seed)
    n = len(cameras)
    max_steps = config.epochs * n
    budget = PatchBudget(config)
    train_step = make_train_step(config, scene_size, max_steps, max_patches=budget.value)

    if adam_state is None:
        adam_state = adam_init(pool.params())
    if stats is None:
        stats = density_stats_init(pool.capacity)
    gt_images = [jnp.asarray(g, jnp.float32) for g in gt_images]

    history = {"loss": [], "psnr": [], "n_alive": [], "epoch_time": []}
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        order = rng.permutation(n)
        losses = []
        patch_peak = []
        for i in order:
            pool, adam_state, stats, loss, n_patches = train_step(
                pool, adam_state, stats, cameras[i], gt_images[i]
            )
            losses.append(loss)
            patch_peak.append(n_patches)
        avg_loss = float(jnp.mean(jnp.stack(losses)))
        history["loss"].append(avg_loss)
        history["epoch_time"].append(time.time() - t0)
        if budget.update(int(jnp.max(jnp.stack(patch_peak)))):
            log_fn(f"[epoch {epoch + 1}] patch budget -> {budget.value}")
            train_step = make_train_step(
                config, scene_size, max_steps, max_patches=budget.value
            )

        e = epoch + 1
        if e % config.densify_every_epochs == 0 and e <= config.densify_until_epoch and e > 1:
            key, sub = jax.random.split(key)
            pool, adam_state, stats, report = densify_and_prune(
                pool, adam_state, stats, sub, scene_size, config
            )
            log_fn(
                f"[epoch {e}] densify: pruned={int(report['n_pruned'])} "
                f"cloned={int(report['n_cloned'])} split={int(report['n_split'])} "
                f"dropped={int(report['n_dropped'])} alive={int(report['n_alive'])}"
            )
        if e % config.reset_alpha_every_epochs == 0 and e < config.epochs:
            # never end training on a reset: the final model would carry the
            # clamped opacities (the reference resets unconditionally,
            # train.py:75-77, and suffers exactly this when epochs % 15 == 0)
            pool, adam_state = reset_alpha(pool, adam_state, config)
            log_fn(f"[epoch {e}] alpha reset")

        history["n_alive"].append(int(pool.n_alive()))
        if e % eval_every == 0 or e == config.epochs:
            img, _ = render_pool_image(pool, cameras[0], config)
            p = float(psnr(jnp.clip(img, 0, 1), jnp.clip(gt_images[0], 0, 1)))
            history["psnr"].append((e, p))
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} psnr={p:.2f} alive={history['n_alive'][-1]}")
        else:
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} alive={history['n_alive'][-1]}")
        if epoch_cb is not None:
            epoch_cb(e, pool, adam_state, stats, key)
    return pool, history
