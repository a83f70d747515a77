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


def render_pool_image(pool, cam, config, us_offset=None, need_grads=True):
    """need_grads=False for inference-only renders (eval PSNR, previews,
    monitor frames): skips the gsid_counts sort work the Pallas backward's
    gradient reduction needs (a VJP through one still works via the XLA
    scatter fallback)."""
    pws, shs, alphas, scales, rots, alive = pool.activated()
    k_chunk, n_chunks = config.raster_chunks()
    return render(
        pws, shs, alphas, scales, rots, cam,
        alive=alive, us_offset=us_offset,
        backend=config.backend, tile=config.tile, max_patches=config.max_patches,
        max_rows=config.max_rows, k_chunk=k_chunk, n_chunks=n_chunks,
        sh_degree=config.sh_degree, need_grads=need_grads,
    )


def make_train_step(config: TrainConfig, scene_size: float, max_steps: int,
                    max_patches=None):
    lr_fns = make_lr_fns(config, scene_size, max_steps)
    if max_patches is not None:
        import dataclasses

        # an explicit row budget scales with the patch budget (same growth
        # factor) so PatchBudget growth relieves BOTH overflow modes
        max_rows = config.max_rows
        if max_rows is not None and max_patches != config.max_patches:
            max_rows = -(-max_rows * max_patches // config.max_patches)
            max_rows = _round_budget(
                max_rows, getattr(config, "budget_quantum", 16384))
        config = dataclasses.replace(
            config, max_patches=max_patches, max_rows=max_rows)

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
        if binning is not None:
            # the budget observation: row and patch budgets are the same
            # number when max_rows is None, so rows drive growth too; with
            # an explicit max_rows, row pressure is converted into
            # patch-budget units through the (static) patches/rows ratio so
            # PatchBudget.update reacts to rows-only overflow as well (the
            # row budget scales with the patch budget, see above)
            obs = binning["total"]
            if config.max_rows is None:
                obs = jnp.maximum(obs, binning["total_rows"])
            else:
                ratio = config.max_patches / config.max_rows
                rows_obs = (binning["total_rows"].astype(jnp.float32)
                            * jnp.float32(ratio)).astype(jnp.int32)
                obs = jnp.maximum(obs, rows_obs)
            binfo = {
                "obs": obs,
                "dropped": binning["n_dropped"] + binning["rows_dropped"],
            }
        else:
            binfo = {"obs": jnp.int32(0), "dropped": jnp.int32(0)}
        return pool.replace_params(new_params), adam_state, stats, loss, binfo

    return train_step


class PatchBudget:
    """Epoch-granular adaptive max_patches (multiple of 16384 for the scan
    kernel; one jit cache entry per size)."""

    def __init__(self, config: TrainConfig):
        self.config = config
        self.quantum = getattr(config, "budget_quantum", 16384)
        self.value = _round_budget(config.max_patches, self.quantum)

    def update(self, observed_max: int) -> bool:
        """Returns True if the budget changed (recompile needed)."""
        if not self.config.adaptive_budget:
            return False
        want = _round_budget(
            int(observed_max * self.config.budget_headroom), self.quantum
        )
        if observed_max > 0.9 * self.value or want < 0.5 * self.value:
            if want != self.value:
                self.value = want
                return True
        return False

    def predict(self, observed_max: int):
        """The bucket a near-future update() would land on, once the
        observed count is within ~70% of the current budget — computed with
        update()'s own formula so the prefetch can't compile a rung the
        switch then skips (e.g. observed 6q * 1.5 headroom lands on 12q, not
        the adjacent 8q). Used to pre-compile ahead of the switch."""
        if not self.config.adaptive_budget:
            return None
        if observed_max <= 0.7 * self.value:
            return None
        want = _round_budget(
            int(observed_max * self.config.budget_headroom), self.quantum
        )
        if want == self.value:
            # adjacent rung fallback
            want = _round_budget(self.value + 1, self.quantum)
        return want


def _round_budget(n, quantum=16384):
    """Smallest budget rung >= n. Rungs form a geometric ladder: quantum *
    {1,2,3,4,6} then {8..15}*2^j (~x1.125 steps; every rung a multiple of
    the scan kernel's 16384-lane block — non-multiples silently fall back
    to the slow XLA cumsum, scan.py:56). The fine upper steps exist because
    the r4 on-chip budget A/B measured ~5% end-to-end between adjacent
    coarse rungs (589824 = 14.85 vs 655360+ = 13.6 Mpix/s at 549k true
    patches): budget alignment is worth more than the extra recompiles,
    which the StepCache prefetch hides off the training path anyway."""
    n = max(n, quantum)
    r = 1
    while r * quantum < n:
        if r < 4:
            r += 1
        elif r < 8:
            r += 2
        else:
            # next rung in {8..15} * 2^j: bump the top-4-bit mantissa
            j = r.bit_length() - 4  # r >= 8 so j >= 0
            r = ((r >> j) + 1) << j
    return r * quantum


class StepCache:
    """Per-budget train steps with background pre-compilation.

    A budget change used to stall training for a full recompile of the step
    (2-3 min over tunneled backends). Instead: (a) steps are cached per
    budget, so revisiting a size is free; (b) `prefetch` warms the next
    bucket's jit cache in a daemon thread by running ONE step with the live
    state (the extra ~50 ms device step is noise next to the minutes of
    compile it hides) while the main loop keeps training on the current
    budget. By the time PatchBudget switches, the step is already compiled.
    """

    def __init__(self, make_fn):
        self.make_fn = make_fn
        self.steps = {}
        self._warm = set()  # budgets whose compile has been triggered
        self._thread = None

    def get(self, budget):
        if budget not in self.steps:
            self.steps[budget] = self.make_fn(budget)
        self._warm.add(budget)  # the caller is about to run it
        return self.steps[budget]

    def prefetch(self, budget, example_args, log_fn=None):
        import threading

        if budget is None or budget in self._warm:
            return
        if self._thread is not None and self._thread.is_alive():
            return  # one background compile at a time
        step = self.get(budget)

        def run():
            try:
                jax.block_until_ready(step(*example_args))
                if log_fn:
                    log_fn(f"pre-compiled patch budget {budget}")
            except Exception as e:  # pragma: no cover - diagnostics only
                if log_fn:
                    log_fn(f"budget {budget} pre-compile failed: {e}")

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()


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
    steps = StepCache(
        lambda b: make_train_step(config, scene_size, max_steps, max_patches=b)
    )
    train_step = steps.get(budget.value)

    if adam_state is None:
        adam_state = adam_init(pool.params())
    if stats is None:
        stats = density_stats_init(pool.capacity)
    gt_images = [jnp.asarray(g, jnp.float32) for g in gt_images]
    # device-resident cameras: a Camera pytree passed as a host structure
    # re-transfers its ~10 scalars every step — each a round-trip over a
    # tunneled backend. One device_put up front makes the step's camera args
    # zero-copy.
    cameras = [jax.device_put(c) for c in cameras]

    history = {"loss": [], "psnr": [], "n_alive": [], "epoch_time": [],
               "overflow_steps": []}
    overflow_warned = False
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        order = rng.permutation(n)
        losses = []
        patch_peak = []
        drops = []
        # host-vs-device attribution (VERDICT r4 #6): one fully-synced step
        # gives the device-side step time; the enqueue loop's wall minus
        # n * t_device is host-added overhead (dispatch, arg handling,
        # mid-epoch sync reads)
        t_dev0 = time.time()
        pool, adam_state, stats, loss0, binfo0 = train_step(
            pool, adam_state, stats, cameras[order[0]], gt_images[order[0]]
        )
        jax.block_until_ready(loss0)
        t_step_device = time.time() - t_dev0
        losses.append(loss0)
        patch_peak.append(binfo0["obs"])
        drops.append(binfo0["dropped"])
        for j, i in enumerate(order[1:]):
            pool, adam_state, stats, loss, binfo = train_step(
                pool, adam_state, stats, cameras[i], gt_images[i]
            )
            losses.append(loss)
            patch_peak.append(binfo["obs"])
            drops.append(binfo["dropped"])
            # mid-epoch overflow reaction: a densification spike past the
            # patch/row budget must not silently drop the deepest patches
            # for a whole epoch (the reference reads the exact patch count
            # every step, gausplat.cu:67). The host read every 16 steps only
            # waits on already-finished device work.
            # j counts from the SECOND step (the first ran synced above):
            # global step index = j + 2
            if config.adaptive_budget and (j + 2) % 16 == 0:
                recent = int(jnp.max(jnp.stack(drops[-16:])))
                if recent > 0:
                    if not overflow_warned:
                        overflow_warned = True
                        log_fn(
                            f"[epoch {epoch + 1}] WARNING: patch budget "
                            f"overflow — {recent} patches/rows dropped in a "
                            f"step (budget {budget.value}); growing budget"
                        )
                    if budget.update(int(jnp.max(jnp.stack(patch_peak)))):
                        log_fn(
                            f"[epoch {epoch + 1}] patch budget -> "
                            f"{budget.value} (mid-epoch overflow)"
                        )
                        train_step = steps.get(budget.value)
        # drain: everything still in flight on the device finishes here —
        # the steps phase [t0, t_drain] splits into n * t_step_device of
        # device work plus host-added overhead
        avg_loss = float(jnp.mean(jnp.stack(losses)))
        t_drain = time.time()
        history.setdefault("t_steps_wall", []).append(t_drain - t0)
        history.setdefault("t_step_device", []).append(t_step_device)
        history["loss"].append(avg_loss)
        history["epoch_time"].append(time.time() - t0)
        history["overflow_steps"].append(
            int(jnp.sum(jnp.stack(drops) > 0))
        )
        peak = int(jnp.max(jnp.stack(patch_peak)))
        if budget.update(peak):
            log_fn(f"[epoch {epoch + 1}] patch budget -> {budget.value}")
            train_step = steps.get(budget.value)
        else:
            # growth headed for the next bucket: compile it in the background
            # now so the eventual switch costs nothing (VERDICT r1 item 9)
            steps.prefetch(
                budget.predict(peak),
                (pool, adam_state, stats, cameras[order[0]], gt_images[order[0]]),
                log_fn=log_fn,
            )

        e = epoch + 1
        t_dfy = time.time()
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
        history.setdefault("t_densify", []).append(time.time() - t_dfy)
        if e % config.reset_alpha_every_epochs == 0 and e < config.epochs:
            # never end training on a reset: the final model would carry the
            # clamped opacities (the reference resets unconditionally,
            # train.py:75-77, and suffers exactly this when epochs % 15 == 0)
            pool, adam_state = reset_alpha(pool, adam_state, config)
            log_fn(f"[epoch {e}] alpha reset")

        history["n_alive"].append(int(pool.n_alive()))
        # budget-ladder trace: one entry per epoch (the full-regime scene
        # proxy records ladder switches against the PSNR/wall curve)
        history.setdefault("budget", []).append(int(budget.value))
        if e % eval_every == 0 or e == config.epochs:
            img, _ = render_pool_image(pool, cameras[0], config, need_grads=False)
            p = float(psnr(jnp.clip(img, 0, 1), jnp.clip(gt_images[0], 0, 1)))
            history["psnr"].append((e, p))
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} psnr={p:.2f} alive={history['n_alive'][-1]}")
        else:
            log_fn(f"[epoch {e}] loss={avg_loss:.5f} alive={history['n_alive'][-1]}")
        if epoch_cb is not None:
            call_epoch_cb(epoch_cb, e, pool, adam_state, stats, key, history)
    return pool, history


def call_epoch_cb(cb, e, pool, adam_state, stats, key, history):
    """Invoke an epoch callback; pass `history` only to callbacks that
    accept it (e.g. viewer.monitor.TrainingMonitor) so the original
    5-argument callback signature keeps working."""
    import inspect

    try:
        params = inspect.signature(cb).parameters
        wants_history = "history" in params or any(
            p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
    except (TypeError, ValueError):
        wants_history = False
    if wants_history:
        cb(e, pool, adam_state, stats, key, history=history)
    else:
        cb(e, pool, adam_state, stats, key)
