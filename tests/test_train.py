"""Training layer: Adam parity with torch, densify/prune semantics, and a
tiny end-to-end training run that must improve PSNR."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.models.gaussians import GaussianPool, pool_from_arrays
from easygaussiansplatting_tpu.train import (
    TrainConfig,
    adam_init,
    adam_update,
    densify_and_prune,
    density_stats_init,
    reset_alpha,
    train,
)
from easygaussiansplatting_tpu.train.density import DensityStats
from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
from easygaussiansplatting_tpu.utils.activations import get_alphas_raw, get_scales_raw
from easygaussiansplatting_tpu.utils.image import psnr


def test_adam_matches_torch(rng):
    """Our masked Adam == torch.optim.Adam (the reference optimizer) on a
    quadratic, eps=1e-15 outside the sqrt."""
    import torch

    x0 = rng.normal(size=(5, 3)).astype(np.float32)
    target = rng.normal(size=(5, 3)).astype(np.float32)

    xt = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.Adam([xt], lr=0.05, eps=1e-15)
    xj = {"pws": jnp.asarray(x0)}
    state = adam_init(xj)
    lr_fns = {"pws": lambda step: 0.05}

    for _ in range(10):
        opt.zero_grad()
        loss = ((xt - torch.tensor(target)) ** 2).sum()
        loss.backward()
        opt.step()

        g = {"pws": 2.0 * (xj["pws"] - jnp.asarray(target))}
        xj, state = adam_update(g, state, xj, lr_fns)

    tol = 1e-4 if jax.default_backend() == "tpu" else 1e-5  # TPU fp32 rsqrt drift
    np.testing.assert_allclose(np.asarray(xj["pws"]), xt.detach().numpy(), atol=tol)


def _make_pool(n=8, cap=16, rng=None):
    rng = rng or np.random.default_rng(0)
    return pool_from_arrays(
        pws=rng.normal(size=(n, 3)),
        rots=np.tile([1.0, 0, 0, 0], (n, 1)),
        scales=np.full((n, 3), 0.05),
        alphas=np.full(n, 0.9),
        shs=rng.normal(size=(n, 3)),
        capacity=cap,
    )


def test_prune_low_alpha():
    pool = _make_pool()
    pool.alphas_raw = pool.alphas_raw.at[2].set(get_alphas_raw(0.001))  # below 0.005
    state = adam_init(pool.params())
    state.mu["pws"] = state.mu["pws"] + 1.0  # nonzero state everywhere
    stats = density_stats_init(pool.capacity)
    cfg = TrainConfig()
    new_pool, new_state, _, report = densify_and_prune(
        pool, state, stats, jax.random.PRNGKey(0), 1.0, cfg
    )
    assert int(report["n_pruned"]) == 1
    assert not bool(new_pool.alive[2])
    # pruned row's adam state zeroed
    assert float(jnp.abs(new_state.mu["pws"][2]).sum()) == 0.0
    assert float(jnp.abs(new_state.mu["pws"][3]).sum()) > 0.0


def test_clone_and_split_fill_free_slots():
    pool = _make_pool(n=8, cap=16)
    state = adam_init(pool.params())
    cfg = TrainConfig()
    scene_size = 1.0
    # gaussian 0: high grad + small scale -> clone; gaussian 1: high grad +
    # big scale (but below prune threshold 0.1) -> split
    pool.scales_raw = pool.scales_raw.at[1].set(get_scales_raw(0.05))
    pool.scales_raw = pool.scales_raw.at[0].set(get_scales_raw(0.005))
    stats = DensityStats(
        grad_accum=jnp.zeros(16).at[0].set(1.0).at[1].set(1.0),
        cunt=jnp.ones(16, jnp.int32),
    )
    new_pool, _, _, report = densify_and_prune(
        pool, state, stats, jax.random.PRNGKey(1), scene_size, cfg
    )
    assert int(report["n_cloned"]) == 1
    assert int(report["n_split"]) == 1
    assert int(report["n_alive"]) == 10
    # clone of gaussian 0 is an exact copy in a free slot
    new_idx = np.where(np.asarray(new_pool.alive)[8:])[0] + 8
    assert len(new_idx) == 2
    vals = np.asarray(new_pool.pws)[new_idx]
    assert np.allclose(vals[0], np.asarray(pool.pws)[0])  # clone copies pws
    # split entry has 0.6x scales
    split_scales = np.exp(np.asarray(new_pool.scales_raw)[new_idx[1]])
    np.testing.assert_allclose(split_scales, 0.05 * 0.6, rtol=1e-5)


def test_densify_respects_capacity():
    pool = _make_pool(n=8, cap=9)  # only one free slot
    state = adam_init(pool.params())
    stats = DensityStats(grad_accum=jnp.ones(9), cunt=jnp.ones(9, jnp.int32))
    cfg = TrainConfig()
    new_pool, _, _, report = densify_and_prune(
        pool, state, stats, jax.random.PRNGKey(2), 1.0, cfg
    )
    assert int(report["n_alive"]) == 9
    assert int(report["n_dropped"]) == int(report["n_cloned"]) + int(report["n_split"]) - 1


def test_reset_alpha():
    pool = _make_pool()
    state = adam_init(pool.params())
    state.mu["alphas_raw"] = state.mu["alphas_raw"] + 3.0
    cfg = TrainConfig()
    new_pool, new_state = reset_alpha(pool, state, cfg)
    from easygaussiansplatting_tpu.utils.activations import get_alphas

    a = np.asarray(get_alphas(new_pool.alphas_raw))[np.asarray(new_pool.alive)]
    assert np.all(a <= 0.01 + 1e-6)
    assert float(jnp.abs(new_state.mu["alphas_raw"]).sum()) == 0.0


@pytest.mark.slow
def test_end_to_end_training_improves_psnr():
    """A 3-epoch run on a tiny synthetic scene must reduce loss and raise
    PSNR — the minimum end-to-end slice (SURVEY.md §7 M1)."""
    cfg = dataclasses.replace(
        TrainConfig(), epochs=3, max_patches=4096, k_chunk=32, n_chunks=4,
        densify_every_epochs=100, reset_alpha_every_epochs=100,
    )
    scene = make_synthetic_scene(seed=3, n_gaussians=48, n_cams=4, width=48, height=32)
    gt_images = render_gt_images(scene, cfg)

    rng = np.random.default_rng(5)
    pool = pool_from_arrays(
        pws=scene["pws"] + rng.normal(size=scene["pws"].shape) * 0.05,
        rots=scene["rots"],
        scales=scene["scales"] * 1.3,
        alphas=np.full(len(scene["alphas"]), 0.5),
        shs=scene["shs"] * 0.5,
        capacity=64,
    )

    img0, _ = __import__(
        "easygaussiansplatting_tpu.train.loop", fromlist=["render_pool_image"]
    ).render_pool_image(pool, scene["cameras"][0], cfg)
    psnr0 = float(psnr(jnp.clip(img0, 0, 1), jnp.clip(gt_images[0], 0, 1)))

    pool, hist = train(
        pool, scene["cameras"], gt_images, cfg, scene["scene_size"],
        log_fn=lambda *_: None, eval_every=100,
    )
    assert hist["loss"][-1] < hist["loss"][0]

    from easygaussiansplatting_tpu.train.loop import render_pool_image

    img1, _ = render_pool_image(pool, scene["cameras"][0], cfg)
    psnr1 = float(psnr(jnp.clip(img1, 0, 1), jnp.clip(gt_images[0], 0, 1)))
    assert psnr1 > psnr0 + 0.5, f"psnr {psnr0} -> {psnr1}"


def test_patch_budget_logic():
    import dataclasses

    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.loop import PatchBudget, _round_budget

    cfg = TrainConfig(max_patches=2**18, adaptive_budget=True, budget_headroom=1.5)
    b = PatchBudget(cfg)
    assert b.value == 2**18
    # well under budget but above the shrink threshold: no change
    assert not b.update(200_000)
    # nearly full -> grow to ~1.5x observed, rounded to the scan quantum
    assert b.update(250_000)
    assert b.value == _round_budget(375_000) and b.value % 16384 == 0
    # collapse far below -> shrink
    assert b.update(20_000)
    assert b.value == _round_budget(30_000)
    # adaptive off -> never changes
    cfg2 = dataclasses.replace(cfg, adaptive_budget=False)
    b2 = PatchBudget(cfg2)
    assert not b2.update(10**7)


def test_budget_ladder_and_predict():
    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.loop import PatchBudget, _round_budget

    # geometric rungs: quantum * {1,2,3,4,6} then {8..15}*2^j (~1.125x
    # steps above 8 quanta — the r4 budget A/B measured ~5% end-to-end
    # between adjacent coarse rungs), all scan-quantum multiples
    rungs = [_round_budget(n) for n in (1, 16385, 40_000, 50_000, 375_000)]
    assert rungs == [16384, 32768, 49152, 65536, 393216]
    assert all(r % 16384 == 0 for r in rungs)
    assert _round_budget(2**18) == 2**18  # powers of two are rungs
    # the fine region: 1.05x of the 549k-patch bench scene lands on the
    # measured 589824 rung (36q), not the old coarse ladder's 786432
    assert _round_budget(int(549_000 * 1.05)) == 589_824
    # rung sequence is strictly increasing with bounded ratio
    r = 16384
    for _ in range(30):
        nxt = _round_budget(r + 1)
        assert r < nxt <= 2 * r and nxt % 16384 == 0
        r = nxt

    cfg = TrainConfig(max_patches=2**18, adaptive_budget=True, budget_headroom=1.5)
    b = PatchBudget(cfg)
    # far from full: nothing to prefetch
    assert b.predict(100_000) is None
    # approaching the budget: the prefetch target for an observed count is
    # exactly where update() lands for that same count (no skipped rungs)
    grown = int(0.95 * b.value)
    nxt = b.predict(grown)
    assert nxt == _round_budget(int(grown * 1.5))
    b.update(grown)
    assert b.value == nxt


def test_step_cache_reuse_and_prefetch():
    from easygaussiansplatting_tpu.train.loop import StepCache

    calls = []

    def make(budget):
        calls.append(budget)

        def step(*args):
            import jax.numpy as jnp

            return jnp.float32(budget)

        return step

    cache = StepCache(make)
    s1 = cache.get(100)
    assert cache.get(100) is s1 and calls == [100]  # cached, not rebuilt
    cache.prefetch(200, ())
    cache.wait()
    assert calls == [100, 200]
    s2 = cache.get(200)  # the switch reuses the prefetched step
    assert calls == [100, 200] and s2 is cache.steps[200]
    cache.prefetch(200, ())  # already warm: no new thread/build
    assert calls == [100, 200]
    cache.prefetch(None, ())  # no target: no-op
    assert calls == [100, 200]


def test_backend_auto_resolution():
    """Default config resolves to the production backend for the platform —
    a library user calling train() with defaults must never silently get the
    fallback backend on TPU (VERDICT r2 weak #4)."""
    from easygaussiansplatting_tpu.ops.rasterize import render, resolve_backend

    assert TrainConfig().backend == "auto"
    expect = "pallas" if jax.default_backend() == "tpu" else "tiled"
    assert resolve_backend("auto") == expect
    assert resolve_backend("tiled") == "tiled"

    scene = make_synthetic_scene(seed=1, n_gaussians=16, n_cams=1, width=48, height=32)
    args = (
        jnp.asarray(scene["pws"], jnp.float32),
        jnp.asarray(scene["shs"], jnp.float32),
        jnp.asarray(scene["alphas"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rots"], jnp.float32),
    )
    cam = scene["cameras"][0]
    img_auto, _ = render(*args, cam, backend="auto", max_patches=2048, k_chunk=32)
    img_exp, _ = render(*args, cam, backend=expect, max_patches=2048, k_chunk=32)
    np.testing.assert_array_equal(np.asarray(img_auto), np.asarray(img_exp))


def test_predict_tracks_update_landing_rung():
    """predict() must use update()'s own formula: with 1.5x headroom the
    switch can skip the adjacent rung (ADVICE r2 #5)."""
    from easygaussiansplatting_tpu.train.loop import PatchBudget, _round_budget

    q = 16384
    cfg = TrainConfig(max_patches=6 * q, adaptive_budget=True, budget_headroom=1.5)
    b = PatchBudget(cfg)
    assert b.value == 6 * q
    observed = int(0.95 * 6 * q)
    predicted = b.predict(observed)
    b.update(observed)
    assert b.value == predicted  # update lands exactly on the prefetched rung
    assert predicted == _round_budget(int(observed * 1.5))  # 9q, not 8q
    assert predicted == 9 * q


def test_overflow_warning_and_midepoch_budget_growth():
    """A patch-count spike past the budget must be surfaced (warning +
    history) and the budget must react mid-epoch, not a whole epoch later
    (VERDICT r2 weak #3 / next #3)."""
    cfg = dataclasses.replace(
        TrainConfig(), epochs=1, max_patches=256, budget_quantum=256,
        k_chunk=32, n_chunks=8, backend="tiled", budget_headroom=1.5,
        densify_every_epochs=100, reset_alpha_every_epochs=100,
    )
    # large overlapping blobs on a 3x2-tile image: ~2-3 patches per gaussian
    # after ellipse culling, 160 gaussians -> well past the 256-slot budget
    scene = make_synthetic_scene(seed=2, n_gaussians=160, n_cams=16, width=48, height=32)
    gt_images = render_gt_images(scene)
    pool = pool_from_arrays(
        pws=scene["pws"], rots=scene["rots"], scales=scene["scales"],
        alphas=scene["alphas"], shs=scene["shs"], capacity=160,
    )
    logs = []
    pool, hist = train(
        pool, scene["cameras"], gt_images, cfg, scene["scene_size"],
        log_fn=logs.append, eval_every=100,
    )
    assert hist["overflow_steps"][0] >= 16  # every step overflowed until the fix
    assert any("overflow" in m and "WARNING" in m for m in logs)
    assert any("patch budget ->" in m and "mid-epoch" in m for m in logs)


def test_rows_only_overflow_grows_row_budget():
    """An explicitly set max_rows that overflows (while patches fit) must
    still be surfaced and relieved: the budget observation converts row
    pressure into patch units, and the grown step scales max_rows with
    max_patches (code-review r3: rows-only overflow used to log 'growing
    budget' while growing nothing that mattered)."""
    cfg = dataclasses.replace(
        TrainConfig(), epochs=1, max_patches=4096, budget_quantum=64,
        max_rows=128, k_chunk=32, n_chunks=8, backend="tiled",
        budget_headroom=1.5, densify_every_epochs=100,
        reset_alpha_every_epochs=100,
    )
    scene = make_synthetic_scene(seed=2, n_gaussians=160, n_cams=32,
                                 width=48, height=32)
    gt_images = render_gt_images(scene)
    pool = pool_from_arrays(
        pws=scene["pws"], rots=scene["rots"], scales=scene["scales"],
        alphas=scene["alphas"], shs=scene["shs"], capacity=160,
    )
    logs = []
    pool, hist = train(
        pool, scene["cameras"], gt_images, cfg, scene["scene_size"],
        log_fn=logs.append, eval_every=100,
    )
    assert hist["overflow_steps"][0] > 0
    assert any("overflow" in m and "WARNING" in m for m in logs)
    # the budget DID grow (mid-epoch or at epoch end) off the row pressure
    assert any("patch budget ->" in m for m in logs)
