"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The key contract (SURVEY.md §4 implication (d)): the sharded batched train
step produces the same parameters as the equivalent single-device batched
step — sharding must be a pure layout change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
from easygaussiansplatting_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_pool,
    stack_cameras,
)
from easygaussiansplatting_tpu.parallel.train import shard_batch
from easygaussiansplatting_tpu.train.config import TrainConfig
from easygaussiansplatting_tpu.train.density import density_stats_init
from easygaussiansplatting_tpu.train.optimizer import adam_init

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)

# The flagship backend: these tests are the multi-device evidence for the
# Pallas path (interpret mode on CPU; the same shard_map boundary compiles
# to the Mosaic kernels on TPU).
CONFIG = TrainConfig(backend="pallas", tile=16, max_patches=2**12, k_chunk=128)
CONFIG_TILED = TrainConfig(backend="tiled", tile=16, max_patches=2**12, k_chunk=32, n_chunks=8)


def _setup(b, cap_round):
    scene = make_synthetic_scene(seed=3, n_gaussians=48, n_cams=max(b, 2), width=32, height=32)
    cap = ((64 + cap_round - 1) // cap_round) * cap_round
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"], scene["shs"],
        capacity=cap,
    )
    gts = render_gt_images(scene, CONFIG)
    cams = scene["cameras"][:b]
    bcam = stack_cameras(cams)
    gt = jnp.stack(gts[:b])
    return scene, pool, bcam, gt


def _run(mesh, pool, bcam, gt, scene_size, n_steps=2):
    step = make_sharded_train_step(mesh, CONFIG, scene_size, max_steps=50)
    adam_state = adam_init(pool.params())
    stats = density_stats_init(pool.capacity)
    if mesh is not None:
        pool, adam_state, stats = shard_pool(mesh, pool, adam_state, stats)
        bcam = shard_batch(mesh, bcam)
        gt = shard_batch(mesh, gt)
    losses = []
    for _ in range(n_steps):
        pool, adam_state, stats, loss = step(pool, adam_state, stats, bcam, gt)
        losses.append(float(loss))
    return pool, stats, losses


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["gs"] == 8
    assert make_mesh(8, data=1).shape["gs"] == 8
    assert make_mesh(4).shape == {"data": 2, "gs": 2}


def test_sharded_matches_single_device():
    mesh8 = make_mesh(8)          # (2, 4)
    mesh1 = make_mesh(1)          # single device
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)

    pool_s, stats_s, losses_s = _run(mesh8, pool, bcam, gt, scene["scene_size"])
    pool_1, stats_1, losses_1 = _run(mesh1, pool, bcam, gt, scene["scene_size"])

    np.testing.assert_allclose(losses_s, losses_1, rtol=0, atol=2e-5)
    for k, v in pool_s.params().items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(pool_1.params()[k]), atol=3e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(stats_s.grad_accum), np.asarray(stats_1.grad_accum), atol=1e-6
    )
    assert (np.asarray(stats_s.cunt) == np.asarray(stats_1.cunt)).all()


def test_pure_data_parallel_loss_decreases():
    mesh = make_mesh(8, data=8)
    scene, _, bcam, gt = _setup(b=8, cap_round=1)
    rng = np.random.default_rng(0)
    pool = pool_from_arrays(  # perturbed init so there is signal to recover
        scene["pws"] + rng.normal(scale=0.05, size=scene["pws"].shape),
        scene["rots"], scene["scales"] * 1.5, np.clip(scene["alphas"] * 0.7, 0.01, 0.99),
        scene["shs"] * 0.5, capacity=64,
    )
    _, _, losses = _run(mesh, pool, bcam, gt, scene["scene_size"], n_steps=6)
    assert losses[-1] < losses[0]


def test_gs_sharded_render_matches():
    from easygaussiansplatting_tpu.parallel.train import make_sharded_render

    mesh = make_mesh(8, data=1)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    render_fn = make_sharded_render(mesh, CONFIG)
    img_single = render_fn(pool, scene["cameras"][0])
    pool_s = shard_pool(mesh, pool)
    img_shard = render_fn(pool_s, scene["cameras"][0])
    np.testing.assert_allclose(
        np.asarray(img_shard), np.asarray(img_single), atol=2e-6
    )


def test_tile_sharded_render_matches_replicated():
    """Stage-6 tile-row-band sharding (SURVEY §2.9 "image tiles sharded for
    stage 6"): the banded render must equal the fully-replicated render
    bit-for-bit-ish on the 8-device mesh, with zero band-budget drops."""
    from easygaussiansplatting_tpu.parallel.train import make_sharded_render

    mesh = make_mesh(8)  # (2, 4) — bands flatten both axes
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    pool_s = shard_pool(mesh, pool)
    cam = scene["cameras"][0]

    img_rep = make_sharded_render(mesh, CONFIG, tile_sharded=False)(pool_s, cam)
    img_band, aux = make_sharded_render(mesh, CONFIG, tile_sharded=True,
                                        with_aux=True)(pool_s, cam)
    assert int(aux["n_dropped"]) == 0
    assert img_band.shape == img_rep.shape
    np.testing.assert_allclose(
        np.asarray(img_band), np.asarray(img_rep), atol=2e-6
    )


def test_tile_sharded_render_tall_image():
    """Band split with gy not divisible by n_devices (35-ish strips / 8
    devices) and the last band mostly padding."""
    import dataclasses

    from easygaussiansplatting_tpu.parallel.train import make_sharded_render

    cfg = dataclasses.replace(CONFIG, max_patches=2**13)
    scene = make_synthetic_scene(seed=11, n_gaussians=256, n_cams=1,
                                 width=48, height=112)  # gy = 7 strips
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
        scene["shs"], capacity=256,
    )
    mesh = make_mesh(8)
    pool_s = shard_pool(mesh, pool)
    cam = scene["cameras"][0]
    img_rep = make_sharded_render(mesh, cfg, tile_sharded=False)(pool_s, cam)
    img_band, aux = make_sharded_render(mesh, cfg, tile_sharded=True,
                                        with_aux=True)(pool_s, cam)
    assert int(aux["n_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(img_band), np.asarray(img_rep), atol=2e-6
    )


def test_banded_train_step_matches_single():
    """make_banded_train_step (one camera over ALL devices via tile-row
    bands, halo'd exact L1+SSIM decomposition) must reproduce the plain
    batched step at B=1: loss, parameters, densify stats."""
    import dataclasses

    from easygaussiansplatting_tpu.parallel.train import make_banded_train_step

    cfg = dataclasses.replace(CONFIG, max_patches=2**13)
    scene = make_synthetic_scene(seed=13, n_gaussians=192, n_cams=2,
                                 width=48, height=112)  # gy = 7 strips / 8 dev
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
        scene["shs"], capacity=192,
    )
    gts = render_gt_images(scene, cfg)
    cam, gt = scene["cameras"][0], jnp.asarray(gts[0])

    # reference: the batched step at B=1 on a single device
    mesh1 = make_mesh(1)
    step1 = make_sharded_train_step(mesh1, cfg, scene["scene_size"], max_steps=50)
    adam1 = adam_init(pool.params())
    stats1 = density_stats_init(pool.capacity)
    bcam = stack_cameras([cam])
    p1, a1, s1, loss1 = step1(pool, adam1, stats1, bcam, gt[None])

    mesh8 = make_mesh(8)
    stepb = make_banded_train_step(mesh8, cfg, scene["scene_size"], max_steps=50)
    pool8, adam8, stats8 = shard_pool(mesh8, pool, adam_init(pool.params()),
                                      density_stats_init(pool.capacity))
    pb, ab, sb, lossb = stepb(pool8, adam8, stats8, cam, gt)

    np.testing.assert_allclose(float(lossb), float(loss1), rtol=0, atol=2e-5)
    for k, v in pb.params().items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(p1.params()[k]), atol=5e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(sb.grad_accum), np.asarray(s1.grad_accum), atol=1e-5
    )
    assert (np.asarray(sb.cunt) == np.asarray(s1.cunt)).all()


def test_collective_accounting_tile_sharded_render():
    """The banded render's only collectives: per-attribute all-gathers over
    gs (each band owner needs the full attribute table) and the tiny
    n_dropped psum. No gather may ride the data axis, and nothing else
    (permute / all-to-all / reduce-scatter) may appear."""
    from easygaussiansplatting_tpu.parallel.train import make_sharded_render

    mesh = make_mesh(8)  # (data 2, gs 4)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    pool_s = shard_pool(mesh, pool)
    cam = scene["cameras"][0]
    fn = make_sharded_render(mesh, CONFIG, tile_sharded=True, with_aux=True)
    txt = fn.lower(pool_s, cam).compile().as_text()
    acc = _collective_accounting(txt, gs_size=4, data_size=2)
    assert acc, "no collectives found — parser or partitioning broke"
    bad = [a for a in acc if a[0] not in
           ("all-gather", "all-reduce", "collective-permute")]
    assert not bad, f"unexpected collective kinds: {bad}"
    cap = 64
    gather_gs = sum(n for op, ax, n in acc if op == "all-gather" and ax == "gs")
    # us[2] cinv2ds[3] alphas[1] colors[3] depths[1] areas[2] f32 + valid pred
    assert gather_gs == cap * (12 * 4 + 1), acc
    # image assembly: each device's band travels to the replicated [3,H,W]
    # output — permute traffic is bounded by one full image per device pair
    w, h = 32, 32
    permute = sum(n for op, ax, n in acc if op == "collective-permute")
    assert permute <= 8 * 3 * w * h * 4, acc
    gather_img = sum(n for op, ax, n in acc if op == "all-gather" and ax != "gs")
    assert gather_img <= 8 * 3 * w * h * 4, acc
    # the n_dropped psum spans the whole flattened mesh (size 8 = neither
    # axis alone); nothing bigger than one int32 may ride it
    other_reduce = [n for op, ax, n in acc if op == "all-reduce"
                    and ax not in ("gs", "data")]
    assert sum(other_reduce) <= 8, acc


def test_pallas_vs_tiled_backend_sharded():
    """The two backends agree under the same mesh (pallas rides shard_map,
    tiled rides plain GSPMD — same numbers either way)."""
    mesh = make_mesh(8)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    import dataclasses

    step_p = make_sharded_train_step(mesh, CONFIG, scene["scene_size"], max_steps=50)
    step_t = make_sharded_train_step(mesh, CONFIG_TILED, scene["scene_size"], max_steps=50)
    adam = adam_init(pool.params())
    stats = density_stats_init(pool.capacity)
    pool_s, adam_s, stats_s = shard_pool(mesh, pool, adam, stats)
    bcam_s, gt_s = shard_batch(mesh, bcam), shard_batch(mesh, gt)
    _, _, _, loss_p = step_p(pool_s, adam_s, stats_s, bcam_s, gt_s)
    _, _, _, loss_t = step_t(pool_s, adam_s, stats_s, bcam_s, gt_s)
    np.testing.assert_allclose(float(loss_p), float(loss_t), atol=1e-5)


@pytest.mark.slow
def test_pallas_sharded_vs_single_realistic():
    """Sharded-vs-single parity for the Pallas backend at a size where tiles
    and chunks genuinely span the patch budget (4k gaussians, 121 tiles)."""
    import dataclasses

    from easygaussiansplatting_tpu.parallel.train import make_sharded_render

    # 2**16: the scene's true patch count exceeds 2**15 — at the old budget
    # BOTH renders silently dropped the deepest patches identically, and the
    # banded render (which does NOT overflow its per-band budgets) exposed
    # the truncation by rendering the TRUE image (r5)
    cfg = dataclasses.replace(CONFIG, max_patches=2**16)
    scene = make_synthetic_scene(
        seed=7, n_gaussians=4096, n_cams=2, width=176, height=176
    )
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"], scene["shs"],
        capacity=4096,
    )
    img_1, aux_1 = make_sharded_render(make_mesh(1), cfg, with_aux=True)(
        pool, scene["cameras"][0])
    assert int(aux_1["n_dropped"]) == 0  # the comparison demands a
    # drop-free budget: truncated operands can "agree" while both wrong
    mesh8 = make_mesh(8)  # (2, 4)
    pool8 = shard_pool(mesh8, pool)
    # the replicated raster: pure GSPMD-parity of the gs-sharded stages
    img_8 = make_sharded_render(mesh8, cfg, tile_sharded=False)(
        pool8, scene["cameras"][0])
    assert np.isfinite(np.asarray(img_8)).all()
    np.testing.assert_allclose(np.asarray(img_8), np.asarray(img_1), atol=2e-6)
    # the banded default at this patch-dense scene: parity incl. drops=0
    img_b, aux = make_sharded_render(mesh8, cfg, tile_sharded=True,
                                     with_aux=True)(pool8, scene["cameras"][0])
    assert int(aux["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_1), atol=2e-6)


def test_train_sharded_epoch_driver():
    """Full sharded epoch driver: bucketing, densify + re-shard, callbacks."""
    import dataclasses

    from easygaussiansplatting_tpu.parallel.loop import train_sharded

    mesh = make_mesh(8)  # (2, 4)
    scene = make_synthetic_scene(seed=9, n_gaussians=48, n_cams=4, width=32, height=32)
    rng = np.random.default_rng(1)
    pool = pool_from_arrays(
        scene["pws"] + rng.normal(scale=0.05, size=scene["pws"].shape),
        scene["rots"], scene["scales"], scene["alphas"], scene["shs"] * 0.5,
        capacity=96,  # divisible by gs=4
    )
    gts = render_gt_images(scene, CONFIG)
    cfg = dataclasses.replace(
        CONFIG, epochs=4, densify_every_epochs=2, reset_alpha_every_epochs=3,
        adaptive_budget=False,
    )
    seen = []
    pool2, history = train_sharded(
        pool, scene["cameras"], gts, cfg, scene["scene_size"], mesh,
        batch=2, log_fn=lambda m: None,
        epoch_cb=lambda e, p, a, s, k: seen.append(e),
    )
    assert seen == [1, 2, 3, 4]
    assert len(history["loss"]) == 4
    assert np.isfinite(history["loss"]).all()
    assert int(pool2.n_alive()) >= 48  # densify only grows on this scene


def test_train_sharded_banded_driver():
    """train_sharded(banded=True): the full epoch driver (densify,
    alpha-reset, eval) over the banded single-camera step."""
    import dataclasses

    from easygaussiansplatting_tpu.parallel.loop import train_sharded

    mesh = make_mesh(8)
    scene = make_synthetic_scene(seed=9, n_gaussians=48, n_cams=3, width=32, height=32)
    rng = np.random.default_rng(1)
    pool = pool_from_arrays(
        scene["pws"] + rng.normal(scale=0.05, size=scene["pws"].shape),
        scene["rots"], scene["scales"], scene["alphas"], scene["shs"] * 0.5,
        capacity=96,
    )
    gts = render_gt_images(scene, CONFIG)
    cfg = dataclasses.replace(
        CONFIG, epochs=3, densify_every_epochs=2, reset_alpha_every_epochs=5,
        adaptive_budget=False,
    )
    pool2, history = train_sharded(
        pool, scene["cameras"], gts, cfg, scene["scene_size"], mesh,
        banded=True, log_fn=lambda m: None,
    )
    assert len(history["loss"]) == 3
    assert np.isfinite(history["loss"]).all()
    # densify at epoch 2 can transiently raise the loss (fresh clones);
    # learning signal: the pre-densify epoch improves on epoch 1 (the
    # banded-vs-batched equivalence itself is the parity test above)
    assert history["loss"][1] < history["loss"][0]
    assert int(pool2.n_alive()) >= 48


def _collective_accounting(txt, gs_size, data_size):
    """Parse (op, axis-group-size, bytes) for every collective in HLO text.

    Byte counts are fusion-invariant: XLA may merge or split the per-array
    all-gathers between versions, but the total gathered/reduced volume only
    changes if the *partitioning* changes — which is exactly the regression
    this accounts for (timing the virtual mesh cannot: host time-sharing
    noise swamps a 15% collective regression, BASELINE.md)."""
    import re

    dt = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "s64": 8, "u64": 8,
          "pred": 1, "bf16": 2, "s8": 1, "u8": 1}
    line_re = re.compile(
        r"= (.*?) (all-gather|all-reduce|reduce-scatter|collective-permute"
        r"|all-to-all)\(")
    shape_re = re.compile(
        r"(f32|f64|s32|u32|s64|u64|pred|bf16|s8|u8)\[([0-9,]*)\]")
    iota_re = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")
    expl_re = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
    out = []
    for line in txt.splitlines():
        m = line_re.search(line)
        if not m:
            continue
        nbytes = 0
        for d, dims in shape_re.findall(m.group(1)):
            n = 1
            for x in dims.split(","):
                if x:
                    n *= int(x)
            nbytes += dt[d] * n
        mi = iota_re.search(line)
        me = expl_re.search(line)
        gsz = (int(mi.group(2)) if mi
               else len(me.group(1).split(",")) if me else -1)
        axis = {gs_size: "gs", data_size: "data"}.get(gsz, f"size{gsz}")
        out.append((m.group(2), axis, nbytes))
    return out


def test_collective_accounting_sharded_step():
    """Deterministic partitioning guard: the compiled sharded step must
    contain exactly the expected collectives — per-gaussian attribute
    all-gathers over gs, the attribute-cotangent psum over gs, parameter/
    stats psums over data — and nothing else (no collective-permute,
    all-to-all, or reduce-scatter; no collective spanning the full mesh).
    Catches a partitioning regression (e.g. replicated params turning the
    gradient psum into a capacity-sized all-reduce) without timing at all."""
    mesh = make_mesh(8)  # (data 2, gs 4)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    step = make_sharded_train_step(mesh, CONFIG, scene["scene_size"], max_steps=50)
    adam_state = adam_init(pool.params())
    stats = density_stats_init(pool.capacity)
    pool, adam_state, stats = shard_pool(mesh, pool, adam_state, stats)
    bcam_s, gt_s = shard_batch(mesh, bcam), shard_batch(mesh, gt)
    txt = step.lower(pool, adam_state, stats, bcam_s, gt_s).compile().as_text()

    acc = _collective_accounting(txt, gs_size=4, data_size=2)
    assert acc, "no collectives found — parser or partitioning broke"
    bad = [a for a in acc if a[0] not in ("all-gather", "all-reduce")]
    assert not bad, f"unexpected collective kinds: {bad}"
    unclassified = [a for a in acc if a[1] not in ("gs", "data")]
    assert not unclassified, f"collectives on unexpected groups: {unclassified}"

    cap, b_local = 64, 1  # capacity; per-data-shard batch (B=2 over data=2)
    # 1) attribute all-gathers over gs: us[2] cinv2ds[3] alphas[1] colors[3]
    #    depths[1] areas[2] (f32) + valid (pred) per local camera
    gather_gs = sum(n for op, ax, n in acc if op == "all-gather" and ax == "gs")
    assert gather_gs == b_local * cap * (12 * 4 + 1), acc
    # no all-gather may ride the data axis (images/losses stay data-local)
    assert not any(op == "all-gather" and ax == "data" for op, ax, n in acc), acc
    # 2) attribute-cotangent psum over gs: d_us[2] d_cinv2ds[3] d_colors[3]
    #    d_alphas[1] f32 rows (shard_map transpose of the replicated-over-gs
    #    raster inputs)
    reduce_gs = sum(n for op, ax, n in acc if op == "all-reduce" and ax == "gs")
    assert reduce_gs == b_local * cap * 9 * 4, acc
    # 3) gradient/stats psum over data: at least the parameter-shard grads
    #    (pws 3 + shs 48 + alphas 1 + scales 3 + rots 4 = 59 f32/gaussian on
    #    a 16-row shard) + the [cap,2] screen-grad accumulator; bounded above
    #    to catch accidental replication (full-capacity grads would be 4x)
    reduce_data = sum(n for op, ax, n in acc if op == "all-reduce" and ax == "data")
    floor = 16 * 59 * 4 + cap * 2 * 4
    assert floor <= reduce_data <= 2 * floor, (reduce_data, floor, acc)


@pytest.mark.slow
def test_collective_bytes_at_densified_scale():
    """All-gather byte accounting at growing pool capacities (VERDICT r4 #7):
    the per-step gather over gs is the attribute table every raster device
    needs — 49 B/slot/camera on the stages path (12 f32 + 1 pred). This
    compiles (never runs) the sharded step at 100k/300k/1M capacities and
    asserts the gathered volume follows that formula, so the §2.9 design
    choice (gather compacted *visible* gaussians vs the full pool) can be
    made on data: at 1M slots the gather is ~49 MB/camera/step ≈ 1.1 ms over
    one v5e ICI link (~45 GB/s) vs the ~35 ms measured step — the full-pool
    gather only approaches dominance around ~30M slots, far past the
    reference recipe's scale."""
    mesh = make_mesh(8)  # (data 2, gs 4)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)
    step = make_sharded_train_step(mesh, CONFIG, scene["scene_size"], max_steps=50)
    adam_state = adam_init(pool.params())
    stats = density_stats_init(pool.capacity)
    bcam_s, gt_s = shard_batch(mesh, bcam), shard_batch(mesh, gt)

    from easygaussiansplatting_tpu.train.density import density_stats_init as dsi

    b_local = 1  # B=2 over data=2
    for cap in (100_000, 300_000, 1_000_000):
        cap8 = -(-cap // 8) * 8
        big = pool_from_arrays(
            scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
            scene["shs"], capacity=cap8,
        )
        big_adam = adam_init(big.params())
        big_stats = dsi(big.capacity)
        pool_s, adam_s, stats_s = shard_pool(mesh, big, big_adam, big_stats)
        txt = step.lower(pool_s, adam_s, stats_s, bcam_s, gt_s).compile().as_text()
        acc = _collective_accounting(txt, gs_size=4, data_size=2)
        gather_gs = sum(n for op, ax, n in acc if op == "all-gather" and ax == "gs")
        expect = b_local * cap8 * (12 * 4 + 1)
        assert gather_gs == expect, (cap8, gather_gs, expect, acc)
        print(f"cap={cap8}: all-gather(gs) {gather_gs/1e6:.1f} MB/step "
              f"(~{gather_gs/45e9*1e3:.2f} ms over one v5e ICI link)")


def test_sharded_fused_preprocess_matches_stages(monkeypatch):
    """EGS_FUSED_PRE=1 on the sharded step (fused Pallas preprocess under
    shard_map over the full (data, gs) mesh) reproduces the default
    GSPMD-stages path: losses, parameters, and densify stats."""
    mesh = make_mesh(8)  # (2, 4)
    scene, pool, bcam, gt = _setup(b=2, cap_round=8)

    # explicit 0, not delenv: unset defaults to ON on a TPU backend
    monkeypatch.setenv("EGS_FUSED_PRE", "0")
    pool_0, stats_0, losses_0 = _run(mesh, pool, bcam, gt, scene["scene_size"])
    monkeypatch.setenv("EGS_FUSED_PRE", "1")
    pool_f, stats_f, losses_f = _run(mesh, pool, bcam, gt, scene["scene_size"])

    np.testing.assert_allclose(losses_f, losses_0, rtol=0, atol=2e-5)
    for k, v in pool_f.params().items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(pool_0.params()[k]), atol=5e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(stats_f.grad_accum), np.asarray(stats_0.grad_accum), atol=1e-5
    )
    assert (np.asarray(stats_f.cunt) == np.asarray(stats_0.cunt)).all()
