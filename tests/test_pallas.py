"""Pallas rasteriser (interpret mode on CPU) vs tiled-AD backend and golden.

On real TPU hardware the same kernels compile via Mosaic; set EGS_TEST_TPU=1
to run this file on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops.rasterize import render

KW = dict(max_patches=4096)
PALLAS = dict(backend="pallas", k_chunk=32, **KW)
TILED = dict(backend="tiled", k_chunk=32, n_chunks=8, **KW)


def _scene(rng, n=120):
    pws = rng.normal(size=(n, 3)) * np.array([1.5, 1.0, 1.5])
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2)
    alphas = 1 / (1 + np.exp(-rng.normal(size=n)))
    shs = rng.normal(size=(n, 3)) * 0.5
    return [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]


def test_pallas_forward_matches_tiled(rng):
    cam = Camera.from_dict(example_camera())
    args = _scene(rng)
    img_t, aux_t = render(*args, cam, **TILED)
    img_p, aux_p = render(*args, cam, **PALLAS)
    # 3e-5: the pallas forward reduces the cross-segment transmittance
    # product with a halving tree (_prod_reduce) — mathematically equal to
    # the tiled backend's sequential product, different fp32 reassociation;
    # the golden-parity contract stays 1e-4
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(aux_p["contrib"]), np.asarray(aux_t["contrib"]))
    np.testing.assert_allclose(np.asarray(aux_p["final_tau"]), np.asarray(aux_t["final_tau"]), atol=3e-5)


def test_pallas_gradients_match_tiled_ad(rng):
    """Hand-written Pallas backward == reverse-mode AD of the tiled forward."""
    cam = Camera.from_dict(example_camera())
    args = _scene(rng, n=60)
    w = jnp.asarray(np.random.default_rng(7).normal(size=(3, 16, 32)), jnp.float32)

    def loss(kw):
        def f(*a):
            im, _ = render(*a, cam, **kw)
            return jnp.sum(im * w)
        return f

    gt = jax.grad(loss(TILED), argnums=tuple(range(5)))(*args)
    gp = jax.grad(loss(PALLAS), argnums=tuple(range(5)))(*args)
    for a, b, name in zip(gt, gp, ["pws", "shs", "alphas", "scales", "rots"]):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale, err_msg=f"grad {name}"
        )


def test_pallas_gradients_vs_golden_finite_diff():
    """Image-level gradient gate vs the float64 golden oracle on the 4-gaussian
    fixture (fp32 kernels -> 1e-3 tolerance; semantics proven exact in the
    tiled/dense f64 tests)."""
    gs = example_gaussians()
    gs["alphas"] = np.full(4, 0.8)
    camd = example_camera()
    cam = Camera.from_dict(camd)
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, camd["height"], camd["width"]))

    def loss_np(pws, shs, alphas, scales, rots):
        img, _ = golden.render(
            pws.reshape(-1, 3), shs.reshape(-1, 3), alphas, scales.reshape(-1, 3),
            rots.reshape(-1, 4), camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"],
            camd["cx"], camd["cy"], camd["width"], camd["height"],
        )
        return np.array([np.sum(img * w)])

    def loss_jx(pws, shs, alphas, scales, rots):
        img, _ = render(
            pws.reshape(-1, 3), shs.reshape(-1, 3), alphas, scales.reshape(-1, 3),
            rots.reshape(-1, 4), cam, **PALLAS,
        )
        return jnp.sum(img * jnp.asarray(w, jnp.float32))

    args_np = [gs["pws"].ravel(), gs["shs"].ravel(), gs["alphas"], gs["scales"].ravel(), gs["rots"].ravel()]
    args_jx = [jnp.asarray(a, jnp.float32) for a in args_np]
    grads = jax.grad(loss_jx, argnums=tuple(range(5)))(*args_jx)
    for i, name in enumerate(["pws", "shs", "alphas", "scales", "rots"]):
        g_num = golden.numerical_derivative(loss_np, args_np, i, delta=1e-6, central=False)[0]
        scale = max(1.0, np.abs(g_num).max())
        np.testing.assert_allclose(
            np.asarray(grads[i]), g_num, atol=1.5e-3 * scale, err_msg=f"grad {name}"
        )


def test_pallas_empty_scene():
    """No visible gaussians -> black image, unit transmittance, zero grads."""
    cam = Camera.from_dict(example_camera())
    pws = jnp.asarray([[0.0, 0.0, -100.0]], jnp.float32)  # behind camera
    shs = jnp.ones((1, 3), jnp.float32)
    alphas = jnp.ones(1, jnp.float32)
    scales = jnp.full((1, 3), 0.05, jnp.float32)
    rots = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    img, aux = render(pws, shs, alphas, scales, rots, cam, **PALLAS)
    assert float(jnp.abs(img).max()) == 0.0
    assert float(aux["final_tau"].min()) == 1.0

    g = jax.grad(lambda p: render(p, shs, alphas, scales, rots, cam, **PALLAS)[0].sum())(pws)
    assert float(jnp.abs(g).max()) == 0.0


def test_pallas_saturation_and_multichunk(rng):
    """Stress the segmented grid: an opaque stack saturating tau (early
    termination) plus enough overlap that tiles own multiple chunks and
    chunks span several tiles."""
    cam = Camera.from_dict(example_camera())
    n = 400
    pws = np.concatenate([
        rng.normal(size=(n // 2, 3)) * 0.02 + np.array([0.0, 0.0, 0.0]),   # stack
        rng.normal(size=(n // 2, 3)) * np.array([1.5, 1.0, 1.5]),          # spread
    ])
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.3 - 1.8)
    alphas = np.full(n, 0.95)
    shs = rng.normal(size=(n, 3)) * 0.5
    args = [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]

    kw = dict(max_patches=8192)
    img_t, aux_t = render(*args, cam, backend="tiled", k_chunk=128, n_chunks=32, **kw)
    img_p, aux_p = render(*args, cam, backend="pallas", k_chunk=128, **kw)
    assert float(aux_p["final_tau"].min()) < 1e-4  # saturation actually hit
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(aux_p["contrib"]), np.asarray(aux_t["contrib"]))

    w = jnp.asarray(rng.normal(size=(3, 16, 32)), jnp.float32)

    def loss(backend, extra):
        def f(*a):
            im, _ = render(*a, cam, backend=backend, k_chunk=128, **extra, **kw)
            return jnp.sum(im * w)
        return f

    gt = jax.grad(loss("tiled", dict(n_chunks=32)), argnums=(0, 2))(*args)
    gp = jax.grad(loss("pallas", {}), argnums=(0, 2))(*args)
    for a, b, name in zip(gt, gp, ["pws", "alphas"]):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3 * scale, err_msg=f"grad {name}"
        )


def test_pallas_subchunked_kernels_match(rng):
    """k_chunk > 128 triggers the sub-chunked kernel path (multiple 128-row
    sub-chunks per block, scalar-gated) — must be bit-identical in structure
    to the single-chunk path."""
    cam = Camera.from_dict(example_camera())
    args = _scene(rng, n=90)
    kw = dict(max_patches=1024, tile=16)
    img_1, aux_1 = render(*args, cam, backend="pallas", k_chunk=128, **kw)
    img_4, aux_4 = render(*args, cam, backend="pallas", k_chunk=512, **kw)
    np.testing.assert_allclose(np.asarray(img_4), np.asarray(img_1), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(aux_4["contrib"]), np.asarray(aux_1["contrib"]))

    w = jnp.asarray(np.random.default_rng(3).normal(size=(3, 16, 32)), jnp.float32)

    def loss(kc):
        def f(*a):
            im, _ = render(*a, cam, backend="pallas", k_chunk=kc, **kw)
            return jnp.sum(im * w)
        return f

    g1 = jax.grad(loss(128), argnums=(0, 2))(*args)
    g4 = jax.grad(loss(512), argnums=(0, 2))(*args)
    for a, b in zip(g1, g4):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    # k = max_patches (one chunk spanning everything — the EGS_KCHUNK=1024
    # bench regime where chunk-crossing segments vanish entirely)
    img_k, aux_k = render(*args, cam, backend="pallas", k_chunk=1024, **kw)
    np.testing.assert_allclose(np.asarray(img_k), np.asarray(img_1), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(aux_k["contrib"]), np.asarray(aux_1["contrib"]))
    gk = jax.grad(loss(1024), argnums=(0, 2))(*args)
    for a, b in zip(g1, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


@pytest.mark.parametrize("mode", ["full", "perm", "radix"])
def test_sort_reduce_grads_matches_scatter(rng, mode, monkeypatch):
    """The TPU gradient-accumulation path (sort + segmented sum, all three
    payload transports: perm-sort + row gather [the default], full bitonic,
    counting-sort + row gather) must equal the XLA scatter-add oracle."""
    monkeypatch.delenv("EGS_GRAD_PERM", raising=False)
    monkeypatch.delenv("EGS_RADIX_REDUCE", raising=False)
    if mode == "full":
        monkeypatch.setenv("EGS_GRAD_PERM", "0")  # 10-col payload sort
    elif mode == "radix":
        monkeypatch.setenv("EGS_RADIX_REDUCE", "1")
    from easygaussiansplatting_tpu.ops.pallas.rasterize import (
        GRAD_USED, _sort_reduce_grads,
    )

    n, m = 37, 512
    # patch->gaussian map with the real structure: per-gaussian patches
    # contiguous in slot order, a dead tail, and some gaussians unused
    counts = rng.integers(0, 40, size=n).astype(np.int32)
    counts[rng.integers(0, n, size=5)] = 0
    gsid = np.concatenate([np.full(c, g, np.int32) for g, c in enumerate(counts)])
    gsid = gsid[:m]
    counts = np.bincount(gsid, minlength=n).astype(np.int32)
    live = np.zeros(m, bool)
    live[: gsid.shape[0]] = True
    gsafe = np.zeros(m, np.int32)
    gsafe[: gsid.shape[0]] = gsid
    # patches arrive tile-sorted (arbitrary permutation of the slot order)
    perm_idx = rng.permutation(m)
    rows = rng.normal(size=(GRAD_USED, m)).astype(np.float32)
    rows[:, ~live[perm_idx]] = 0.0

    got = _sort_reduce_grads(
        jnp.asarray(rows), jnp.asarray(gsafe[perm_idx]),
        jnp.asarray(live[perm_idx]), jnp.asarray(counts), n,
    )
    want = np.zeros((GRAD_USED, n), np.float32)
    np.add.at(want.T, gsafe[perm_idx][live[perm_idx]],
              rows.T[live[perm_idx]])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.mark.slow
def test_pallas_far_tile_origin_parity(rng):
    """Kernels work in tile-local coordinates (kernels._pixel_coords): the
    means are shifted by the tile origin. Guard the ox/oy plumbing and the
    fp32-conditioning claim where it matters — tiles whose origins sit ~1000
    pixels from (0,0), i.e. the far corner of the reference eval resolution
    (979x546), which no other test reaches (the fixture camera is 32x16)."""
    w, h = 992, 560
    cam = Camera.from_dict(dict(
        example_camera(), width=w, height=h, cx=w / 2.0, cy=h / 2.0,
        fx=400.0, fy=400.0,
    ))
    n = 24
    # world points that project near the far (right, bottom) image corner
    zs = 2.0 + rng.uniform(size=n)
    xs = (rng.uniform(size=n) * 120 + 820 - cam.cx) / cam.fx * zs
    ys = (rng.uniform(size=n) * 100 + 430 - cam.cy) / cam.fy * zs
    pws = np.stack([xs, ys, zs], axis=1)
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    args = [jnp.asarray(a, jnp.float32) for a in (
        pws,
        rng.normal(size=(n, 3)) * 0.5,
        1 / (1 + np.exp(-rng.normal(size=n))),
        np.exp(rng.normal(size=(n, 3)) * 0.3 - 2.8),
        rots,
    )]
    img_p, aux_p = render(*args, cam, **PALLAS)
    img_t, aux_t = render(*args, cam, **TILED)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=3e-5)
    np.testing.assert_array_equal(
        np.asarray(aux_p["contrib"]), np.asarray(aux_t["contrib"]))

    # gradients through the far-origin tiles too
    wmask = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    def loss(kw):
        def f(*a):
            im, _ = render(*a, cam, **kw)
            return jnp.sum(im * wmask)
        return f

    gt = jax.grad(loss(TILED), argnums=(0, 2))(*args)
    gp = jax.grad(loss(PALLAS), argnums=(0, 2))(*args)
    for a, b, name in zip(gt, gp, ["pws", "alphas"]):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale,
            err_msg=f"grad {name}")


@pytest.mark.slow
@pytest.mark.parametrize("seed", [3, 11, 42, 77, 123])
def test_pallas_parity_seed_fuzz(seed):
    """Forward + gradient parity vs the tiled-AD backend across random
    scenes: different seeds exercise different segment layouts (empty
    tiles, chunk boundaries, saturated pixels, single-entry segments)."""
    rng = np.random.default_rng(seed)
    cam = Camera.from_dict(dict(
        example_camera(), width=64, height=48, cx=32.0, cy=24.0,
        fx=50.0, fy=50.0,
    ))
    args = _scene(rng, n=150)
    img_t, aux_t = render(*args, cam, **TILED)
    img_p, aux_p = render(*args, cam, **PALLAS)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=3e-5)
    np.testing.assert_array_equal(
        np.asarray(aux_p["contrib"]), np.asarray(aux_t["contrib"]))

    w = jnp.asarray(rng.normal(size=(3, 48, 64)), jnp.float32)

    def loss(kw):
        def f(*a):
            im, _ = render(*a, cam, **kw)
            return jnp.sum(im * w)
        return f

    gt = jax.grad(loss(TILED), argnums=(0, 2, 3))(*args)
    gp = jax.grad(loss(PALLAS), argnums=(0, 2, 3))(*args)
    for a, b, name in zip(gt, gp, ["pws", "alphas", "scales"]):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale,
            err_msg=f"grad {name} seed {seed}")


# Variants are expressed RELATIVE to the r4-landed defaults (LOG_SCAN on,
# SUB=64, GRAD_PERM on): the "0" rows guard the kept fallback paths, the
# rest the opt-in/probe paths. (EGS_TRI_PREC / EGS_DOT_PREC were removed in
# r3 — Mosaic rejects non-HIGHEST dot precisions inside Pallas kernels —
# and the forward log-scan EGS_LOG_SCAN_FWD was deleted in r4 after losing
# the on-chip A/B twice.)
VARIANT_ENVS = [
    {"EGS_RADIX_SORT": "1"},
    {"EGS_RADIX_REDUCE": "1"},
    {"EGS_LOG_SCAN": "0"},  # sequential sublane-scan backward (fallback)
    {"EGS_SUB": "32"},
    {"EGS_SUB": "128"},
    {"EGS_KCHUNK": "1024"},
    {"EGS_FUSED_PRE": "1"},
    {"EGS_FUSED_PRE": "1", "EGS_LOG_SCAN": "0", "EGS_SUB": "128"},
    {"EGS_XLA_GRAD_SORT": "1"},   # r5: XLA sort_key_val in the grad reduce
    {"EGS_NO_SUBGATE": "1"},      # r5: ungated sub-chunks (fixed-cost probe)
    {"EGS_INTERLEAVE": "2"},      # r5: tile-interleaved segment order
    {"EGS_INTERLEAVE": "4"},
    {"EGS_INTERLEAVE": "2", "EGS_XLA_GRAD_SORT": "1"},
]

_VARIANT_SCRIPT = r"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.data import example_camera
from easygaussiansplatting_tpu.ops.rasterize import render

rng = np.random.default_rng(5)
cam = Camera.from_dict(example_camera())
n = 120
pws = rng.normal(size=(n, 3)) * np.array([1.5, 1.0, 1.5])
rots = rng.normal(size=(n, 4)); rots /= np.linalg.norm(rots, axis=1, keepdims=True)
args = [jnp.asarray(a, jnp.float32) for a in (
    pws, rng.normal(size=(n, 3)) * 0.5,
    1 / (1 + np.exp(-rng.normal(size=n))),
    np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2), rots)]
kw = dict(backend="pallas", k_chunk=int(os.environ.get("EGS_KCHUNK", "128")),
          max_patches=4096)
img, _ = render(*args, cam, **kw)
w = jnp.asarray(np.random.default_rng(7).normal(size=(3, 16, 32)), jnp.float32)
g = jax.grad(lambda *a: jnp.sum(render(*a, cam, **kw)[0] * w), argnums=(0, 2))(*args)
np.savez("OUTPATH", img=np.asarray(img), gpws=np.asarray(g[0]), galpha=np.asarray(g[1]))
"""


@pytest.mark.slow
def test_variant_flags_parity_subprocess(tmp_path):
    """Every perf-variant env flag must render/differentiate within fp32
    reassociation tolerance of the default path. Flags are read at module
    import, so each combo runs in a fresh subprocess (this is the in-repo
    guard for what scripts/ab_bench.py sweeps on-chip)."""
    import os
    import subprocess
    import sys

    def run(env_over, tag):
        out = tmp_path / f"{tag}.npz"
        env = dict(os.environ, **env_over)
        env.pop("PYTEST_CURRENT_TEST", None)
        script = _VARIANT_SCRIPT.replace("OUTPATH", str(out))
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, f"{tag}: {r.stderr[-2000:]}"
        return np.load(out)

    base = run({}, "base")
    for i, env_over in enumerate(VARIANT_ENVS):
        got = run(env_over, f"v{i}")
        tag = str(env_over)
        np.testing.assert_allclose(got["img"], base["img"], atol=5e-5,
                                   err_msg=f"img {tag}")
        for k in ("gpws", "galpha"):
            scale = max(1.0, np.abs(base[k]).max())
            np.testing.assert_allclose(got[k], base[k], atol=1e-3 * scale,
                                       err_msg=f"{k} {tag}")


@pytest.mark.parametrize("grad_perm", [False, True])
def test_sort_reduce_grads_direct_composition(rng, monkeypatch, grad_perm):
    """_sort_reduce_grads (the TPU default patch->gaussian gradient
    reduction) never executes off-chip through the render wrapper (interpret
    mode takes the XLA scatter fallback) — drive the composition directly:
    Pallas bitonic sort + segmented sum + segment-end gather must equal the
    scatter-add, for both payload-sort and permutation-sort variants."""
    if grad_perm:
        monkeypatch.setenv("EGS_GRAD_PERM", "1")
    else:
        monkeypatch.delenv("EGS_GRAD_PERM", raising=False)
    from easygaussiansplatting_tpu.ops.pallas.rasterize import (
        GRAD_USED,
        _sort_reduce_grads,
    )

    m, n = 3000, 300
    gsid = rng.integers(-1, n, size=m).astype(np.int32)  # -1 = dead patch
    live = gsid >= 0
    gsafe = np.maximum(gsid, 0).astype(np.int32)
    rows_ct = np.where(
        live[None, :], rng.normal(size=(GRAD_USED, m)), 0.0
    ).astype(np.float32)
    counts = np.bincount(gsafe[live], minlength=n).astype(np.int32)

    got = np.asarray(_sort_reduce_grads(
        jnp.asarray(rows_ct), jnp.asarray(gsafe), jnp.asarray(live),
        jnp.asarray(counts), n,
    ))
    want = np.zeros((GRAD_USED, n), np.float32)
    np.add.at(want.T, gsafe[live], rows_ct.T[live])
    np.testing.assert_allclose(got, want, atol=2e-4)
