"""Fused Pallas preprocess (ops/pallas/preprocess.py) vs ops/stages.py.

The fused kernel re-expresses the exact stage math in component-plane
layout; these tests pin (a) forward values, (b) reverse-mode gradients
through the custom_vjp, and (c) the end-to-end render path under
EGS_FUSED_PRE=1, all against the plain-JAX stages chain that the golden
oracle already certifies.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.data import example_camera
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops import stages
from easygaussiansplatting_tpu.ops.pallas.preprocess import fused_preprocess
from easygaussiansplatting_tpu.ops.rasterize import render

PALLAS = dict(backend="pallas", k_chunk=32, max_patches=4096)


def _pool(rng, n, deg):
    s_dim = 3 * (deg + 1) ** 2
    pws = rng.normal(size=(n, 3)) * np.array([1.5, 1.0, 1.5])
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2)
    alphas = 1 / (1 + np.exp(-rng.normal(size=n)))
    shs = rng.normal(size=(n, s_dim)) * 0.5
    return [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]


@pytest.mark.parametrize("deg,n", [(0, 120), (3, 257), (0, 5000)])
def test_fused_forward_matches_stages(rng, deg, n):
    # n=5000 > RB*LANES=4096 forces multiple grid steps (block indexing)
    cam = Camera.from_dict(example_camera())
    args = _pool(rng, n, deg)
    ref = stages.preprocess(*args, cam, sh_degree=deg)
    out = fused_preprocess(*args, cam, sh_degree=deg, interpret=True)
    for key in ("us", "cinv2ds", "colors", "depths", "areas"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]),
            atol=2e-5, rtol=2e-5, err_msg=key,
        )
    np.testing.assert_array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))
    # the packed table mirrors the rasterize_pallas concat layout
    table = np.asarray(out["table"])
    np.testing.assert_allclose(table[:, 0:2], np.asarray(ref["us"]), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(table[:, 5], np.asarray(args[2]), atol=0)
    np.testing.assert_array_equal(table[:, 9:16], 0.0)


def test_fused_alive_mask(rng):
    cam = Camera.from_dict(example_camera())
    args = _pool(rng, 64, 0)
    alive = jnp.asarray(rng.random(64) < 0.5)
    ref = stages.preprocess(*args, cam, alive=alive, sh_degree=0)
    out = fused_preprocess(*args, cam, alive=alive, sh_degree=0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))


@pytest.mark.parametrize("deg", [0, 3])
def test_fused_gradients_match_stages(rng, deg):
    cam = Camera.from_dict(example_camera())
    args = _pool(rng, 130, deg)
    w = {
        "us": jnp.asarray(rng.normal(size=(130, 2)), jnp.float32),
        "cinv2ds": jnp.asarray(rng.normal(size=(130, 3)), jnp.float32),
        "colors": jnp.asarray(rng.normal(size=(130, 3)), jnp.float32),
    }

    def loss_stages(*a):
        o = stages.preprocess(*a, cam, sh_degree=deg)
        return sum(jnp.sum(w[k] * o[k]) for k in w) + jnp.sum(o["alphas"])

    def loss_fused(*a):
        o = fused_preprocess(*a, cam, sh_degree=deg, interpret=True)
        return sum(jnp.sum(w[k] * o[k]) for k in w) + jnp.sum(o["table"][:, 5])

    gs = jax.grad(loss_stages, argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(gs, gf, ["pws", "shs", "alphas", "scales", "rots"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_render_fused_flag_parity(rng, monkeypatch):
    """EGS_FUSED_PRE=1 end-to-end: image and parameter gradients match the
    default stages path through the full Pallas rasteriser."""
    cam = Camera.from_dict(example_camera())
    args = _pool(rng, 120, 0)
    wimg = jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 16, 32)), jnp.float32
    )

    def run():
        def loss(*a):
            im, _ = render(*a, cam, **PALLAS)
            return jnp.sum(im * wimg)

        img, _ = render(*args, cam, **PALLAS)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        return img, grads

    # explicit 0, not delenv: unset defaults to ON when the backend is TPU,
    # which would make this fused-vs-fused (vacuous) under EGS_TEST_TPU=1
    monkeypatch.setenv("EGS_FUSED_PRE", "0")
    img0, g0 = run()
    monkeypatch.setenv("EGS_FUSED_PRE", "1")
    img1, g1 = run()
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0), atol=3e-5)
    for a, b, name in zip(g0, g1, ["pws", "shs", "alphas", "scales", "rots"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_render_fused_us_offset_grad(rng, monkeypatch):
    """The densification screen-gradient signal survives the fused path."""
    cam = Camera.from_dict(example_camera())
    args = _pool(rng, 120, 0)
    off = jnp.zeros((120, 2), jnp.float32)
    wimg = jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 16, 32)), jnp.float32
    )

    def loss(o):
        im, _ = render(*args, cam, us_offset=o, **PALLAS)
        return jnp.sum(im * wimg)

    monkeypatch.setenv("EGS_FUSED_PRE", "0")  # see test_render_fused_flag_parity
    g0 = jax.grad(loss)(off)
    monkeypatch.setenv("EGS_FUSED_PRE", "1")
    g1 = jax.grad(loss)(off)
    assert float(jnp.max(jnp.abs(g0))) > 0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=5e-4, rtol=5e-4)
