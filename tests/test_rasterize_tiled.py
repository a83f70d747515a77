"""Tiled rasteriser vs dense reference rasteriser and golden oracle."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops.rasterize_ref import render_reference
from easygaussiansplatting_tpu.ops.rasterize_tiled import render_tiled


def _random_scene(rng, n=120):
    pws = rng.normal(size=(n, 3)) * np.array([1.5, 1.0, 1.5])
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2)
    alphas = 1 / (1 + np.exp(-rng.normal(size=n)))
    shs = rng.normal(size=(n, 3)) * 0.5
    return pws, rots, scales, alphas, shs


def test_tiled_matches_dense_fp32(rng):
    """Same dtype, same thresholds -> images should agree to fp32 rounding."""
    camd = example_camera()
    cam = Camera.from_dict(camd)
    pws, rots, scales, alphas, shs = _random_scene(rng)
    args = [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]
    img_d, aux_d = render_reference(*args, cam)
    img_t, aux_t = render_tiled(*args, cam, max_patches=4096, k_chunk=32, n_chunks=8)
    assert int(aux_t["n_truncated"]) == 0
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(aux_t["contrib"]), np.asarray(aux_d["contrib"]))
    np.testing.assert_allclose(np.asarray(aux_t["final_tau"]), np.asarray(aux_d["final_tau"]), atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() == "tpu", reason="TPUs have no float64"
)
def test_tiled_matches_golden_f64(rng):
    camd = example_camera()
    pws, rots, scales, alphas, shs = _random_scene(rng)
    img_g, _ = golden.render(
        pws, shs, alphas, scales, rots, camd["Rcw"], camd["tcw"],
        camd["fx"], camd["fy"], camd["cx"], camd["cy"], camd["width"], camd["height"],
    )
    with jax.enable_x64():
        cam = Camera.from_dict(camd, dtype=jnp.float64)
        img_t, _ = render_tiled(
            jnp.asarray(pws), jnp.asarray(shs), jnp.asarray(alphas),
            jnp.asarray(scales), jnp.asarray(rots), cam,
            max_patches=4096, k_chunk=32, n_chunks=8,
        )
        np.testing.assert_allclose(np.asarray(img_t), img_g, atol=1e-10)


def test_tiled_gradients_match_dense(rng):
    """AD gradients of the tiled path == AD gradients of the dense path."""
    camd = example_camera()
    cam = Camera.from_dict(camd)
    pws, rots, scales, alphas, shs = _random_scene(rng, n=40)
    w = jnp.asarray(np.random.default_rng(7).normal(size=(3, 16, 32)), jnp.float32)

    def loss_d(*args):
        img, _ = render_reference(*args, cam)
        return jnp.sum(img * w)

    def loss_t(*args):
        img, _ = render_tiled(*args, cam, max_patches=4096, k_chunk=32, n_chunks=8)
        return jnp.sum(img * w)

    args = [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]
    gd = jax.grad(loss_d, argnums=tuple(range(5)))(*args)
    gt = jax.grad(loss_t, argnums=tuple(range(5)))(*args)
    for a, b, name in zip(gd, gt, ["pws", "shs", "alphas", "scales", "rots"]):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale, err_msg=f"grad {name}"
        )


def test_tiled_nonsquare_image(rng):
    """Width/height not multiples of the tile size."""
    camd = example_camera()
    camd["width"], camd["height"] = 37, 21
    camd["cx"], camd["cy"] = 18.5, 10.5
    cam = Camera.from_dict(camd)
    pws, rots, scales, alphas, shs = _random_scene(rng, n=60)
    args = [jnp.asarray(a, jnp.float32) for a in (pws, shs, alphas, scales, rots)]
    img_d, _ = render_reference(*args, cam)
    img_t, _ = render_tiled(*args, cam, max_patches=4096, k_chunk=32, n_chunks=8)
    assert img_t.shape == (3, 21, 37)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=1e-5)
