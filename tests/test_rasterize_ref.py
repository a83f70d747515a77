"""Reference JAX rasteriser vs golden oracle: pixels and whole-image grads."""

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu import golden
from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops.rasterize_ref import render_reference


def _inputs():
    gs = example_gaussians()
    camd = example_camera()
    cam = Camera.from_dict(camd)
    # soften alphas so nothing saturates the 0.99 clamp (clamp subgradient
    # differs from the golden finite-diff at exactly alpha'=0.99)
    gs["alphas"] = np.full(4, 0.8)
    return gs, camd, cam


def test_image_matches_golden():
    gs, camd, cam = _inputs()
    img_g, aux_g = golden.render(
        gs["pws"], gs["shs"], gs["alphas"], gs["scales"], gs["rots"],
        camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"], camd["cx"], camd["cy"],
        camd["width"], camd["height"],
    )
    img_j, aux_j = render_reference(
        jnp.asarray(gs["pws"], jnp.float32), jnp.asarray(gs["shs"], jnp.float32),
        jnp.asarray(gs["alphas"], jnp.float32), jnp.asarray(gs["scales"], jnp.float32),
        jnp.asarray(gs["rots"], jnp.float32), cam,
    )
    # fp32 forward: exp + long transmittance products accumulate ~1e-3;
    # exact-semantics parity is proven at 1e-12 by the float64 test below.
    np.testing.assert_allclose(np.asarray(img_j), img_g, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(aux_j["contrib"]), aux_g["contrib"])
    np.testing.assert_allclose(np.asarray(aux_j["final_tau"]), aux_g["final_tau"], atol=5e-3)


def test_image_matches_golden_exactly_in_f64():
    gs, camd, cam = _inputs()
    img_g, aux_g = golden.render(
        gs["pws"], gs["shs"], gs["alphas"], gs["scales"], gs["rots"],
        camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"], camd["cx"], camd["cy"],
        camd["width"], camd["height"],
    )
    with jax.enable_x64():
        cam64 = Camera.from_dict(camd, dtype=jnp.float64)
        img_j, aux_j = render_reference(
            jnp.asarray(gs["pws"]), jnp.asarray(gs["shs"]), jnp.asarray(gs["alphas"]),
            jnp.asarray(gs["scales"]), jnp.asarray(gs["rots"]), cam64,
        )
        np.testing.assert_allclose(np.asarray(img_j), img_g, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(aux_j["contrib"]), aux_g["contrib"])
        np.testing.assert_allclose(np.asarray(aux_j["final_tau"]), aux_g["final_tau"], atol=1e-12)


def test_whole_image_gradients_vs_golden_finite_diff():
    """The reference's image-level gradient contract (backward_cpu.py:652-698):
    d(loss)/d(param) through the FULL renderer vs finite differences of the
    float64 golden model, at the reference's abs-1e-4 [OK] gate. Autodiff runs
    in f64 to test *semantics*; the fp32 production path only adds rounding."""
    gs, camd, cam = _inputs()
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, camd["height"], camd["width"]))

    def loss_np(pws, shs, alphas, scales, rots):
        img, _ = golden.render(
            pws.reshape(-1, 3), shs.reshape(-1, 3), alphas, scales.reshape(-1, 3),
            rots.reshape(-1, 4), camd["Rcw"], camd["tcw"], camd["fx"], camd["fy"],
            camd["cx"], camd["cy"], camd["width"], camd["height"],
        )
        return np.array([np.sum(img * w)])

    args_np = [gs["pws"].ravel(), gs["shs"].ravel(), gs["alphas"], gs["scales"].ravel(), gs["rots"].ravel()]

    with jax.enable_x64():
        cam64 = Camera.from_dict(camd, dtype=jnp.float64)

        def loss_jx(pws, shs, alphas, scales, rots):
            img, _ = render_reference(
                pws.reshape(-1, 3), shs.reshape(-1, 3), alphas, scales.reshape(-1, 3),
                rots.reshape(-1, 4), cam64,
            )
            return jnp.sum(img * jnp.asarray(w))

        args_jx = [jnp.asarray(a, jnp.float64) for a in args_np]
        grads = jax.grad(loss_jx, argnums=(0, 1, 2, 3, 4))(*args_jx)

    names = ["pws", "shs", "alphas", "scales", "rots"]
    for i, name in enumerate(names):
        g_num = golden.numerical_derivative(loss_np, args_np, i, delta=1e-6, central=False)[0]
        g_ad = np.asarray(grads[i])
        np.testing.assert_allclose(
            g_ad, g_num, atol=1e-4, err_msg=f"grad mismatch for {name}"
        )


def test_random_scene_image_matches_golden(rng):
    """Exact-semantics parity on a dense random scene (f64: discrete
    alpha-skip / tau-stop / tile-rect decisions are identical, so the images
    must agree to rounding; fp32-vs-f64 threshold flips are excluded by
    construction)."""
    n = 80
    camd = example_camera()
    pws = rng.normal(size=(n, 3)) * np.array([1.5, 1.0, 1.5])
    rots = rng.normal(size=(n, 4))
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2)
    alphas = 1 / (1 + np.exp(-rng.normal(size=n)))
    shs = rng.normal(size=(n, 3)) * 0.5

    img_g, _ = golden.render(
        pws, shs, alphas, scales, rots, camd["Rcw"], camd["tcw"],
        camd["fx"], camd["fy"], camd["cx"], camd["cy"], camd["width"], camd["height"],
    )
    with jax.enable_x64():
        cam = Camera.from_dict(camd, dtype=jnp.float64)
        img_j, _ = render_reference(
            jnp.asarray(pws), jnp.asarray(shs), jnp.asarray(alphas),
            jnp.asarray(scales), jnp.asarray(rots), cam,
        )
        np.testing.assert_allclose(np.asarray(img_j), img_g, atol=1e-10)
