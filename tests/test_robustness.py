"""Degenerate-input robustness: no NaNs in images or gradients.

The reference guards NaNs ad hoc (BAD_MARKER on singular conics,
kernel.cu:301-305; grads.isnan()=0, gsmodel.py:241; maha clamp,
kernel.cu:243). Here every guard must hold end-to-end under autodiff on the
padded pool: tiny/huge scales, behind-camera points, depth exactly at the
cull threshold, zero-degree SH, saturated opacities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.data import example_camera
from easygaussiansplatting_tpu.models import Camera
from easygaussiansplatting_tpu.ops.rasterize import render

KW = dict(max_patches=4096, k_chunk=128)


def _degenerate_scene():
    pws = np.array([
        [0.0, 0.0, 0.0],      # normal
        [0.0, 0.0, -100.0],   # far behind camera
        [1.03796196, 0.42017467, 4.87804612 - 4.67804612 + 0.0, ],  # near cam
        [0.2, 0.1, 0.3],
        [0.5, -0.2, 0.1],
    ], np.float32)
    # place one gaussian exactly at the MIN_DEPTH plane along the optical axis
    rots = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (5, 1))
    scales = np.array([
        [1e-12, 1e-12, 1e-12],  # collapses to a point -> singular conic
        [0.1, 0.1, 0.1],
        [50.0, 50.0, 50.0],     # giant splat
        [1e-6, 10.0, 1e-6],     # extremely anisotropic
        [0.05, 0.05, 0.05],
    ], np.float32)
    alphas = np.array([1.0, 0.5, 0.9999, 1e-8, 0.99], np.float32)
    shs = np.zeros((5, 3), np.float32)
    shs[:, 0] = 1.0
    return [jnp.asarray(a) for a in (pws, shs, alphas, scales, rots)]


@pytest.mark.parametrize("backend", ["tiled", "pallas"])
def test_no_nans_in_image_or_grads(backend):
    cam = Camera.from_dict(example_camera())
    args = _degenerate_scene()

    img, aux = render(*args, cam, backend=backend, **KW)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(aux["final_tau"])).all()

    def loss(*a):
        im, _ = render(*a, cam, backend=backend, **KW)
        return jnp.sum(im**2)

    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)
    for g, name in zip(grads, ["pws", "shs", "alphas", "scales", "rots"]):
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad {name} ({backend})"


def test_all_culled_scene_trains():
    """Every gaussian behind the camera: zero image, zero grads, no NaNs."""
    cam = Camera.from_dict(example_camera())
    pws = jnp.asarray(np.full((8, 3), -50.0, np.float32))
    shs = jnp.ones((8, 3), jnp.float32)
    alphas = jnp.full((8,), 0.5, jnp.float32)
    scales = jnp.full((8, 3), 0.1, jnp.float32)
    rots = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (8, 1))

    for backend in ("tiled", "pallas"):
        g = jax.grad(
            lambda p: render(p, shs, alphas, scales, rots, cam, backend=backend, **KW)[0].sum()
        )(pws)
        assert float(jnp.abs(g).max()) == 0.0
        assert np.isfinite(np.asarray(g)).all()
