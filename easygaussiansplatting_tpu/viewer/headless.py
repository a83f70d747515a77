"""Headless turntable rendering.

Replaces the interactive orbit controls of the reference viewer
(/root/reference/viewer/viewer.py:60-114) with deterministic orbit camera
paths rendered server-side on the TPU. All frames share one jit cache entry
(same shapes; camera pose is a traced leaf).
"""

import numpy as np

from easygaussiansplatting_tpu.data.synthetic import look_at_camera


def orbit_cameras(center, radius, n_frames=60, width=640, height=480,
                  elevation=0.35, f=None, up=(0.0, 0.0, 1.0)):
    """Ring of cameras orbiting `center` at `radius`. `elevation` is the
    height of the ring above center in units of radius."""
    center = np.asarray(center, np.float64)
    f = f or 0.9 * width
    s = np.sqrt(1.0 + elevation**2)  # unit-norm offset: |pos - center| == radius
    cams = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / n_frames
        pos = center + (radius / s) * np.array([np.cos(a), np.sin(a), elevation])
        cams.append(look_at_camera(pos, center, width, height, f, up=up, cam_id=i))
    return cams


def render_turntable(gs, cameras=None, *, backend="pallas", max_patches=2**20,
                     sh_degree=None, **orbit_kw):
    """Render a gaussian recarray (or dict of arrays) around its centroid.

    Returns a list of [3,H,W] float32 numpy frames.
    """
    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.data.gau_io import recarray_to_arrays
    from easygaussiansplatting_tpu.ops.rasterize import render

    a = gs if isinstance(gs, dict) else recarray_to_arrays(gs)
    pws = np.asarray(a["pws"], np.float32)
    if cameras is None:
        center = pws.mean(0)
        radius = 2.5 * float(np.percentile(np.linalg.norm(pws - center, axis=1), 90))
        cameras = orbit_cameras(center, radius, **orbit_kw)

    shs = np.asarray(a["shs"], np.float32).reshape(len(pws), -1)
    if sh_degree is None:
        sh_degree = int(np.sqrt(max(1, shs.shape[1] // 3))) - 1
    args = (
        jnp.asarray(pws),
        jnp.asarray(shs),
        jnp.asarray(a["alphas"], jnp.float32).reshape(-1),
        jnp.asarray(a["scales"], jnp.float32),
        jnp.asarray(a["rots"], jnp.float32),
    )
    frames = []
    for cam in cameras:
        img, _ = render(*args, cam, backend=backend, max_patches=max_patches,
                        sh_degree=sh_degree)
        frames.append(np.asarray(jax.block_until_ready(img)))
    return frames


def save_gif(path, frames, fps=20):
    """Write [3,H,W] float frames as an animated GIF."""
    from PIL import Image

    ims = [
        Image.fromarray(
            (np.clip(np.transpose(f, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
        )
        for f in frames
    ]
    ims[0].save(
        path, save_all=True, append_images=ims[1:], duration=int(1000 / fps), loop=0
    )


def camera_markers(cameras, size_frac=0.01, color=(1.0, 0.3, 0.1)):
    """Small bright Gaussians at camera centres — the headless counterpart of
    the reference viewer's dataset-camera frusta overlay
    (/root/reference/gaussian_viewer.py:24-60, GLCameraFrameItem). Returns a
    dict of arrays to concatenate onto a scene's gaussians."""
    centers = np.stack([np.asarray(c.twc, np.float64) for c in cameras])
    n = len(centers)
    spread = float(np.max(np.linalg.norm(centers - centers.mean(0), axis=1))) or 1.0
    sh_c0 = 0.28209479177387814
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    return {
        "pws": centers.astype(np.float32),
        "rots": rots,
        "scales": np.full((n, 3), size_frac * spread, np.float32),
        "alphas": np.full(n, 0.95, np.float32),
        "shs": np.tile(((np.asarray(color, np.float32) - 0.5) / sh_c0), (n, 1)),
    }


def save_frames(prefix, frames):
    from PIL import Image

    for i, f in enumerate(frames):
        arr = (np.clip(np.transpose(f, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(f"{prefix}{i:04d}.png")
