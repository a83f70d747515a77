"""Interactive web viewer server: endpoint tests (headless).

Exercises the reference-parity surface of viewer/server.py (orbit camera
rendering, normal/ball/inverse modes, marker + cloud overlays) through the
real HTTP stack, the way the browser page does.
"""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from easygaussiansplatting_tpu.data import example_camera, example_gaussians
from easygaussiansplatting_tpu.data.synthetic import look_at_camera
from easygaussiansplatting_tpu.viewer.server import SceneRenderer, make_handler


@pytest.fixture(scope="module")
def renderer():
    g = example_gaussians()
    gs = {k: g[k] for k in ("pws", "rots", "scales", "alphas", "shs")}
    # distinct positions inside the orbit-camera frustum so the marker
    # overlay visibly changes the render
    cams = [
        look_at_camera(p, np.zeros(3), 64, 48, 60.0, cam_id=i)
        for i, p in enumerate(
            np.array([[0.8, 0.2, 0.3], [0.2, 0.8, 0.3], [-0.5, 0.5, 0.4]])
        )
    ]
    cloud = {
        "pws": gs["pws"],
        "rots": gs["rots"],
        "scales": np.full_like(np.asarray(gs["scales"], np.float32), 0.01),
        "alphas": np.ones(len(gs["pws"]), np.float32) * 0.9,
        "shs": np.asarray(gs["shs"], np.float32)[:, :3],
    }
    return SceneRenderer(gs, dataset_cameras=cams, cloud=cloud, marker_skip=1)


@pytest.fixture(scope="module")
def server_url(renderer):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(renderer))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index_and_info(server_url):
    status, ctype, body = _get(server_url + "/")
    assert status == 200 and "text/html" in ctype
    assert b"render mode" in body  # the settings panel

    status, _, body = _get(server_url + "/info")
    info = json.loads(body)
    assert info["n_gaussians"] == 4
    assert info["n_dataset_cameras"] == 3
    assert info["has_cloud"]
    assert info["radius"] > 0
    assert set(info["modes"]) == {"normal", "ball", "inverse"}


def test_render_endpoint_jpeg_dims(server_url):
    status, ctype, body = _get(
        server_url + "/render?az=0.7&el=0.3&w=96&h=64&fmt=png"
    )
    assert status == 200 and ctype == "image/png"
    from PIL import Image

    im = Image.open(io.BytesIO(body))
    assert im.size == (96, 64)


def test_render_modes_differ(renderer):
    kw = dict(azimuth=0.7, elevation=0.3, width=64, height=48)
    normal = renderer.render(mode="normal", **kw)
    cache_before = len(renderer._jit_cache)
    ball = renderer.render(mode="ball", **kw)
    inverse = renderer.render(mode="inverse", **kw)
    assert normal.shape == (48, 64, 3) and normal.dtype == np.uint8
    assert normal.max() > 0  # scene actually visible
    assert not np.array_equal(normal, ball)
    assert not np.array_equal(normal, inverse)
    # same resolution + mode switches reuse the single jitted render
    assert len(renderer._jit_cache) == cache_before


def test_overlays_toggle(renderer):
    kw = dict(azimuth=0.7, elevation=0.3, width=64, height=48)
    plain = renderer.render(**kw)
    cache_before = len(renderer._jit_cache)
    with_markers = renderer.render(markers=True, **kw)
    with_cloud = renderer.render(cloud=True, **kw)
    assert not np.array_equal(plain, with_markers)
    assert not np.array_equal(plain, with_cloud)
    assert len(renderer._jit_cache) == cache_before  # toggles don't recompile


def test_lores_drag_preview(server_url, renderer):
    """The interactive-drag preview (`lores=1`, VERDICT r3 item 7): frames
    come back at 1/4 resolution (16x fewer pixels over the tunnel), the
    view matches the full-resolution render (same camera, just coarser),
    and it costs exactly one extra jit cache entry."""
    from PIL import Image

    status, ctype, body = _get(
        server_url + "/render?az=0.7&el=0.3&w=256&h=192&fmt=png&lores=1"
    )
    assert status == 200 and ctype == "image/png"
    im = Image.open(io.BytesIO(body))
    assert im.size == (64, 48)  # 256x192 / LORES_DIV

    cache_before = len(renderer._jit_cache)
    full = renderer.render(azimuth=0.7, elevation=0.3, width=256, height=192)
    lo = renderer.render(azimuth=0.7, elevation=0.3, width=256, height=192,
                         lores=True)
    assert full.shape == (192, 256, 3) and lo.shape == (48, 64, 3)
    # repeated lores renders reuse one cache entry per resolution
    renderer.render(azimuth=0.9, elevation=0.2, width=256, height=192, lores=True)
    assert len(renderer._jit_cache) <= cache_before + 2
    # same view: the 4x box-downsampled full frame approximates the preview
    box = np.asarray(full, np.float32).reshape(48, 4, 64, 4, 3).mean((1, 3))
    diff = np.abs(box - np.asarray(lo, np.float32)).mean()
    assert diff < 12.0, f"lores preview diverges from the full view: {diff}"


def test_bad_route_404(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server_url + "/nope")
    assert ei.value.code == 404


def test_axis_grid_overlays(renderer):
    kw = dict(azimuth=0.7, elevation=0.3, width=64, height=48)
    plain = renderer.render(**kw)
    with_axes = renderer.render(axes=True, **kw)
    with_grid = renderer.render(grid=True, **kw)
    assert not np.array_equal(plain, with_axes)
    assert not np.array_equal(plain, with_grid)


def test_camera_frusta_geometry():
    """Frusta are oriented and image-bearing (reference
    camera_frame_item.py parity): texels sit exactly on the image plane at
    the frustum depth, carry the photograph's colors, and follow the
    camera's orientation; 8 wireframe segments per camera."""
    from easygaussiansplatting_tpu.viewer.headless import camera_frusta

    cams = [
        look_at_camera(p, np.zeros(3), 64, 48, 60.0, cam_id=i)
        for i, p in enumerate(np.array([[2.0, 0.0, 0.5], [0.0, 2.0, 0.5]]))
    ]
    img = np.zeros((3, 48, 64), np.float32)
    img[0] = 1.0  # pure red photo for camera 0
    f = camera_frusta(cams, images=[img, None], plane_frac=0.1, tex_wh=(8, 6))

    n_seg_per_cam = 8
    n_tex = 8 * 6
    assert len(f["pws"]) == 2 * n_seg_per_cam + n_tex

    # texels of camera 0: all at the same camera-frame depth (on the plane)
    tex = f["pws"][n_seg_per_cam:n_seg_per_cam + n_tex]
    cam0 = cams[0]
    pc = (np.asarray(cam0.Rcw) @ tex.T).T + np.asarray(cam0.tcw)
    assert np.allclose(pc[:, 2], pc[0, 2], atol=1e-5)  # planar
    assert pc[0, 2] > 0  # in front of the camera
    # photograph colors: red texels => SH0 encodes (1,0,0)
    sh_c0 = 0.28209479177387814
    rgb = f["shs"][n_seg_per_cam:n_seg_per_cam + n_tex] * sh_c0 + 0.5
    assert np.allclose(rgb[:, 0], 1.0, atol=1e-5)
    assert np.allclose(rgb[:, 1:], 0.0, atol=1e-5)
    # orientation: texel gaussians use the camera's rotation (thin normal
    # axis aligned with the optical axis)
    from easygaussiansplatting_tpu.data.gau_io import quaternion_to_matrix

    R = quaternion_to_matrix(f["rots"][n_seg_per_cam:n_seg_per_cam + 1])[0]
    np.testing.assert_allclose(R, np.asarray(cam0.Rcw).T, atol=1e-5)
    # wireframe segments are elongated (line-like): one long axis
    seg_scales = f["scales"][:n_seg_per_cam]
    assert np.all(seg_scales[:, 0] > 4 * seg_scales[:, 1])


def test_cloud_color_modes(renderer):
    kw = dict(azimuth=0.7, elevation=0.3, width=64, height=48, cloud=True)
    rgb = renderer.render(cloud_mode="rgb", **kw)
    cache_before = len(renderer._jit_cache)
    flat = renderer.render(cloud_mode="flat", **kw)
    inten = renderer.render(cloud_mode="intensity", **kw)
    rain = renderer.render(cloud_mode="rainbow", **kw)
    assert not np.array_equal(rgb, flat)
    assert not np.array_equal(rgb, inten)
    assert not np.array_equal(rgb, rain)
    assert len(renderer._jit_cache) == cache_before  # no recompile


def test_training_monitor_live():
    """One tiny training epoch with the monitor attached: the HTTP endpoints
    must serve the latest frame and history (reference train.py:62-66 live
    preview parity)."""
    import dataclasses

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.train import TrainConfig, train
    from easygaussiansplatting_tpu.viewer.monitor import TrainingMonitor

    cfg = dataclasses.replace(
        TrainConfig(), epochs=1, max_patches=2048, k_chunk=32, n_chunks=4,
        backend="tiled", densify_every_epochs=100, reset_alpha_every_epochs=100,
    )
    scene = make_synthetic_scene(seed=6, n_gaussians=24, n_cams=2, width=48, height=32)
    gts = render_gt_images(scene, cfg)
    pool = pool_from_arrays(
        pws=scene["pws"], rots=scene["rots"], scales=scene["scales"],
        alphas=scene["alphas"], shs=scene["shs"], capacity=32,
    )
    mon = TrainingMonitor(scene["cameras"][0], cfg, port=0, log_fn=lambda *_: None)
    try:
        train(pool, scene["cameras"], gts, cfg, scene["scene_size"],
              log_fn=lambda *_: None, eval_every=100, epoch_cb=mon.epoch_cb)
        url = f"http://127.0.0.1:{mon.port}"
        status, ctype, body = _get(url + "/preview.jpg")
        assert status == 200 and ctype == "image/jpeg" and len(body) > 100
        status, _, body = _get(url + "/history")
        h = json.loads(body)
        assert h["epoch"] == 1 and len(h["loss"]) == 1
        status, _, body = _get(url + "/")
        assert b"training monitor" in body
    finally:
        mon.close()
