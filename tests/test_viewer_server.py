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
