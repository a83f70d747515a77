"""Interactive web viewer: TPU-rendered frames streamed to a browser.

The TPU-native counterpart of the reference's OpenGL/Qt viewer
(/root/reference/viewer/viewer.py:124, viewer/custom_items/gaussian_item.py:271):
instead of an instanced-quad GL pipeline on a local GPU, the full splatting
renderer runs server-side on the TPU and the browser is a thin canvas —
mouse orbit/pan/zoom posts camera poses to `/render`, which returns a JPEG.
No Qt/OpenGL dependency; works over SSH tunnels.

Feature parity map (reference -> here):
* orbit / pan / zoom mouse controls (viewer.py:60-114) -> index.html JS
* settings window, key M (viewer.py:12-51)            -> settings panel
* render modes normal / ball / inverse
  (gaussian_item.py:71-87, gau_frag.glsl:29-40)       -> `mode` query param
* dataset camera frusta overlay (gaussian_viewer.py:24-60,
  camera_frame_item.py) -> `markers=1`: oriented wireframe frusta built
  from each camera's true pose/intrinsics with the photograph shown as
  flat gaussian texels on the image plane (viewer/headless.camera_frusta)
* point-cloud overlay (CloudItem, cloud_item.py)      -> `cloud=1` with
  `cloud_mode` = rgb | flat | intensity | rainbow (the reference's
  settings-panel color modes; rainbow maps height through the same
  5-segment ramp, utils/image.py rainbow_sh)

All overlay/mode switches keep the gaussian count and image shape static, so
every view reuses ONE jitted render: overlays toggle by zeroing their
alphas (traced), modes transform the input arrays (same shapes) — the jit
cache never grows past one entry per resolution.
"""

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

from easygaussiansplatting_tpu.data.synthetic import look_at_camera

_SH_C0 = 0.28209479177387814
MODES = ("normal", "ball", "inverse")
CLOUD_MODES = ("rgb", "flat", "intensity", "rainbow")


def _as_f32(a, shape2=None):
    a = np.asarray(a, np.float32)
    return a.reshape(len(a), -1) if shape2 else a


class SceneRenderer:
    """One scene + one jitted TPU render; thread-safe (the chip is one)."""

    def __init__(self, gaussians, dataset_cameras=(), cloud=None,
                 backend=None, max_patches=2**20, marker_skip=5,
                 dataset_images=None):
        import jax

        self.lock = threading.Lock()
        self.backend = backend or ("pallas" if jax.default_backend() == "tpu" else "tiled")
        self.max_patches = max_patches

        a = {k: np.asarray(v, np.float32) for k, v in gaussians.items()}
        n = len(a["pws"])
        a["shs"] = a["shs"].reshape(n, -1)
        a["alphas"] = a["alphas"].reshape(n)
        self.sh_degree = int(np.sqrt(max(1, a["shs"].shape[1] // 3))) - 1

        # overlay blocks are appended once; toggles only zero their alphas
        self.blocks = [("scene", a)]
        self.dataset_cameras = list(dataset_cameras)
        if self.dataset_cameras:
            from easygaussiansplatting_tpu.viewer.headless import camera_frusta

            skip = max(1, marker_skip)
            cams_sel = self.dataset_cameras[::skip]
            imgs_sel = (list(dataset_images)[::skip]
                        if dataset_images is not None else None)
            m = camera_frusta(cams_sel, images=imgs_sel)
            self.blocks.append(("markers", self._pad_sh(m, a["shs"].shape[1])))
        self._cloud_z = None
        if cloud is not None and len(cloud["pws"]):
            self.blocks.append(("cloud", self._pad_sh(cloud, a["shs"].shape[1])))
            self._cloud_z = np.asarray(cloud["pws"], np.float32)[:, 2]

        self.full = {
            k: np.concatenate([_as_f32(b[k]).reshape(len(b["pws"]), -1)
                               for _, b in self.blocks]).squeeze()
            for k in ("pws", "rots", "scales", "alphas", "shs")
        }
        self.full["shs"] = self.full["shs"].reshape(len(self.full["pws"]), -1)
        self.slices = {}
        off = 0
        for name, b in self.blocks:
            self.slices[name] = slice(off, off + len(b["pws"]))
            off += len(b["pws"])

        pws = self.full["pws"]
        self.center = pws[self.slices["scene"]].mean(0).tolist()
        self.radius = 2.5 * float(np.percentile(
            np.linalg.norm(pws[self.slices["scene"]] - np.float32(self.center), axis=1), 90
        ))
        self._jit_cache = {}
        self._dev_cache = {}  # appearance key -> device-resident params

    @staticmethod
    def _pad_sh(block, sh_width):
        b = {k: np.asarray(v, np.float32) for k, v in block.items()}
        sh = np.zeros((len(b["pws"]), sh_width), np.float32)
        sh[:, : b["shs"].shape[1]] = b["shs"].reshape(len(b["pws"]), -1)
        b["shs"] = sh
        return b

    def _render_fn(self, width, height):
        """One jitted (params, cam) -> [3,H,W] render per resolution."""
        import jax

        key = (width, height)
        if key not in self._jit_cache:
            import jax.numpy as jnp

            from easygaussiansplatting_tpu.ops.rasterize import render

            @jax.jit
            def fn(pws, shs, alphas, scales, rots, cam):
                img, _ = render(
                    pws, shs, alphas, scales, rots, cam,
                    backend=self.backend, max_patches=self.max_patches,
                    sh_degree=self.sh_degree, need_grads=False,
                )
                return jnp.clip(img, 0.0, 1.0)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    LORES_DIV = 4  # drag-preview downscale (one extra jit cache entry)

    def render(self, *, azimuth=0.0, elevation=0.3, radius=None, center=None,
               width=640, height=480, mode="normal", markers=False, cloud=False,
               axes=False, grid=False, fov_f=0.9, cloud_mode="rgb", lores=False):
        """Render one view; returns [H,W,3] uint8.

        `lores`: render at 1/LORES_DIV resolution — the interactive-drag
        preview (the browser scales it back up; a full-resolution frame
        follows on mouse release). The TPU-side counterpart of the reference
        viewer's drag trick of re-sorting only when the view z-axis moves
        (gaussian_item.py:225-237): there the expensive step is the sort,
        here it is pixels, so the preview cuts pixels 16x instead. The
        camera is rebuilt from the same fov_f, so fx scales with width and
        the field of view is identical."""
        import jax

        if lores:
            width = max(64, width // self.LORES_DIV)
            height = max(48, height // self.LORES_DIV)
        center = np.asarray(center if center is not None else self.center, np.float64)
        radius = float(radius or self.radius)
        pos = center + radius * np.array([
            np.cos(elevation) * np.cos(azimuth),
            np.cos(elevation) * np.sin(azimuth),
            np.sin(elevation),
        ])
        cam = look_at_camera(pos, center, width, height, fov_f * width, cam_id=0)

        with self.lock:  # one chip: uploads and renders are serialized
            dev = self._device_params(markers=markers, cloud=cloud,
                                      cloud_mode=cloud_mode, mode=mode)
            fn = self._render_fn(width, height)
            img = fn(*dev, cam)
            img = np.asarray(jax.block_until_ready(img))
        out = (np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8)
        if axes or grid:
            out = self._draw_overlays(out, cam, axes=axes, grid=grid)
        return out

    def _device_params(self, *, markers, cloud, cloud_mode, mode):
        """Device-resident (pws, shs, alphas, scales, rots) per appearance.

        The per-frame mutations (overlay alpha toggles, cloud color modes,
        ball/inverse render modes) depend only on these toggles — NOT on the
        camera — so each combination is built once and kept on the chip.
        Re-uploading the raw numpy params every frame cost ~16 MB of
        host->device tunnel traffic per frame (~0.5 s/frame measured,
        scripts/viewer_fps.py); a cache hit costs nothing.

        Keys are normalized so toggles that cannot change the params never
        mint a new entry (markers/cloud without the matching block,
        cloud_mode with cloud off), and the cache is LRU-bounded: raw HTTP
        query values must not grow HBM for the server's lifetime. Invalid
        mode / cloud_mode strings are rejected upstream (HTTP 400)."""
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        if cloud_mode not in CLOUD_MODES:
            raise ValueError(
                f"cloud_mode must be one of {CLOUD_MODES}, got {cloud_mode!r}"
            )
        markers = bool(markers) and "markers" in self.slices
        cloud = bool(cloud) and "cloud" in self.slices
        if not cloud:
            cloud_mode = "rgb"
        key = (markers, cloud, cloud_mode, mode)
        if key in self._dev_cache:
            self._dev_cache[key] = self._dev_cache.pop(key)  # LRU touch
            return self._dev_cache[key]
        import jax

        a = {k: v.copy() for k, v in self.full.items()}
        if not markers and "markers" in self.slices:
            a["alphas"][self.slices["markers"]] = 0.0
        if not cloud and "cloud" in self.slices:
            a["alphas"][self.slices["cloud"]] = 0.0
        elif cloud and "cloud" in self.slices and cloud_mode != "rgb":
            # reference CloudItem color modes (cloud_item.py settings combo):
            # flat single color, grayscale intensity, height rainbow
            cs = self.slices["cloud"]
            if cloud_mode == "flat":
                a["shs"][cs, :3] = (np.float32([0.95, 0.85, 0.25]) - 0.5) / _SH_C0
            elif cloud_mode == "intensity":
                rgb = a["shs"][cs, :3] * _SH_C0 + 0.5
                lum = (0.2126 * rgb[:, 0] + 0.7152 * rgb[:, 1]
                       + 0.0722 * rgb[:, 2])[:, None]
                a["shs"][cs, :3] = (lum - 0.5) / _SH_C0
            elif cloud_mode == "rainbow" and self._cloud_z is not None:
                from easygaussiansplatting_tpu.utils.image import rainbow_sh

                z = self._cloud_z
                a["shs"][cs, :3] = rainbow_sh(z, float(z.min()), float(z.max()) + 1e-6)
        if mode == "ball":
            # hard opaque discs (reference gau_frag.glsl:31-34: alpha' > 0.3
            # -> 1): saturate opacity, tighten the footprint
            s = self.slices["scene"]
            a["alphas"][s] = np.where(a["alphas"][s] > 0.0, 0.99, 0.0)
            a["scales"][s] = a["scales"][s] * 0.6
        elif mode == "inverse":
            # color = sum c.Y + 0.5 -> negating coefficients gives 1 - color
            # (reference gau_frag.glsl:36-38)
            s = self.slices["scene"]
            a["shs"][s] = -a["shs"][s]

        dev = tuple(jax.device_put(a[k])
                    for k in ("pws", "shs", "alphas", "scales", "rots"))
        self._dev_cache[key] = dev
        while len(self._dev_cache) > self.DEV_CACHE_MAX:
            stale = next(iter(self._dev_cache))
            del self._dev_cache[stale]
        return dev

    # bound on device-resident param sets (~16 MB each at bench scale)
    DEV_CACHE_MAX = 8

    def _draw_overlays(self, img_u8, cam, *, axes=False, grid=False):
        """World-space axis / ground-grid line overlays, projected with the
        render camera and drawn on the frame — the counterpart of the
        reference viewer's GLAxisItem / GridItem
        (/root/reference/viewer/custom_items/{axis,grid}_item.py)."""
        from PIL import Image, ImageDraw

        im = Image.fromarray(img_u8)
        d = ImageDraw.Draw(im)
        R = np.asarray(cam.Rcw, np.float64)
        t = np.asarray(cam.tcw, np.float64)
        fx, fy = float(cam.fx), float(cam.fy)
        cx, cy = float(cam.cx), float(cam.cy)

        def draw(p0, p1, color, w=1):
            a = R @ np.asarray(p0, np.float64) + t
            b = R @ np.asarray(p1, np.float64) + t
            if a[2] < 0.2 or b[2] < 0.2:  # either end behind the camera
                return
            ua = (a[0] * fx / a[2] + cx, a[1] * fy / a[2] + cy)
            ub = (b[0] * fx / b[2] + cx, b[1] * fy / b[2] + cy)
            d.line([ua, ub], fill=color, width=w)

        s = max(1.0, round(self.radius / 2.5))
        if grid:
            for i in np.arange(-s, s + 0.5):
                draw((i, -s, 0), (i, s, 0), (90, 90, 90))
                draw((-s, i, 0), (s, i, 0), (90, 90, 90))
        if axes:
            draw((0, 0, 0), (s, 0, 0), (235, 70, 70), 2)   # +x red
            draw((0, 0, 0), (0, s, 0), (70, 235, 70), 2)   # +y green
            draw((0, 0, 0), (0, 0, s), (90, 90, 245), 2)   # +z blue
        return np.asarray(im)

    def info(self):
        return {
            "n_gaussians": int(self.slices["scene"].stop),
            "n_dataset_cameras": len(self.dataset_cameras),
            "has_cloud": "cloud" in self.slices,
            "center": self.center,
            "radius": self.radius,
            "backend": self.backend,
            "sh_degree": self.sh_degree,
            "modes": list(MODES),
            "cloud_modes": ["rgb", "flat", "intensity", "rainbow"],
        }


def _encode(img_u8, fmt="jpeg", quality=90):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(
        buf, format="JPEG" if fmt == "jpeg" else "PNG",
        **({"quality": quality} if fmt == "jpeg" else {}),
    )
    return buf.getvalue(), ("image/jpeg" if fmt == "jpeg" else "image/png")


def make_handler(renderer):
    index_html = (Path(__file__).parent / "index.html").read_text()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[-1] for k, v in parse_qs(url.query).items()}
            try:
                if url.path in ("/", "/index.html"):
                    self._send(200, index_html.encode(), "text/html")
                elif url.path == "/info":
                    self._send(200, json.dumps(renderer.info()).encode(),
                               "application/json")
                elif url.path == "/render":
                    if q.get("mode", "normal") not in MODES or \
                            q.get("cloud_mode", "rgb") not in CLOUD_MODES:
                        self._send(400, b"bad mode/cloud_mode", "text/plain")
                        return
                    img = renderer.render(
                        azimuth=float(q.get("az", 0.0)),
                        elevation=float(q.get("el", 0.3)),
                        radius=float(q["r"]) if "r" in q else None,
                        center=[float(q["cx"]), float(q["cy"]), float(q["cz"])]
                        if "cx" in q else None,
                        width=int(q.get("w", 640)),
                        height=int(q.get("h", 480)),
                        mode=q.get("mode", "normal"),
                        markers=q.get("markers", "0") == "1",
                        cloud=q.get("cloud", "0") == "1",
                        axes=q.get("axes", "0") == "1",
                        grid=q.get("grid", "0") == "1",
                        fov_f=float(q.get("fov", 0.9)),
                        cloud_mode=q.get("cloud_mode", "rgb"),
                        lores=q.get("lores", "0") == "1",
                    )
                    body, ctype = _encode(img, q.get("fmt", "jpeg"))
                    self._send(200, body, ctype)
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # surface errors to the browser console
                self._send(500, f"{type(e).__name__}: {e}".encode(), "text/plain")

    return Handler


def serve(renderer, port=8080, host="127.0.0.1"):
    httpd = ThreadingHTTPServer((host, port), make_handler(renderer))
    print(f"viewer: http://{host}:{port}/  (ctrl-c to stop)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
