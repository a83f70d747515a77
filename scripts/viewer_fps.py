"""Measure the interactive viewer's real frame rates: full-res and drag-preview.

Drives the actual `SceneRenderer.render` the web viewer serves frames with
(viewer/server.py) — TPU render + uint8 image readback per frame, exactly
what a browser request costs minus HTTP/JPEG. The drag preview renders at
1/LORES_DIV resolution while the mouse is down (one extra jit cache entry)
and the browser upscales — the TPU-appropriate version of the reference
viewer's re-sort-only-on-view-change trick
(/root/reference/viewer/custom_items/gaussian_item.py:225-237).

Prints ms/frame and fps for both paths; record in BASELINE.md. Over the
axon tunnel the image readback dominates the preview path — local-host
serving would be faster still.
"""

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
from easygaussiansplatting_tpu.viewer.server import SceneRenderer

W, H, N = 979, 546, 65536


def main():
    scene = make_synthetic_scene(seed=0, n_gaussians=N, n_cams=1, width=W,
                                 height=H, log_scale_mean=-3.6)
    shs = np.zeros((N, 48), np.float32)
    shs[:, :3] = scene["shs"]
    gaussians = {
        "pws": scene["pws"], "shs": shs, "alphas": scene["alphas"],
        "scales": scene["scales"], "rots": scene["rots"],
    }
    r = SceneRenderer(gaussians, max_patches=573440)

    for label, lores in (("full", False), ("drag-preview", True)):
        kw = dict(width=W, height=H, lores=lores)
        r.render(**kw)  # compile + warm
        iters, best = 10, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                frame = r.render(azimuth=0.01, **kw)
            best = min(best, (time.perf_counter() - t0) / iters)
        h, w = frame.shape[:2]
        print(f"{label:14s} {w}x{h:4d}  {best * 1e3:7.2f} ms/frame  "
              f"{1.0 / best:6.1f} fps", flush=True)


if __name__ == "__main__":
    main()
