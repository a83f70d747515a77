"""Gaussian viewer: interactive web viewer or headless turntable render.

The TPU counterpart of the reference's interactive viewer entry
(/root/reference/gaussian_viewer.py):

* `--serve` starts an interactive web viewer (mouse orbit/pan/zoom, render
  modes, dataset-camera + point-cloud overlays) with frames rendered on the
  TPU — the reference's Qt/OpenGL window replaced by a browser page
  (viewer/server.py).
* without `--serve`, renders a headless orbit to an animated GIF / PNGs.

Exported .npy/.ply files additionally stay loadable by the reference's own
OpenGL viewer for local-GPU use.

    python gaussian_viewer.py --gs trained.ply --serve --port 8080
    python gaussian_viewer.py --gs trained.ply --out orbit.gif
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--serve", action="store_true",
                    help="start the interactive web viewer")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--gs", help="gaussians (.ply/.npy); default: example fixture")
    ap.add_argument("--path", help="COLMAP dataset dir: overlay its cameras "
                                   "as oriented, image-textured frusta "
                                   "(reference camera_frame_item.py)")
    ap.add_argument("--skip", type=int, default=5,
                    help="show every skip-th dataset camera (reference --skip)")
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--radius", type=float, default=None)
    ap.add_argument("--elevation", type=float, default=0.35)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "tiled"])
    ap.add_argument("--mode", default="normal", choices=["normal", "ball", "inverse"],
                    help="render mode (reference GaussianItem combo, "
                         "gaussian_item.py:71-87): ball = hard opaque discs, "
                         "inverse = negated colors")
    ap.add_argument("--out", default="orbit.gif")
    ap.add_argument("--save-frames", help="also write PNG frames with this prefix")
    args = ap.parse_args()

    import numpy as np

    from easygaussiansplatting_tpu.viewer.headless import (
        orbit_cameras,
        render_turntable,
        save_frames,
        save_gif,
    )

    if args.gs:
        from easygaussiansplatting_tpu.data.gau_io import load_gs, recarray_to_arrays

        a = recarray_to_arrays(load_gs(args.gs))
    else:
        from easygaussiansplatting_tpu.data import example_gaussians

        g = example_gaussians()
        a = {"pws": g["pws"], "rots": g["rots"], "scales": g["scales"],
             "alphas": g["alphas"], "shs": g["shs"]}

    if args.serve:
        from easygaussiansplatting_tpu.viewer.server import SceneRenderer, serve

        dataset_cameras, dataset_images, cloud = (), None, None
        if args.path:
            from easygaussiansplatting_tpu.data.dataset import (
                load_colmap_dataset,
                load_image,
            )
            from easygaussiansplatting_tpu.data.gau_io import recarray_to_arrays

            ds = load_colmap_dataset(args.path, load_images=False)
            dataset_cameras = ds.cameras
            # lazy thumbnails for the frustum image planes: only the shown
            # (every skip-th) cameras, at 1/8 resolution
            dataset_images = [None] * len(ds.cameras)
            if ds.image_paths:
                for i in range(0, len(ds.cameras), max(1, args.skip)):
                    try:
                        dataset_images[i] = load_image(ds.image_paths[i], 0.125)
                    except OSError:
                        pass
            # SfM points as a fixed-size point-cloud overlay (reference
            # CloudItem); reuse the init gaussians' positions/colors
            c = recarray_to_arrays(ds.gs)
            spread = float(np.percentile(
                np.linalg.norm(c["pws"] - c["pws"].mean(0), axis=1), 90)) or 1.0
            cloud = {
                "pws": c["pws"],
                "rots": c["rots"],
                "scales": np.full_like(c["scales"], 0.002 * spread),
                "alphas": np.full_like(np.asarray(c["alphas"]).reshape(-1), 0.9),
                "shs": np.asarray(c["shs"], np.float32).reshape(len(c["pws"]), -1)[:, :3],
            }
        renderer = SceneRenderer(
            a, dataset_cameras=dataset_cameras, dataset_images=dataset_images,
            cloud=cloud,
            backend=None if args.backend == "pallas" else args.backend,
            marker_skip=args.skip,
        )
        serve(renderer, port=args.port, host=args.host)
        return

    if args.path:
        from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset
        from easygaussiansplatting_tpu.viewer.headless import camera_markers

        ds = load_colmap_dataset(args.path, load_images=False)
        markers = camera_markers(ds.cameras[:: max(1, args.skip)])
        sw = np.asarray(a["shs"], np.float32).reshape(len(a["pws"]), -1).shape[1]
        msh = np.zeros((len(markers["pws"]), sw), np.float32)
        msh[:, :3] = markers["shs"]
        markers["shs"] = msh
        a = {k: np.concatenate(
            [np.asarray(a[k], np.float32).reshape(len(a["pws"]), -1).squeeze(),
             markers[k].squeeze()]) for k in a}

    if args.mode == "ball":
        a["alphas"] = np.full_like(np.asarray(a["alphas"], np.float32), 0.99)
        a["scales"] = np.asarray(a["scales"], np.float32) * 0.6
    elif args.mode == "inverse":
        # color = sum c.Y + 0.5, so negating the coefficients gives 1 - color
        a["shs"] = -np.asarray(a["shs"], np.float32)

    cameras = None
    if args.radius is not None:
        center = np.asarray(a["pws"], np.float64).mean(0)
        cameras = orbit_cameras(
            center, args.radius, n_frames=args.frames,
            width=args.width, height=args.height, elevation=args.elevation,
        )

    frames = render_turntable(
        a, cameras, backend=args.backend,
        n_frames=args.frames, width=args.width, height=args.height,
        elevation=args.elevation,
    )
    if args.out:
        save_gif(args.out, frames)
        print(f"wrote {args.out} ({len(frames)} frames, {args.width}x{args.height})")
    if args.save_frames:
        save_frames(args.save_frames, frames)
        print(f"wrote {len(frames)} PNGs at {args.save_frames}*")


if __name__ == "__main__":
    main()
