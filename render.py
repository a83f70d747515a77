"""Render a trained Gaussian set to an image.

The TPU counterpart of the reference's forward_gpu.py / forward_cpu.py:
loads a .ply/.npy Gaussian file (or the 4-Gaussian example fixture), renders
it with the chosen backend, and writes a PNG. The default camera is the
reference's hard-coded evaluation view (/root/reference/forward_cpu.py:19-31).

    python render.py --gs trained.ply --out out.png
    python render.py --backend golden            # float64 NumPy oracle
    python render.py --path <colmap_dir> --cam-index 0
"""

import argparse

import numpy as np


def reference_camera(width=979, height=546):
    from easygaussiansplatting_tpu.models import Camera

    Rcw = np.array(
        [
            [0.89699204, 0.06525223, 0.43720409],
            [-0.04508268, 0.99739184, -0.05636552],
            [-0.43974177, 0.03084909, 0.89759429],
        ]
    ).T
    return Camera.from_dict(
        {
            "Rcw": Rcw,
            "tcw": np.array([1.03796196, 0.42017467, 4.67804612]),
            "fx": 581.6273640151177, "fy": 578.140202494143,
            "cx": width / 2, "cy": height / 2,
            "width": width, "height": height,
        }
    )


def load_gaussians(args):
    from easygaussiansplatting_tpu.data import example_camera, example_gaussians
    from easygaussiansplatting_tpu.data.gau_io import load_gs, recarray_to_arrays

    if args.gs:
        print(f"loading {args.gs}")
        return recarray_to_arrays(load_gs(args.gs))
    print("no gaussian file given; rendering the 4-gaussian example fixture")
    g = example_gaussians()
    return {k + "s" if not k.endswith("s") else k: v for k, v in g.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gs", help="trained gaussians (.ply or .npy)")
    ap.add_argument("--path", help="COLMAP dataset dir (use its cameras)")
    ap.add_argument("--cam-index", type=int, default=0)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "tiled", "dense", "golden"])
    ap.add_argument("--width", type=int, default=979)
    ap.add_argument("--height", type=int, default=546)
    ap.add_argument("--resize-rate", type=float, default=1.0)
    ap.add_argument("--out", default="render.png")
    ap.add_argument("--max-patches", type=int, default=2**20)
    args = ap.parse_args()

    gs = load_gaussians(args)
    if args.gs is None and args.path is None:
        from easygaussiansplatting_tpu.data import example_camera
        from easygaussiansplatting_tpu.models import Camera

        cam = Camera.from_dict(example_camera())
    elif args.path:
        from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset

        ds = load_colmap_dataset(args.path, resize_rate=args.resize_rate, load_images=False)
        cam = ds.cameras[args.cam_index]
    else:
        cam = reference_camera(args.width, args.height)

    if args.backend == "golden":
        from easygaussiansplatting_tpu import golden

        img, _ = golden.render(
            gs["pws"], gs["shs"], gs["alphas"], gs["scales"], gs["rots"],
            np.asarray(cam.Rcw, np.float64), np.asarray(cam.tcw, np.float64),
            float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            cam.width, cam.height,
        )
    else:
        import jax
        import jax.numpy as jnp

        from easygaussiansplatting_tpu.ops.rasterize import render

        sh_dim = gs["shs"].shape[1] if gs["shs"].ndim > 1 else 3
        n_bases = max(1, sh_dim // 3)
        degree = int(np.sqrt(n_bases)) - 1
        img, _ = render(
            jnp.asarray(gs["pws"], jnp.float32),
            jnp.asarray(gs["shs"].reshape(len(gs["pws"]), -1), jnp.float32),
            jnp.asarray(gs["alphas"], jnp.float32).reshape(-1),
            jnp.asarray(gs["scales"], jnp.float32),
            jnp.asarray(gs["rots"], jnp.float32),
            cam, backend=args.backend, max_patches=args.max_patches,
            sh_degree=degree,
        )
        img = np.asarray(jax.block_until_ready(img))

    from PIL import Image

    arr = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(args.out)
    print(f"wrote {args.out} ({cam.width}x{cam.height}, backend={args.backend}, "
          f"mean={float(img.mean()):.4f})")


if __name__ == "__main__":
    main()
