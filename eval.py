"""Evaluate a trained Gaussian model: PSNR / SSIM / L1 over dataset views.

The reference has no evaluation tool at all (it never computes PSNR,
SURVEY.md §5); this closes the gap and feeds the time-to-PSNR benchmark
contract (BASELINE.md).

    python eval.py --gs output/final.npy --path <colmap_scene> [--resize-rate 0.25]
    python eval.py --gs output/final.npy --synthetic   # hermetic check
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gs", required=True, help="trained gaussians (.ply/.npy)")
    ap.add_argument("--path", help="COLMAP dataset directory")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--resize-rate", type=float, default=0.25)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "tiled"])
    ap.add_argument("--max-patches", type=int, default=2**20)
    ap.add_argument("--max-views", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.data.gau_io import load_gs, recarray_to_arrays
    from easygaussiansplatting_tpu.ops.loss import ssim
    from easygaussiansplatting_tpu.ops.rasterize import render
    from easygaussiansplatting_tpu.utils.image import psnr

    if args.synthetic:
        from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images

        scene = make_synthetic_scene(seed=0, n_gaussians=512, n_cams=8, width=128, height=96)
        cameras = scene["cameras"]
        images = render_gt_images(scene)
    elif args.path:
        from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset

        ds = load_colmap_dataset(args.path, resize_rate=args.resize_rate)
        cameras, images = ds.cameras, ds.images
    else:
        ap.error("need --path or --synthetic")

    a = recarray_to_arrays(load_gs(args.gs))
    shs = a["shs"].reshape(len(a["pws"]), -1)
    degree = int(np.sqrt(max(1, shs.shape[1] // 3))) - 1
    gs_args = (
        jnp.asarray(a["pws"], jnp.float32),
        jnp.asarray(shs, jnp.float32),
        jnp.asarray(a["alphas"], jnp.float32).reshape(-1),
        jnp.asarray(a["scales"], jnp.float32),
        jnp.asarray(a["rots"], jnp.float32),
    )

    n = len(cameras) if args.max_views is None else min(args.max_views, len(cameras))
    rows = []
    for i in range(n):
        cam = cameras[i]
        img, _ = render(*gs_args, cam, need_grads=False, backend=args.backend,
                        max_patches=args.max_patches, sh_degree=degree)
        gt = jnp.asarray(images[i], jnp.float32)
        img = jnp.clip(img, 0.0, 1.0)
        rows.append((
            float(psnr(img, jnp.clip(gt, 0, 1))),
            float(ssim(img, gt)),
            float(jnp.mean(jnp.abs(img - gt))),
        ))
        print(f"view {cam.id:4d}: psnr {rows[-1][0]:6.2f}  ssim {rows[-1][1]:.4f}  l1 {rows[-1][2]:.4f}")

    arr = np.array(rows)
    print(f"\nmean over {n} views: psnr {arr[:,0].mean():.2f}  "
          f"ssim {arr[:,1].mean():.4f}  l1 {arr[:,2].mean():.4f}")


if __name__ == "__main__":
    main()
