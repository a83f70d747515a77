"""Train a 3D Gaussian Splatting model.

The TPU counterpart of the reference trainer (/root/reference/train.py):

    python train.py --path <colmap_scene_dir>            # e.g. T&T truck
    python train.py --synthetic                          # hermetic demo scene
    python train.py --path <dir> --batch 4 --mesh-data 4 # multi-chip batching

Saves reference-compatible .npy snapshots (loadable by the reference viewer
and forward_cpu.py) every --save-every epochs into --out.
"""

import argparse
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path", help="COLMAP dataset directory")
    ap.add_argument("--synthetic", action="store_true", help="train on a synthetic scene")
    ap.add_argument("--gs", help="initial gaussians (.ply/.npy) overriding SfM init")
    ap.add_argument("--resize-rate", type=float, default=0.25,
                    help="image downscale factor (reference uses 1; 0.25 fits memory)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "tiled", "dense"])
    ap.add_argument("--batch", type=int, default=1, help="cameras per step")
    ap.add_argument("--mesh-data", type=int, default=None,
                    help="data-axis size of the device mesh (default: auto)")
    ap.add_argument("--capacity", type=int, default=None, help="gaussian pool capacity")
    ap.add_argument("--max-patches", type=int, default=2**20)
    ap.add_argument("--no-adaptive-budget", action="store_true",
                    help="keep max_patches fixed (each budget change "
                         "recompiles the step; slow on tunneled backends)")
    ap.add_argument("--out", default="output")
    ap.add_argument("--save-every", type=int, default=10)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", help="checkpoint .npz to resume from")
    ap.add_argument("--debug-nans", action="store_true",
                    help="fail fast on NaNs (the reference's "
                         "torch detect_anomaly, train.py:11)")
    ap.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of the first epoch")
    ap.add_argument("--monitor-port", type=int, default=0,
                    help="serve a live training monitor (latest render + "
                         "loss/PSNR history) on this port during training")
    ap.add_argument("--preview", action="store_true",
                    help="save a render of camera 0 at each save interval")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize the JAX distributed runtime (on Cloud "
                         "TPU pods topology is auto-detected; elsewhere pass "
                         "--coordinator/--num-processes/--process-id or set "
                         "EGS_COORDINATOR/EGS_NUM_PROCESSES/EGS_PROCESS_ID)")
    ap.add_argument("--coordinator", help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.multihost or args.coordinator or args.num_processes:
        from easygaussiansplatting_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
        print(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local of {jax.device_count()} devices",
              flush=True)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.profile:
        try:
            jax.profiler.start_trace(args.profile)
        except Exception as e:  # tunneled backends may not support tracing
            print(f"profiler unavailable: {e}")
            args.profile = None

    from easygaussiansplatting_tpu.data.gau_io import load_gs, recarray_to_arrays, save_pool
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.loop import train

    if args.synthetic:
        from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images

        scene = make_synthetic_scene(seed=args.seed, n_gaussians=512, n_cams=8,
                                     width=128, height=96)
        cameras = scene["cameras"]
        gs = {k: scene[k] for k in ("pws", "rots", "scales", "alphas", "shs")}
        scene_size = scene["scene_size"]
        images = [np.asarray(im) for im in render_gt_images(scene)]
        # perturbed init: recover the ground truth
        rng = np.random.default_rng(args.seed)
        gs["pws"] = gs["pws"] + rng.normal(scale=0.03, size=gs["pws"].shape)
        gs["shs"] = gs["shs"] * 0.5
    elif args.path:
        from easygaussiansplatting_tpu.data.dataset import load_colmap_dataset

        print(f"loading {args.path} (resize {args.resize_rate}) ...")
        ds = load_colmap_dataset(args.path, resize_rate=args.resize_rate)
        cameras, images, scene_size = ds.cameras, ds.images, ds.scene_size
        rec = load_gs(args.gs) if args.gs else ds.gs
        gs = recarray_to_arrays(rec)
        print(f"{len(cameras)} cameras, {len(gs['pws'])} initial gaussians, "
              f"scene_size={scene_size:.2f}")
    else:
        ap.error("need --path or --synthetic")

    from easygaussiansplatting_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    config = TrainConfig(
        epochs=args.epochs, backend=args.backend, max_patches=args.max_patches,
        save_every_epochs=args.save_every,
        adaptive_budget=not args.no_adaptive_budget,
    )
    resume = {}
    if args.resume:
        pool, adam_state, stats, epoch0, key0 = load_checkpoint(args.resume)
        resume = dict(adam_state=adam_state, stats=stats, start_epoch=epoch0, key=key0)
        print(f"resumed from {args.resume} at epoch {epoch0} "
              f"(capacity {pool.capacity})")
    else:
        n0 = len(gs["pws"])
        capacity = args.capacity or int(config.capacity_headroom * n0)
        capacity = ((capacity + 255) // 256) * 256
        pool = pool_from_arrays(
            gs["pws"], gs["rots"], gs["scales"], gs["alphas"], gs["shs"],
            capacity=capacity,
        )
        print(f"pool capacity {capacity} ({n0} alive), backend={args.backend}, "
              f"devices={jax.device_count()}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    def log_fn(msg):
        print(f"{time.strftime('%H:%M:%S')} {msg}", flush=True)

    monitor = None
    if args.monitor_port and jax.process_index() == 0:
        # live in-browser preview during training (reference train.py:62-66
        # shows a matplotlib window per epoch; here the viewer server's
        # sibling streams the per-epoch render + history). Process 0 only:
        # other ranks never feed a frame, and co-hosted ranks would collide
        # on the port.
        from easygaussiansplatting_tpu.viewer.monitor import TrainingMonitor

        monitor = TrainingMonitor(cameras[0], config, port=args.monitor_port,
                                  log_fn=log_fn)

    def save_cb(epoch, pool, adam_state=None, stats=None, key=None, history=None):
        if monitor is not None:
            monitor.epoch_cb(epoch, pool, history=history)
        if jax.process_count() > 1:
            # collective-free local reassembly (pool layout is data-replicated)
            from easygaussiansplatting_tpu.parallel.distributed import fetch_to_host

            pool, adam_state, stats = fetch_to_host((pool, adam_state, stats))
        if args.profile and epoch == 1:
            jax.profiler.stop_trace()
            log_fn(f"wrote profiler trace to {args.profile}")
            args.profile = None
        if epoch % config.save_every_epochs == 0 or epoch == config.epochs:
            save_pool(out / f"epoch{epoch:04d}.npy", pool)
            if adam_state is not None:
                save_checkpoint(out / "checkpoint.npz", pool, adam_state, stats,
                                epoch=epoch, key=key)
            if args.preview:
                # headless counterpart of the reference's live matplotlib
                # preview (train.py:62-66)
                from PIL import Image

                from easygaussiansplatting_tpu.train.loop import render_pool_image

                img, _ = render_pool_image(pool, cameras[0], config, need_grads=False)
                arr = (np.clip(np.transpose(np.asarray(img), (1, 2, 0)), 0, 1) * 255)
                Image.fromarray(arr.astype(np.uint8)).save(out / f"preview{epoch:04d}.png")

    multihost = jax.process_count() > 1
    if multihost and jax.process_index() != 0:
        # host 0 owns narration and snapshots; other processes still run the
        # identical program (collectives keep them in lockstep)
        log_fn = lambda msg: None  # noqa: E731
        save_cb = None
    if args.batch > 1 or multihost:
        from easygaussiansplatting_tpu.parallel import make_mesh
        from easygaussiansplatting_tpu.parallel.loop import train_sharded

        if multihost:
            from easygaussiansplatting_tpu.parallel.distributed import make_multihost_mesh

            mesh = make_multihost_mesh(data=args.mesh_data)
            args.batch = max(args.batch, mesh.shape["data"])
        else:
            mesh = make_mesh(data=args.mesh_data)
        log_fn(f"mesh {dict(mesh.shape)}; batch={args.batch}")
        pool, history = train_sharded(
            pool, cameras, images, config, scene_size, mesh,
            batch=args.batch, seed=args.seed, log_fn=log_fn,
            eval_every=args.eval_every, epoch_cb=save_cb, **resume,
        )
    else:
        pool, history = train(
            pool, cameras, images, config, scene_size,
            seed=args.seed, log_fn=log_fn, eval_every=args.eval_every,
            epoch_cb=save_cb, **resume,
        )

    if multihost:
        from easygaussiansplatting_tpu.parallel.distributed import fetch_to_host

        pool = fetch_to_host(pool)
        if jax.process_index() != 0:
            return
    save_pool(out / "final.npy", pool)
    save_pool(out / "final.ply", pool)  # official-3DGS layout for external viewers
    if history["loss"]:
        log_fn(f"saved {out}/final.npy + .ply; last loss {history['loss'][-1]:.5f}")
    else:  # e.g. resumed at start_epoch >= epochs: nothing left to train
        log_fn(f"saved {out}/final.npy + .ply; no training steps ran")


if __name__ == "__main__":
    main()
