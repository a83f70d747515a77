"""Scaling benchmark: pixels/s of the sharded batched train step vs mesh size.

On a real multi-chip slice this produces the BASELINE.md scaling curve
(pixels/s at 1, 2, 4, ... chips; target >= 70% efficiency). On a single-chip
or CPU host it runs the same code over a *virtual* device mesh
(--xla_force_host_platform_device_count), which validates the sharded
program and measures collective overhead share, but NOT hardware speedup —
virtual devices time-share one host.

    python scripts/bench_scaling.py [--devices 8] [--width 256 --height 192]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--virtual", type=int, default=None,
                    help="force N virtual CPU devices")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--gaussians", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trials", type=int, default=5,
                    help="timed repetitions per mesh size; the MEDIAN trial "
                         "is reported (single timings on the virtual mesh "
                         "swing +-15% with host time-sharing noise — enough "
                         "to hide a real collective regression, VERDICT r3)")
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-process run (auto-detected topology "
                         "on Cloud TPU pods; elsewhere set EGS_COORDINATOR/"
                         "EGS_NUM_PROCESSES/EGS_PROCESS_ID). Measures the "
                         "full-mesh step only; compare against a single-host "
                         "run for the cross-host scaling efficiency row.")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.multihost:
        from easygaussiansplatting_tpu.parallel.distributed import init_distributed

        init_distributed()
        print(f"process {jax.process_index()}/{jax.process_count()}: "
              f"{jax.local_device_count()} local devices", flush=True)

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_pool, stack_cameras,
    )
    from easygaussiansplatting_tpu.parallel.train import shard_batch
    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.density import density_stats_init
    from easygaussiansplatting_tpu.train.optimizer import adam_init

    if args.multihost and jax.process_count() > 1:
        return _run_multihost(args)

    n_dev = args.devices or len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    if jax.default_backend() == "cpu" and not args.devices:
        # virtual CPU devices time-share one host and their collectives
        # serialize pathologically; 2 devices suffice to validate mechanism
        sizes = [d for d in sizes if d <= 2]
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    config = TrainConfig(backend=backend, max_patches=2**13, k_chunk=128, n_chunks=16)

    scene = make_synthetic_scene(
        seed=0, n_gaussians=args.gaussians, n_cams=max(sizes),
        width=args.width, height=args.height, log_scale_mean=-3.0,
    )
    gts = render_gt_images(scene, config)
    base = None
    rows = []
    for d in sizes:
        mesh = make_mesh(d, data=d)  # pure data parallelism over cameras
        cap = ((args.gaussians * 2 + 255) // 256) * 256
        pool = pool_from_arrays(
            scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
            scene["shs"], capacity=cap,
        )
        step = make_sharded_train_step(mesh, config, scene["scene_size"], 100)
        adam = adam_init(pool.params())
        stats = density_stats_init(pool.capacity)
        pool_s, adam, stats = shard_pool(mesh, pool, adam, stats)
        bcam = shard_batch(mesh, stack_cameras(scene["cameras"][:d]))
        gt = shard_batch(mesh, jnp.stack([jnp.asarray(g) for g in gts[:d]]))

        out = step(pool_s, adam, stats, bcam, gt)
        jax.block_until_ready(out)
        trial_dts = []
        for _ in range(max(1, args.trials)):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                pool_s, adam, stats, loss = step(pool_s, adam, stats, bcam, gt)
            jax.block_until_ready(loss)
            trial_dts.append((time.perf_counter() - t0) / args.steps)
        dt = float(np.median(trial_dts))
        pix_s = d * args.width * args.height / dt
        if base is None:
            base = pix_s
        eff = pix_s / (base * d)
        rows.append((d, dt * 1e3, pix_s / 1e6, eff))
        print(f"devices={d:3d}  step {dt*1e3:8.2f} ms  {pix_s/1e6:8.3f} Mpix/s  "
              f"efficiency {eff*100:5.1f}%", flush=True)

    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(rows[-1][3], 3),
        "unit": f"fraction at {rows[-1][0]} devices",
        "vs_baseline": round(rows[-1][3] / 0.70, 3),
    }))


def _run_multihost(args):
    """One timed run of the full process-spanning mesh (every process executes
    this in lockstep). Efficiency vs a single host = (this pixels/s) /
    (hosts x single-host pixels/s from a plain run)."""
    import time as _time

    import jax
    import numpy as np

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.parallel.distributed import (
        make_multihost_mesh, process_batch_rows, put_batch, put_replicated,
    )
    from easygaussiansplatting_tpu.parallel.train import stack_cameras
    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.density import density_stats_init
    from easygaussiansplatting_tpu.train.optimizer import adam_init
    from easygaussiansplatting_tpu.parallel.train import make_sharded_train_step

    mesh = make_multihost_mesh()
    batch = mesh.shape["data"]
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    config = TrainConfig(backend=backend, max_patches=2**13, k_chunk=128, n_chunks=16)

    scene = make_synthetic_scene(
        seed=0, n_gaussians=args.gaussians, n_cams=batch,
        width=args.width, height=args.height, log_scale_mean=-3.0,
    )
    gts = [np.asarray(g) for g in render_gt_images(scene, config)]
    cap = ((args.gaussians * 2 + 255) // 256) * 256
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
        scene["shs"], capacity=cap,
    )
    step = make_sharded_train_step(mesh, config, scene["scene_size"], 100)
    pool, adam, stats = put_replicated(
        mesh, (pool, adam_init(pool.params()), density_stats_init(pool.capacity))
    )
    rows = process_batch_rows(mesh, batch)
    bcam = put_batch(mesh, stack_cameras([scene["cameras"][i] for i in rows]))
    gt = put_batch(mesh, np.stack([gts[i] for i in rows]))

    # establish the cross-process collective contexts with a fast-compiling
    # program first: context rendezvous times out (~30 s) and the big step's
    # compile skew between processes can exceed that on loaded hosts
    import jax.numpy as jnp

    jax.block_until_ready(jax.jit(jnp.sum)(gt))

    out = step(pool, adam, stats, bcam, gt)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    for _ in range(args.steps):
        pool, adam, stats, loss = step(pool, adam, stats, bcam, gt)
    jax.block_until_ready(loss)
    dt = (_time.perf_counter() - t0) / args.steps
    pix_s = batch * args.width * args.height / dt
    if jax.process_index() == 0:
        print(f"{jax.process_count()} hosts, {jax.device_count()} devices: "
              f"step {dt*1e3:.2f} ms  {pix_s/1e6:.3f} Mpix/s  loss {float(loss):.5f}",
              flush=True)
        print(json.dumps({
            "metric": "multihost_pixels_per_s",
            "value": round(pix_s / 1e6, 6),
            "unit": f"Mpix/s over {jax.process_count()} hosts",
            "vs_baseline": 0.0,
        }))


if __name__ == "__main__":
    main()
