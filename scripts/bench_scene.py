"""Standing large-scale training benchmark: time-to-PSNR-25.

The T&T *truck* dataset (the reference's recipe, /root/reference/train.py:40,
README.md:59-66; BASELINE.md north star "time-to-PSNR-25") cannot be
downloaded in this environment, so this is the frozen stand-in: a
deterministic synthetic scene at truck-like scale —

  * 100,000 ground-truth gaussians (trained-scene splat statistics),
  * 100 cameras at 979x546 (the reference's evaluation resolution,
    forward_cpu.py:19-27; ~250 images on the real truck),
  * SfM-like initialisation: a jittered ~60% subsample of the ground-truth
    positions with quantised colors through the reference's init recipe
    (points_to_gaussians: identity rotations, alpha 0.8, NN-distance scales).

Training follows the reference recipe (densify/prune/alpha-reset cadence)
until mean eval PSNR over 4 held-out-style views reaches 25 (or --epochs).
Record the printed time_to_psnr25 row in BASELINE.md each round.

    python scripts/bench_scene.py            # full run (one TPU chip)
    python scripts/bench_scene.py --smoke    # tiny shapes, CI-sized
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root


import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--target-psnr", type=float, default=25.0)
    ap.add_argument("--smoke", action="store_true", help="tiny CI-sized run")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--realism", action="store_true",
                    help="harder preset: per-image photometric noise + "
                         "exposure jitter, a textured background shell, and "
                         "a decimated (25%%), strongly-jittered SfM init — "
                         "reconstructing gaussians from their own clean "
                         "renders understates densification work vs real "
                         "photos (VERDICT r2). Separate baseline row.")
    ap.add_argument("--oracle-gt", action="store_true",
                    help="no training: evaluate the GROUND-TRUTH pool "
                         "(every scene gaussian at its true parameters) "
                         "against the (noisy, for --realism) eval views and "
                         "print the PSNR. This is the reconstruction upper "
                         "bound: if even the true scene saturates below the "
                         "target on the realism preset, the 'PSNR-25 is a "
                         "capacity wall' claim holds; if it clears 25, the "
                         "trainer is leaving PSNR on the table (VERDICT r4 "
                         "#4).")
    ap.add_argument("--cap-factor", type=float, default=None,
                    help="override the pool-capacity factor (default 2.5, "
                         "realism 5.0) — the VERDICT r4 #4 oracle (b) runs "
                         "--realism --cap-factor 10 --epochs 100")
    ap.add_argument("--full", action="store_true",
                    help="full-regime run (VERDICT r3 item 4): do NOT stop "
                         "at the PSNR target — run the reference recipe "
                         "through the whole densify window (every 5 epochs "
                         "<= 50, alpha reset every 15) with the ADAPTIVE "
                         "budget ladder on, and emit the per-epoch "
                         "psnr/wall/alive/budget curve as JSON. Exercises "
                         "the pool growth + ladder switches the stop-at-25 "
                         "run never reaches.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.data.dataset import points_to_gaussians
    from easygaussiansplatting_tpu.data.gau_io import recarray_to_arrays
    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.train.config import TrainConfig
    from easygaussiansplatting_tpu.train.loop import train
    from easygaussiansplatting_tpu.utils.image import psnr

    if args.smoke:
        n_gt, n_cams, width, height = 2000, 8, 160, 112
        max_patches = 2**15
    else:
        n_gt, n_cams, width, height = 100_000, 100, 979, 546
        max_patches = 2**20

    # FROZEN scene: seed and shape constants define the benchmark; do not
    # change them without re-baselining BASELINE.md.
    scene = make_synthetic_scene(
        seed=42, n_gaussians=n_gt, n_cams=n_cams, width=width, height=height,
        log_scale_mean=-3.4,
    )
    if args.realism:
        # textured background shell: gaussians on a far sphere around the
        # camera ring, so every view has non-empty background to model
        brng = np.random.default_rng(1234)
        n_bg = max(64, n_gt // 8)
        dirs = brng.normal(size=(n_bg, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        shell_r = 2.2 * scene["scene_size"]
        bg_rots = brng.normal(size=(n_bg, 4))
        bg_rots /= np.linalg.norm(bg_rots, axis=1, keepdims=True)
        scene = {**scene}
        scene["pws"] = np.concatenate([scene["pws"], dirs * shell_r])
        scene["rots"] = np.concatenate([scene["rots"], bg_rots])
        scene["scales"] = np.concatenate([
            scene["scales"],
            np.exp(brng.normal(size=(n_bg, 3)) * 0.3 - 1.0),
        ])
        scene["alphas"] = np.concatenate([
            scene["alphas"], 0.4 + 0.5 * brng.random(n_bg)])
        scene["shs"] = np.concatenate([
            scene["shs"], brng.normal(size=(n_bg, 3)) * 0.6])
    config = TrainConfig(
        epochs=args.epochs, backend="pallas" if jax.default_backend() == "tpu"
        else "tiled", max_patches=max_patches,
        # fixed budget for the standing time-to-25 row: that benchmark wants
        # one compile, not an adaptive resize schedule (first compile over
        # the tunnel is minutes). The --full regime instead turns the ladder
        # ON — its switches under densify-driven growth are part of what it
        # measures.
        adaptive_budget=args.full,
    )
    t_gt = time.time()
    # keep GT on the device: materialising to numpy would round-trip ~640 MB
    # of frames through the tunnel (minutes each way at ~4 MB/s)
    gt_images = [jax.block_until_ready(im) for im in render_gt_images(scene, config)]
    if args.realism:
        # per-image photometric noise + exposure jitter: unmodellable by the
        # gaussian scene, like sensor noise / auto-exposure on real photos
        nrng = np.random.default_rng(99)
        noisy = []
        for im in gt_images:
            gain = 1.0 + nrng.normal() * 0.03
            key = jax.random.PRNGKey(int(nrng.integers(2**31)))
            noise = 0.015 * jax.random.normal(key, im.shape, im.dtype)
            noisy.append(jax.block_until_ready(
                jnp.clip(im * gain + noise, 0.0, 1.0)))
        gt_images = noisy
    print(f"rendered {n_cams} GT views in {time.time() - t_gt:.1f}s "
          f"(realism={args.realism})", flush=True)

    if args.oracle_gt:
        # reconstruction upper bound: the exact scene as the pool
        n_total = len(scene["pws"])
        cap = ((n_total + 255) // 256) * 256
        pool = pool_from_arrays(
            scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
            scene["shs"], capacity=cap,
        )
        eval_ids = list(range(0, n_cams, max(1, n_cams // 4)))[:4]
        from easygaussiansplatting_tpu.train.loop import render_pool_image

        vals, drops = [], 0
        for i in eval_ids:
            img, aux = render_pool_image(pool, scene["cameras"][i], config,
                                         need_grads=False)
            b = aux.get("binning", {})
            drops += int(b.get("n_dropped", 0)) + int(b.get("rows_dropped", 0))
            vals.append(float(psnr(jnp.clip(img, 0, 1),
                                   jnp.clip(jnp.asarray(gt_images[i]), 0, 1))))
        if drops:
            print(f"WARNING: oracle renders dropped {drops} patches/rows — "
                  f"PSNR is an underestimate; raise max_patches", flush=True)
        suffix = "_realism" if args.realism else ""
        print(json.dumps({
            "metric": "oracle_gt_psnr" + suffix,
            "value": round(float(np.mean(vals)), 3),
            "unit": f"mean eval PSNR of the ground-truth pool "
                    f"({n_total} gaussians) vs the {'noisy ' if args.realism else ''}"
                    f"eval views; per-view {[round(v, 2) for v in vals]}",
            "vs_baseline": 0.0,
        }))
        return

    # SfM-like init from the ground truth: subsample + jitter positions,
    # quantise colors to uint8 like a real points3D.bin
    rng = np.random.default_rng(7)
    n_total = len(scene["pws"])
    frac, jit = (0.25, 0.03) if args.realism else (0.6, 0.01)
    keep = rng.permutation(n_total)[: int(frac * n_gt)]
    xyz = scene["pws"][keep] + rng.normal(scale=jit, size=(len(keep), 3))
    sh_c0 = 0.28209479177387814
    rgb = np.clip((scene["shs"][keep] * sh_c0 + 0.5) * 255, 0, 255).astype(np.uint8)
    gs = recarray_to_arrays(points_to_gaussians(xyz, rgb))

    cap_factor = args.cap_factor or (5.0 if args.realism else 2.5)  # densify has to grow more
    capacity = ((int(cap_factor * len(keep)) + 255) // 256) * 256
    pool = pool_from_arrays(
        gs["pws"], gs["rots"], gs["scales"], gs["alphas"], gs["shs"],
        capacity=capacity,
    )
    print(f"init {len(keep)} gaussians (capacity {capacity}), "
          f"{n_cams} cams {width}x{height}, backend={config.backend}", flush=True)

    eval_ids = list(range(0, n_cams, max(1, n_cams // 4)))[:4]
    eval_cams = [scene["cameras"][i] for i in eval_ids]
    eval_gts = [jnp.asarray(gt_images[i]) for i in eval_ids]

    state = {"t0": None, "t_hit": None, "psnr": 0.0, "epoch_hit": None,
             "curve": []}
    t_start = time.time()

    def eval_psnr(pool, config):
        from easygaussiansplatting_tpu.train.loop import render_pool_image

        vals = []
        for cam, gt in zip(eval_cams, eval_gts):
            img, _ = render_pool_image(pool, cam, config)
            vals.append(float(psnr(jnp.clip(img, 0, 1), jnp.clip(gt, 0, 1))))
        return float(np.mean(vals))

    def cb(epoch, pool, adam_state=None, stats=None, key=None, history=None):
        if state["t0"] is None:
            state["t0"] = time.time()  # first epoch done: compile excluded below
        if state["t_hit"] is not None and not args.full:
            return
        t_ev = time.time()
        p = eval_psnr(pool, config)
        t_ev = time.time() - t_ev
        state["psnr"] = p
        # host-vs-device attribution (VERDICT r4 #6): the loop records one
        # synced step (device time) and the whole steps phase per epoch; the
        # difference is host-added (dispatch, arg handling, sync reads)
        tdev = history["t_step_device"][-1] if history else None
        twall = history["t_steps_wall"][-1] if history else None
        tdfy = history["t_densify"][-1] if history else None
        row = {
            "epoch": epoch,
            "wall_s": round(time.time() - t_start, 1),
            "psnr": round(p, 3),
            "alive": int(pool.n_alive()),
            "budget": history["budget"][-1] if history else None,
            "overflow_steps": history["overflow_steps"][-1] if history else None,
            "t_steps_wall": round(twall, 2) if twall is not None else None,
            "t_device_est": (round(tdev * n_cams, 2)
                             if tdev is not None else None),
            "t_densify": round(tdfy, 2) if tdfy is not None else None,
            "t_eval": round(t_ev, 2),
        }
        state["curve"].append(row)
        print(f"  [epoch {epoch}] eval psnr {p:.2f} alive {row['alive']} "
              f"budget {row['budget']} steps {row['t_steps_wall']}s "
              f"(dev~{row['t_device_est']}s) densify {row['t_densify']}s "
              f"eval {row['t_eval']}s", flush=True)
        if p >= args.target_psnr and state["t_hit"] is None:
            state["t_hit"] = time.time()
            state["epoch_hit"] = epoch
            if not args.full:
                raise StopIteration  # caught below: target reached

    try:
        pool, history = train(
            pool, scene["cameras"], gt_images, config, scene["scene_size"],
            seed=0, eval_every=10**9, epoch_cb=cb,
        )
    except StopIteration:
        pass
    wall = (state["t_hit"] or time.time()) - t_start

    suffix = "_realism" if args.realism else ""
    if args.full:
        # the per-epoch curve first (one JSON line, greppable), then the
        # summary row — time-to-target still reported if the target was hit
        print(json.dumps({"curve" + suffix: state["curve"]}))
        print(json.dumps({
            "metric": "truck_full_regime" + suffix,
            "value": round(state["psnr"], 2),
            "unit": (f"final psnr @ epoch {len(state['curve'])}, "
                     f"{round(time.time() - t_start, 1)}s wall; "
                     + (f"psnr>={args.target_psnr} at epoch "
                        f"{state['epoch_hit']} ({round(wall, 1)}s); "
                        if state["epoch_hit"] is not None
                        else f"psnr>={args.target_psnr} not reached; ")
                     + f"alive {state['curve'][-1]['alive'] if state['curve'] else 0}"),
            "vs_baseline": 0.0,
        }))
    else:
        # attribution totals over the recorded epochs (VERDICT r4 #6): how
        # much of the wall was device step time vs host-added overhead
        rows = [r for r in state["curve"] if r.get("t_steps_wall")]
        # epoch 1's synced step carries the compile — exclude it from totals
        rows = rows[1:] if len(rows) > 1 else rows
        att = {}
        if rows:
            att = {
                "steps_wall_s": round(sum(r["t_steps_wall"] for r in rows), 1),
                "device_est_s": round(sum(r["t_device_est"] or 0 for r in rows), 1),
                "densify_s": round(sum(r["t_densify"] or 0 for r in rows), 1),
                "eval_s": round(sum(r["t_eval"] for r in rows), 1),
            }
            att["host_overhead_s"] = round(
                att["steps_wall_s"] - att["device_est_s"], 1)
        print(json.dumps({"attribution" + suffix: att, "curve" + suffix: state["curve"]}))
        print(json.dumps({
            "metric": "time_to_psnr25" + suffix,
            "value": round(wall, 1),
            "unit": f"s wall (incl. compile) to psnr>={args.target_psnr}, "
                    f"epoch {state['epoch_hit']}, final psnr {state['psnr']:.2f}",
            "vs_baseline": 0.0,
        }))


if __name__ == "__main__":
    main()
