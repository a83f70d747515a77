"""Headline benchmark: forward+backward rasterisation throughput per chip.

Renders a synthetic scene at the reference evaluation resolution (979x546,
/root/reference/forward_cpu.py:19-27) through the full differentiable
pipeline (stages 1-5 + Pallas tile rasterisation + L1/DSSIM loss) and times
jitted fwd+bwd steps. Prints ONE JSON line:

    {"metric": "fwd_bwd_throughput", "value": N, "unit": "Mpix/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against a fixed anchor of 10 Mpix/s — roughly the per-image rate implied by
the reference recipe (100 epochs x ~250 images of ~0.5 Mpix in a few hours on
one CUDA GPU).
"""

import json
import time

import numpy as np

BASELINE_ANCHOR_MPIX_S = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
    from easygaussiansplatting_tpu.ops.loss import gau_loss
    from easygaussiansplatting_tpu.ops.rasterize import render

    on_tpu = jax.default_backend() == "tpu"
    width, height = 979, 546
    n_gaussians = 65536
    if not on_tpu:  # smoke-test sizing for CPU runs
        width, height = 160, 112
        n_gaussians = 1024

    # log_scale_mean -3.6: splats of a few pixels, ~3-6 covered tiles each —
    # the patch statistics of a trained scene rather than giant blobs.
    scene = make_synthetic_scene(
        seed=0, n_gaussians=n_gaussians, n_cams=1, width=width, height=height,
        log_scale_mean=-3.6,
    )
    cam = scene["cameras"][0]
    n = scene["pws"].shape[0]
    shs = np.zeros((n, 48), np.float32)
    shs[:, :3] = scene["shs"]

    params = (
        jnp.asarray(scene["pws"], jnp.float32),
        jnp.asarray(shs, jnp.float32),
        jnp.asarray(scene["alphas"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rots"], jnp.float32),
    )
    gt = jnp.zeros((3, height, width), jnp.float32)
    backend = "pallas"
    # chunk rows per grid step: Q = max_patches/k + n_tiles segments, so
    # larger k trades fewer chunk-crossing grid steps (per-step fixed cost)
    # against VMEM block size — sweepable by scripts/ab_bench.py
    import os

    k_chunk = int(os.environ.get("EGS_KCHUNK", "512"))
    # 557056 = 34*16384, ~1.015x headroom over the scene's 549k patches —
    # the r5 A/B winner with the 229376-row budget (15.72 vs 15.32 at the
    # r4 pair 573440/262144; 557056 alone 15.45). Every latency-bound
    # stage (tile sort, sort-reduce, scan chains) scales with the STATIC
    # budgets, not the true counts, and any budget >= the scene's true
    # patches/rows drops nothing (identical images/grads; the drop_check
    # below enforces it). EGS_MAX_PATCHES / EGS_MAX_ROWS probe others.
    max_patches = int(os.environ.get("EGS_MAX_PATCHES", "557056")) if on_tpu else 2**14
    # rows ~ patches / mean splat width; every latency-bound L1 stage scales
    # with this STATIC budget too (14*16384 >= the scene's true rows)
    max_rows = int(os.environ.get("EGS_MAX_ROWS", "229376")) if on_tpu else None

    @jax.jit
    def step(params, gt):
        def loss_fn(params):
            image, _ = render(
                *params, cam, backend=backend, tile=16,
                max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk,
            )
            return gau_loss(image, gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    @jax.jit
    def drop_check(params):
        _, aux = render(
            *params, cam, backend=backend, tile=16,
            max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk,
            need_grads=False,
        )
        b = aux["binning"]
        return b.get("n_dropped", 0) + b.get("rows_dropped", 0)

    @jax.jit
    def fwd_step(params):
        image, _ = render(
            *params, cam, backend=backend, tile=16,
            max_patches=max_patches, max_rows=max_rows, k_chunk=k_chunk,
            need_grads=False,
        )
        return jnp.mean(image)  # tiny reduction: one scalar to read back

    # warmup / compile; refuse to bench a budget that truncates work (a
    # dropping config computes a different image and would look "faster")
    dropped = int(drop_check(params))
    assert dropped == 0, f"budget drops {dropped} patches/rows — not benchable"
    loss, grads = step(params, gt)
    jax.block_until_ready((loss, grads))
    jax.block_until_ready(fwd_step(params))

    iters = 10 if on_tpu else 3
    trials = 3 if on_tpu else 1

    def timeit(fn, read):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn()
            # device->host read, NOT block_until_ready: the tunneled
            # backend's block_until_ready has been observed to return before
            # the enqueued steps finish (absurd Mpix/s); a value read
            # cannot lie
            _ = read(out)
            best = min(best, time.perf_counter() - t0)
        return best  # best-of-trials: robust to tunnel-latency spikes

    dt = timeit(lambda: step(params, gt), lambda o: float(o[0]))
    dt_fwd = timeit(lambda: fwd_step(params), float)

    mpix_s = width * height * iters / dt / 1e6
    fwd_mpix_s = width * height * iters / dt_fwd / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd_bwd_throughput",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_ANCHOR_MPIX_S, 3),
                # inference-path (viewer/eval) guard: forward-only render
                "fwd_throughput": round(fwd_mpix_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
