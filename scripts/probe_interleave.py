"""Split compile probe for EGS_INTERLEAVE (r5): which half stalls Mosaic?

The il2 bench sat >15 min in compilation. This compiles (a) the interleaved
FORWARD only, then (b) the backward, each at bench scale with its own wall
timer, so the stalling program is identified before any simplification work.
Run with EGS_INTERLEAVE set; strictly one TPU job at a time.
"""

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import os

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import render

W, H, N = 979, 546, 65536
MAXP, MAXR, K = 573440, 262144, 512


def main():
    print(f"EGS_INTERLEAVE={os.environ.get('EGS_INTERLEAVE')}", flush=True)
    scene = make_synthetic_scene(seed=0, n_gaussians=N, n_cams=1, width=W,
                                 height=H, log_scale_mean=-3.6)
    cam = scene["cameras"][0]
    shs = np.zeros((N, 48), np.float32)
    shs[:, :3] = scene["shs"]
    params = tuple(jnp.asarray(x, jnp.float32) for x in (
        scene["pws"], shs, scene["alphas"], scene["scales"], scene["rots"]))
    gt = jnp.zeros((3, H, W), jnp.float32)

    @jax.jit
    def fwd(params):
        image, _ = render(*params, cam, backend="pallas", tile=16,
                          max_patches=MAXP, max_rows=MAXR, k_chunk=K,
                          need_grads=False)
        return jnp.mean(image)

    t0 = time.time()
    v = fwd(params)
    jax.block_until_ready(v)
    print(f"forward compiled+ran in {time.time()-t0:.1f}s -> {float(v):.5f}",
          flush=True)
    # steady-state fwd timing
    for _ in range(2):
        t0 = time.time()
        for _ in range(10):
            v = fwd(params)
        float(v)
        print(f"fwd 10 iters: {(time.time()-t0)*100:.1f} ms/iter", flush=True)

    @jax.jit
    def step(params):
        def loss_fn(params):
            image, _ = render(*params, cam, backend="pallas", tile=16,
                              max_patches=MAXP, max_rows=MAXR, k_chunk=K)
            return gau_loss(image, gt)
        return jax.value_and_grad(loss_fn)(params)

    t0 = time.time()
    loss, grads = step(params)
    jax.block_until_ready((loss, grads))
    print(f"fwd+bwd compiled+ran in {time.time()-t0:.1f}s loss={float(loss):.5f}",
          flush=True)
    for _ in range(2):
        t0 = time.time()
        for _ in range(10):
            loss, grads = step(params)
        float(loss)
        print(f"step 10 iters: {(time.time()-t0)*100:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
