"""In-context ablation of the bench-scale step at the landed defaults.

Times nested prefixes of the real pipeline as SEPARATE jitted programs that
each read back ONE scalar (isolated micro-timings over the tunnel carry
1-5 ms dispatch latency and big readbacks dominate — a scalar read after a
prefix program is the only attribution that adds up; see BASELINE.md
methodology). Component cost = difference of adjacent prefixes.

Rows:
  pre          stages 1-5, scalar-summed
  pre+bin      + production binning (inference args, no gsid_counts)
  fwd          + segment layout/pack + forward kernel (= full inference)
  fwd_train    same but gsid_counts=True (the training forward)
  step         + loss + full backward (value_and_grad)
"""

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene
from easygaussiansplatting_tpu.ops import stages
from easygaussiansplatting_tpu.ops.binning import bin_gaussians
from easygaussiansplatting_tpu.ops.loss import gau_loss
from easygaussiansplatting_tpu.ops.rasterize import render

W, H, N = 979, 546, 65536
MAXP, MAXR, K = 557056, 229376, 512  # the r5-landed defaults


def timeit(label, fn, *args, iters=10, trials=3):
    out = fn(*args)  # compile + warm
    float(np.asarray(out))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out))  # one scalar read; block_until_ready lies
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:12s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    scene = make_synthetic_scene(seed=0, n_gaussians=N, n_cams=1, width=W,
                                 height=H, log_scale_mean=-3.6)
    cam = scene["cameras"][0]
    shs = np.zeros((N, 48), np.float32)
    shs[:, :3] = scene["shs"]
    params = tuple(jnp.asarray(x, jnp.float32) for x in (
        scene["pws"], shs, scene["alphas"], scene["scales"], scene["rots"]))
    gt = jnp.zeros((3, H, W), jnp.float32)

    @jax.jit
    def pre(p):
        aux = stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam)
        return (jnp.sum(aux["us"]) + jnp.sum(aux["cinv2ds"])
                + jnp.sum(aux["colors"]) + jnp.sum(aux["depths"])
                + jnp.sum(aux["areas"]) + jnp.sum(aux["valid"]))

    def prebin(p, counts):
        aux = stages.preprocess(p[0], p[1], p[2], p[3], p[4], cam)
        b = bin_gaussians(
            aux["us"], aux["depths"], aux["areas"], aux["valid"],
            width=W, height=H, tile=16, max_patches=MAXP, max_rows=MAXR,
            cinv2ds=aux["cinv2ds"], alphas=aux["alphas"], gsid_counts=counts,
        )
        s = (jnp.sum(b["patch_gsid"]) + jnp.sum(b["tile_start"])
             + jnp.sum(b["tile_cnt"]) + b["total"])
        if counts:
            s = s + jnp.sum(b["gsid_counts"])
        return s

    def fwd(p, grads):
        img, _ = render(*p, cam, backend="pallas", tile=16, max_patches=MAXP,
                        max_rows=MAXR, k_chunk=K, need_grads=grads)
        return jnp.mean(img)

    @jax.jit
    def step(p):
        def loss_fn(p):
            img, _ = render(*p, cam, backend="pallas", tile=16,
                            max_patches=MAXP, max_rows=MAXR, k_chunk=K)
            return gau_loss(img, gt)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return loss + jnp.sum(grads[2])

    t_pre = timeit("pre", pre, params)
    t_bin = timeit("pre+bin", jax.jit(lambda p: prebin(p, False)), params)
    t_binc = timeit("pre+bin+cnt", jax.jit(lambda p: prebin(p, True)), params)
    t_fwd = timeit("fwd", jax.jit(lambda p: fwd(p, False)), params)
    t_fwdt = timeit("fwd_train", jax.jit(lambda p: fwd(p, True)), params)
    t_step = timeit("step", step, params)
    print("\n== in-context components (differences) ==")
    print(f"{'preprocess':24s} {t_pre * 1e3:8.2f} ms")
    print(f"{'binning':24s} {(t_bin - t_pre) * 1e3:8.2f} ms")
    print(f"{'gsid_counts extra':24s} {(t_binc - t_bin) * 1e3:8.2f} ms")
    print(f"{'fwd kernel+pack':24s} {(t_fwd - t_bin) * 1e3:8.2f} ms")
    print(f"{'backward total':24s} {(t_step - t_fwdt) * 1e3:8.2f} ms")
    print(f"{'full step':24s} {t_step * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
