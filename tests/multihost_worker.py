"""Worker process for the multi-host smoke test (tests/test_multihost.py).

Usage: python tests/multihost_worker.py <process_id> <port> <num_processes>

process_id == -1 runs the identical training single-process on an 8-device
virtual mesh (the parity target). Any other id joins a distributed run where
each process owns 4 virtual CPU devices and the (data, gs) = (2, 4) mesh's
data axis spans the two processes — the same layout a 2-host TPU pod slice
would use (SURVEY.md §2.9: data over DCN, gs within host).

Prints one JSON line with the final loss and alive count.
"""

import json
import os
import sys

# drop any inherited device-count flag (e.g. from the pytest conftest) so
# ours is authoritative
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]


def main():
    pid, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    single = pid < 0
    n_local = 8 if single else 4
    os.environ["XLA_FLAGS"] = " ".join(
        _flags + [f"--xla_force_host_platform_device_count={n_local}"]
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    if single:
        from easygaussiansplatting_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, data=2)
    else:
        from easygaussiansplatting_tpu.parallel.distributed import (
            init_distributed, make_multihost_mesh,
        )

        init_distributed(f"localhost:{port}", nproc, pid)
        assert jax.process_count() == nproc
        assert len(jax.devices()) == 4 * nproc
        mesh = make_multihost_mesh()  # (nproc, 4): data spans processes
        assert mesh.shape["data"] == nproc

    import numpy as np

    from easygaussiansplatting_tpu.data.synthetic import (
        make_synthetic_scene, render_gt_images,
    )
    from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
    from easygaussiansplatting_tpu.parallel.loop import train_sharded
    from easygaussiansplatting_tpu.train.config import TrainConfig

    config = TrainConfig(
        backend="pallas", epochs=3, densify_every_epochs=2,
        densify_until_epoch=50, reset_alpha_every_epochs=100,
        max_patches=2**12, k_chunk=128,
    )
    scene = make_synthetic_scene(
        seed=3, n_gaussians=96, n_cams=4, width=32, height=32,
        log_scale_mean=-2.0,
    )
    gts = [np.asarray(g) for g in render_gt_images(scene, config)]
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"],
        scene["shs"], capacity=256,
    )
    pool, history = train_sharded(
        pool, scene["cameras"], gts, config, scene["scene_size"], mesh,
        batch=2, seed=0, log_fn=lambda *a: None, eval_every=100,
    )
    # checkpoint-path check: fetch_to_host must be collective-free (only
    # process 0 calls it — a hidden collective would deadlock here) and give
    # every process-0 byte of the full pool
    checksum = None
    if single or jax.process_index() == 0:
        from easygaussiansplatting_tpu.parallel.distributed import fetch_to_host

        host_pool = fetch_to_host(pool)
        checksum = float(np.sum(np.abs(host_pool.pws)) + np.sum(host_pool.alive))
    print(json.dumps({
        "process": pid,
        "loss": history["loss"][-1],
        "losses": history["loss"],
        "n_alive": history["n_alive"][-1],
        "checksum": checksum,
    }), flush=True)


if __name__ == "__main__":
    main()
