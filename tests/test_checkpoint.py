"""Checkpoint/resume: training continues bit-exactly after restore."""

import jax
import jax.numpy as jnp
import numpy as np

from easygaussiansplatting_tpu.data.synthetic import make_synthetic_scene, render_gt_images
from easygaussiansplatting_tpu.models.gaussians import pool_from_arrays
from easygaussiansplatting_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from easygaussiansplatting_tpu.train.config import TrainConfig
from easygaussiansplatting_tpu.train.density import density_stats_init
from easygaussiansplatting_tpu.train.loop import make_train_step
from easygaussiansplatting_tpu.train.optimizer import adam_init

CONFIG = TrainConfig(backend="tiled", tile=16, max_patches=2**12, k_chunk=32, n_chunks=8)


def test_resume_bit_exact(tmp_path):
    scene = make_synthetic_scene(seed=5, n_gaussians=40, n_cams=2, width=32, height=32)
    pool = pool_from_arrays(
        scene["pws"], scene["rots"], scene["scales"], scene["alphas"], scene["shs"],
        capacity=64,
    )
    gts = [jnp.asarray(g) for g in render_gt_images(scene, CONFIG)]
    cam = scene["cameras"][0]
    step = make_train_step(CONFIG, scene["scene_size"], max_steps=10)

    adam = adam_init(pool.params())
    stats = density_stats_init(pool.capacity)
    key = jax.random.PRNGKey(3)

    # two steps, checkpoint, two more
    pool1, adam1, stats1, _, _ = step(pool, adam, stats, cam, gts[0])
    pool2, adam2, stats2, _, _ = step(pool1, adam1, stats1, cam, gts[1])
    save_checkpoint(tmp_path / "ck.npz", pool2, adam2, stats2, epoch=2, key=key)
    pool3, adam3, stats3, loss3, _ = step(pool2, adam2, stats2, cam, gts[0])

    # restore and repeat the third step
    rpool, radam, rstats, epoch, rkey = load_checkpoint(tmp_path / "ck.npz")
    assert epoch == 2
    assert jnp.all(jax.random.key_data(rkey) == jax.random.key_data(key))
    qpool, qadam, qstats, qloss, _ = step(rpool, radam, rstats, cam, gts[0])

    assert float(qloss) == float(loss3)
    for k, v in pool3.params().items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(qpool.params()[k]), err_msg=k)
    np.testing.assert_array_equal(np.asarray(stats3.grad_accum), np.asarray(qstats.grad_accum))
    np.testing.assert_array_equal(np.asarray(adam3.mu["pws"]), np.asarray(qadam.mu["pws"]))
