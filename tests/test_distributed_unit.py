"""Fast single-process unit tests for parallel.distributed helpers.

The 2-process integration test (test_multihost.py, slow tier) exercises the
real coordinator path; these cover the mesh layout / batch-row / placement
logic on the virtual 8-device mesh without subprocesses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easygaussiansplatting_tpu.parallel.distributed import (
    fetch_to_host,
    make_multihost_mesh,
    process_batch_rows,
    put_batch,
    put_replicated,
    reshard_like,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def test_multihost_mesh_single_process_layout():
    mesh = make_multihost_mesh()  # 1 process -> data=1, gs=8
    assert dict(mesh.shape) == {"data": 1, "gs": 8}
    mesh2 = make_multihost_mesh(data=4)
    assert dict(mesh2.shape) == {"data": 4, "gs": 2}
    with pytest.raises(ValueError):
        make_multihost_mesh(data=3)  # does not divide 8 devices


def test_process_batch_rows_covers_batch():
    mesh = make_multihost_mesh(data=4)
    rows = process_batch_rows(mesh, batch=8)
    assert rows == list(range(8))  # single process owns every row
    with pytest.raises(ValueError):
        process_batch_rows(mesh, batch=6)  # not divisible by data axis


def test_put_replicated_and_batch_shardings():
    mesh = make_multihost_mesh(data=2)
    pool_like = {"a": np.arange(32, dtype=np.float32).reshape(8, 4),
                 "s": np.float32(3.0)}
    placed = put_replicated(mesh, pool_like)
    # leading axis sharded over gs, replicated over data
    assert placed["a"].sharding.spec == jax.sharding.PartitionSpec("gs", None)
    assert placed["s"].sharding.spec == jax.sharding.PartitionSpec()
    np.testing.assert_array_equal(np.asarray(placed["a"]), pool_like["a"])

    batch = np.arange(24, dtype=np.float32).reshape(4, 6)
    placed_b = put_batch(mesh, batch)
    assert placed_b.sharding.spec == jax.sharding.PartitionSpec("data", None)
    np.testing.assert_array_equal(np.asarray(placed_b), batch)


def test_reshard_like_and_fetch_roundtrip():
    mesh = make_multihost_mesh(data=2)
    x = jnp.arange(64, dtype=jnp.float32).reshape(16, 4)
    tree = reshard_like(mesh, {"x": x})
    assert tree["x"].sharding.spec == jax.sharding.PartitionSpec("gs", None)
    back = fetch_to_host(tree)
    np.testing.assert_array_equal(back["x"], np.asarray(x))
    assert isinstance(back["x"], np.ndarray)
