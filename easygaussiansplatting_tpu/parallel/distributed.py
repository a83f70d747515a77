"""Multi-host (multi-process) training support.

The reference is strictly single-process / single-GPU (SURVEY.md §2.9 —
`grep torch.distributed /root/reference` has zero hits); this module is the
TPU-native extension that lets the same sharded program span hosts:

* ``init_distributed`` — one-call bootstrap of the JAX distributed runtime
  (TCP coordinator; on real Cloud TPU pods all arguments are auto-detected).
* ``make_multihost_mesh`` — a (data, gs) mesh whose **data axis spans
  processes** (gradient psum over the batch rides DCN, the cheap collective:
  one pool-sized reduce per step) while the **gs axis stays within a
  process** (the per-camera attribute all-gather before rasterisation rides
  ICI, the expensive per-step collective).
* ``process_batch_rows`` — which rows of a data-sharded batch this process
  must feed (each host loads only its own cameras/images).
* ``put_replicated`` / ``put_batch`` — multi-process-safe versions of
  device_put for host data: every process holds the full pool (training is
  deterministic and replicated at the host level), but only its local slice
  of the camera batch.

Single-process behaviour is identical to the plain helpers in
``parallel.train``; everything here degrades to device_put when
``jax.process_count() == 1``, so the same driver code runs everywhere.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None,
                     local_device_ids=None):
    """Bootstrap the JAX distributed runtime (idempotent, env-var driven).

    Explicit args win; otherwise ``EGS_COORDINATOR`` / ``EGS_NUM_PROCESSES``
    / ``EGS_PROCESS_ID`` are consulted; if neither is present this is a
    no-op (single-process mode). On Cloud TPU pod slices call it with no
    arguments — JAX auto-detects the topology.
    """
    if jax.distributed.is_initialized():
        return  # (jax.process_count() here would itself init the backend)
    coordinator = coordinator or os.environ.get("EGS_COORDINATOR")
    if num_processes is None and "EGS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["EGS_NUM_PROCESSES"])
    if process_id is None and "EGS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["EGS_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_multihost_mesh(data=None, axis_names=("data", "gs")):
    """(data, gs) mesh with the data axis process-major.

    Device layout: processes are blocks along ``data`` so each host's local
    devices form whole data-rows — every cross-host collective is then the
    per-step gradient psum over ``data`` (DCN-friendly), and the gs-axis
    all-gather of rasteriser inputs never leaves a host (ICI).

    ``data`` defaults to one row per process and must be a multiple of the
    process count; the remaining factor of the per-process device count is
    the gs axis.
    """
    procs = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    local = n // procs
    if data is None:
        data = procs
    if data % procs != 0:
        raise ValueError(f"data axis {data} must be a multiple of {procs} processes")
    per = data // procs  # data rows per process
    if local % per != 0:
        raise ValueError(
            f"{per} data rows/process does not divide {local} local devices"
        )
    gs = local // per
    arr = np.array(devs).reshape(procs * per, gs)
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return Mesh(arr, axis_names, axis_types=axis_types)


def process_batch_rows(mesh, batch, axis_name="data"):
    """Global row indices of a [batch, ...] data-sharded array this process
    feeds. Rows are assigned data-row-major, so with the process-major mesh
    from make_multihost_mesh each host's rows are contiguous."""
    data_size = mesh.shape[axis_name]
    if batch % data_size != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {data_size}")
    per_row = batch // data_size
    axis = mesh.axis_names.index(axis_name)
    me = jax.process_index()
    rows = []
    for i in range(data_size):
        row_devs = np.take(mesh.devices, i, axis=axis).ravel()
        if row_devs[0].process_index == me:
            rows.extend(range(i * per_row, (i + 1) * per_row))
    return rows


def _row_spec(x, axis_name):
    if getattr(x, "ndim", 0) == 0:
        return P()
    return P(axis_name, *([None] * (x.ndim - 1)))


def put_replicated(mesh, tree, axis_name="gs"):
    """Host pytree (full copy on every process) -> global arrays, leading
    axis sharded over ``axis_name`` and replicated over the rest."""
    def put(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, _row_spec(x, axis_name))
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def put_batch(mesh, local_tree, axis_name="data"):
    """Per-process local batch rows -> one global data-sharded array.

    ``local_tree`` leaves carry only this process's rows (see
    process_batch_rows); in single-process mode that is the whole batch and
    this is a plain device_put.
    """
    def put(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, _row_spec(x, axis_name))
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, local_tree)


def fetch_to_host(tree):
    """Global arrays -> host numpy, collective-free.

    Relies on the make_multihost_mesh layout: the pool is replicated over the
    process-spanning ``data`` axis and sharded only over the within-process
    ``gs`` axis, so every process's addressable shards already cover the full
    array — safe to call on any subset of processes (e.g. just host 0 before
    a checkpoint write) without deadlocking on a collective.
    """
    def get(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return np.asarray(x)
        out = np.empty(x.shape, x.dtype)
        covered = 0
        seen = set()
        for s in x.addressable_shards:
            out[s.index] = np.asarray(s.data)
            if s.index not in seen:
                seen.add(s.index)
                covered += int(np.prod(s.data.shape))
        if covered < int(np.prod(x.shape)):
            raise ValueError(
                "local shards do not cover the array — fetch_to_host needs "
                "the data-axis-replicated pool layout of make_multihost_mesh"
            )
        return out

    return jax.tree.map(get, tree)


def reshard_like(mesh, tree, axis_name="gs"):
    """Re-impose pool sharding on already-global jax.Arrays (e.g. after a
    densify step changed layouts). Runs as a tiny jitted identity so the
    transfer is a compiled collective — valid across processes, where
    device_put from one process would not be."""
    shardings = jax.tree.map(
        lambda x: NamedSharding(mesh, _row_spec(x, axis_name)), tree
    )
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)
