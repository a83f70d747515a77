"""Device-mesh construction.

Two logical axes (SURVEY.md §2.9 table):

* ``data`` — cameras per step (data parallelism; the reference trains batch=1,
  /root/reference/train.py:45-48 — multi-chip batching is the first scaling
  axis the TPU build adds).
* ``gs``   — the Gaussian pool axis: parameters, optimiser state, and the
  embarrassingly parallel stages 1-5 shard over it (the 3DGS analogue of
  tensor/sequence parallelism; there is no attention so there is no separate
  sp/tp distinction — the N-Gaussians axis IS the model dimension).

On a real pod slice the ``gs`` axis should map to the ICI-adjacent inner
devices so the all-gather of preprocessed attributes before rasterisation
rides ICI; ``jax.make_mesh`` already prefers that ordering.
"""

import math

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, data=None, devices=None, axis_names=("data", "gs")):
    """Build a 2-axis mesh over the first ``n_devices`` devices.

    ``data`` defaults to the largest power-of-two <= sqrt(n) that divides n,
    so e.g. 8 devices -> (2, 4), 4 -> (2, 2), 1 -> (1, 1). Pass ``data=1``
    for pure Gaussian sharding or ``data=n`` for pure data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]

    if data is None:
        data = 1
        limit = int(math.isqrt(n_devices))
        d = 2
        while d <= limit and n_devices % d == 0:
            data = d
            d *= 2
    if n_devices % data != 0:
        raise ValueError(f"data axis {data} does not divide {n_devices} devices")
    gs = n_devices // data
    # Auto axes: shardings come from in/out specs + with_sharding_constraint
    # (GSPMD propagation), not the explicit sharding-in-types mode.
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return jax.make_mesh((data, gs), axis_names, devices=devices, axis_types=axis_types)


def mesh_axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name]
