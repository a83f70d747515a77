"""Multi-chip sharding layer (mesh + pjit/GSPMD training).

The reference is strictly single-GPU (SURVEY.md §2.9 — no torch.distributed,
no NCCL/MPI anywhere); this layer is where the TPU build goes beyond it:

* ``mesh.py``      — device mesh construction over (data, gs) axes.
* ``train.py``     — batched, sharded training step: cameras data-parallel
  over the ``data`` axis, the Gaussian pool (parameters, Adam state,
  densification stats) sharded over the ``gs`` axis, gradient reduction via
  XLA-inserted collectives over ICI.
"""

from easygaussiansplatting_tpu.parallel.mesh import make_mesh
from easygaussiansplatting_tpu.parallel.train import (
    make_sharded_train_step,
    pool_shardings,
    shard_pool,
    stack_cameras,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "pool_shardings",
    "shard_pool",
    "stack_cameras",
]
