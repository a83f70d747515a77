"""Camera model.

Pinhole camera with world->camera extrinsics, equivalent to the reference's
Camera (/root/reference/gsplat/gausplat_dataset.py:14-27) but registered as a
JAX pytree: extrinsics/intrinsics are traced leaves (no recompile per view),
while width/height are static metadata (shapes depend on them).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    # `id` is a DATA field (a pytree leaf) although it is plain metadata:
    # as static aux data every distinct camera id would be a distinct jit
    # signature, and a training loop cycling 100 dataset cameras through
    # one step re-traced per camera — measured 1193 ms/step vs 73 ms.
    # Nothing computes on it, so a (possibly traced) scalar leaf is free.
    data_fields=["Rcw", "tcw", "fx", "fy", "cx", "cy", "id"],
    meta_fields=["width", "height"],
)
@dataclasses.dataclass(frozen=True)
class Camera:
    Rcw: jax.Array  # [3,3] world->camera rotation
    tcw: jax.Array  # [3] world->camera translation
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int
    id: int = 0

    @property
    def twc(self):
        """Camera center in world coordinates: -Rcw^T tcw."""
        if isinstance(self.Rcw, jnp.ndarray):
            return -jnp.matmul(
                jnp.swapaxes(self.Rcw, -1, -2), self.tcw, precision=jax.lax.Precision.HIGHEST
            )
        return -np.swapaxes(self.Rcw, -1, -2) @ self.tcw

    @staticmethod
    def from_dict(d, dtype=None):
        # host (numpy) leaves: constructing a camera must not touch the
        # device — over tunneled backends each tiny device_put costs real
        # latency and a 100-camera dataset did ~600 of them. jit uploads
        # the ~100 bytes at call time.
        dtype = np.float32 if dtype is None else dtype
        return Camera(
            Rcw=np.asarray(d["Rcw"], dtype),
            tcw=np.asarray(d["tcw"], dtype),
            fx=np.asarray(d["fx"], dtype),
            fy=np.asarray(d["fy"], dtype),
            cx=np.asarray(d["cx"], dtype),
            cy=np.asarray(d["cy"], dtype),
            width=int(d["width"]),
            height=int(d["height"]),
            id=int(d.get("id", 0)),
        )
