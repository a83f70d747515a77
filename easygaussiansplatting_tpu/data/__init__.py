from easygaussiansplatting_tpu.data.fixtures import example_camera, example_gaussians
from easygaussiansplatting_tpu.data.gau_io import (
    load_gs,
    load_ply,
    load_pool,
    save_gs,
    save_ply,
    save_pool,
)

__all__ = [
    "example_gaussians",
    "example_camera",
    "load_gs",
    "load_ply",
    "load_pool",
    "save_gs",
    "save_ply",
    "save_pool",
]
