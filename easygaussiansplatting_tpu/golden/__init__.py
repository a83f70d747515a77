from easygaussiansplatting_tpu.golden.model import (
    MIN_DEPTH,
    compute_cov2d,
    compute_cov3d,
    inverse_cov2d,
    project,
    render,
    render_tiles,
    sh2color,
    tile_lists,
)
from easygaussiansplatting_tpu.golden.numdiff import check, numerical_derivative

__all__ = [
    "MIN_DEPTH",
    "project",
    "compute_cov3d",
    "compute_cov2d",
    "sh2color",
    "inverse_cov2d",
    "tile_lists",
    "render_tiles",
    "render",
    "numerical_derivative",
    "check",
]
