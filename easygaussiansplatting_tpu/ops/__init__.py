from easygaussiansplatting_tpu.ops import binning, stages
from easygaussiansplatting_tpu.ops.stages import (
    MIN_DEPTH,
    compute_cov2d,
    compute_cov3d,
    inverse_cov2d,
    preprocess,
    project,
    sh2color,
)

__all__ = [
    "stages",
    "binning",
    "MIN_DEPTH",
    "project",
    "compute_cov3d",
    "compute_cov2d",
    "sh2color",
    "inverse_cov2d",
    "preprocess",
]
