from easygaussiansplatting_tpu.utils import sh
from easygaussiansplatting_tpu.utils.activations import (
    get_alphas,
    get_alphas_raw,
    get_rots,
    get_scales,
    get_scales_raw,
    get_shs,
)
from easygaussiansplatting_tpu.utils.quaternion import (
    matrix_to_quaternion,
    quaternion_to_matrix,
    rotate_vector_by_quaternion,
)
from easygaussiansplatting_tpu.utils.schedule import get_expon_lr_func

__all__ = [
    "sh",
    "get_alphas",
    "get_alphas_raw",
    "get_scales",
    "get_scales_raw",
    "get_rots",
    "get_shs",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "rotate_vector_by_quaternion",
    "get_expon_lr_func",
]
