"""Quaternion utilities (wxyz convention), numpy/jax.numpy generic.

Covers the reference's quaternion helpers: quat -> rotation matrix
(/root/reference/gsplat/gausplat.py:109-121), rotate-vector-by-quaternion
(/root/reference/gsplat/utils.py:46-54) and batched matrix -> quaternion
(/root/reference/gsplat/gau_io.py:15-57), re-derived rather than transcribed.
"""

import numpy as np


def _xp(x):
    import jax.numpy as jnp

    return jnp if isinstance(x, jnp.ndarray) else np


def quaternion_to_matrix(q):
    """Batched unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    xp = _xp(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - z * w)
    r02 = 2.0 * (x * z + y * w)
    r10 = 2.0 * (x * y + z * w)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - x * w)
    r20 = 2.0 * (x * z - y * w)
    r21 = 2.0 * (y * z + x * w)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        xp.stack([r00, r01, r02], axis=-1),
        xp.stack([r10, r11, r12], axis=-1),
        xp.stack([r20, r21, r22], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def rotate_vector_by_quaternion(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4), wxyz.

    v' = v + 2 u x (u x v + s v)  [Rodrigues via quaternion], written in the
    expanded form v' = 2 u (u . v) + v (s^2 - u . u) + 2 s (u x v).
    """
    xp = _xp(q)
    norm = xp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / norm
    s = q[..., 0:1]
    u = q[..., 1:4]
    udotv = xp.sum(u * v, axis=-1, keepdims=True)
    return 2.0 * u * udotv + v * (s * s - xp.sum(u * u, axis=-1, keepdims=True)) + 2.0 * s * xp.cross(u, v)


def matrix_to_quaternion(mats):
    """Batched rotation matrices (N, 3, 3) -> quaternions (N, 4) wxyz.

    Branch-free Shepperd-style extraction: compute all four candidate
    solutions and select per-row by the standard trace / diagonal-dominance
    conditions. Vectorised (works under numpy and jax.numpy).
    """
    xp = _xp(mats)
    m00, m01, m02 = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    m10, m11, m12 = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    m20, m21, m22 = mats[:, 2, 0], mats[:, 2, 1], mats[:, 2, 2]
    t = 1.0 + m00 + m11 + m22
    eps = 1e-7

    # Candidate 0: trace positive.
    s0 = 0.5 / xp.sqrt(xp.maximum(t, eps))
    q0 = xp.stack([0.25 / s0, (m21 - m12) * s0, (m02 - m20) * s0, (m10 - m01) * s0], axis=-1)
    # Candidate 1: m00 dominant.
    s1 = 2.0 * xp.sqrt(xp.maximum(1.0 + m00 - m11 - m22, eps))
    q1 = xp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Candidate 2: m11 dominant.
    s2 = 2.0 * xp.sqrt(xp.maximum(1.0 + m11 - m00 - m22, eps))
    q2 = xp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Candidate 3: m22 dominant.
    s3 = 2.0 * xp.sqrt(xp.maximum(1.0 + m22 - m00 - m11, eps))
    q3 = xp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    use0 = (t > eps)[:, None]
    use1 = ((m00 > m11) & (m00 > m22))[:, None]
    use2 = (m11 > m22)[:, None]
    q = xp.where(use0, q0, xp.where(use1, q1, xp.where(use2, q2, q3)))
    return q
