"""Stages 1-5 of the splatting pipeline as pure, batched JAX functions.

These replace the reference CUDA kernels project/computeCov3D/computeCov2D/
sh2Color/inverseCov2D (/root/reference/gsplatcu/kernel.cu:274-807). Unlike
the reference — which materialises dense per-Gaussian Jacobians during the
forward pass and chains them with batched matmuls in Python
(/root/reference/gsplat/gsmodel.py:71-85) — gradients here come from JAX
reverse-mode autodiff over these pure functions: the forward math is the same,
the Jacobian plumbing disappears, and XLA fuses the whole per-Gaussian
preprocessing into a handful of elementwise kernels on the VPU.

All functions are total on padded pools: entries behind the camera
(depth < MIN_DEPTH) or padding entries produce finite outputs with zero
gradient (guarded divisions), and a `valid` mask is threaded to the
rasteriser instead of the reference's BAD_MARKER depth overwrite
(kernel.cu:10-11).
"""

import jax
import jax.numpy as jnp

MIN_DEPTH = 0.2


def project(pws, Rcw, tcw, fx, fy, cx, cy):
    """Stage 1: world -> camera -> pixel.

    Returns (us [N,2], pcs [N,3], depths [N]) per (F.1.1)-(F.1.2),
    docs/forward.md. Parity target: /root/reference/gsplatcu/kernel.cu:553-617.
    """
    # explicit 9-term elementwise contraction, NOT matmul: [N,3]x[3,3] has
    # contraction dim 3 — the MXU needs ~128 to pay for itself, and the VPU
    # form fuses with the projective divide below
    pcs = jnp.stack(
        [
            pws[:, 0] * Rcw[c, 0] + pws[:, 1] * Rcw[c, 1]
            + pws[:, 2] * Rcw[c, 2] + tcw[c]
            for c in range(3)
        ],
        axis=1,
    )
    z = pcs[:, 2]
    zsafe = jnp.where(z >= MIN_DEPTH, z, 1.0)
    us = jnp.stack(
        [pcs[:, 0] * fx / zsafe + cx, pcs[:, 1] * fy / zsafe + cy], axis=1
    )
    return us, pcs, z


def compute_cov3d(rots, scales):
    """Stage 2: unit quaternion (wxyz) + scales -> Sigma upper triangle [N,6].

    Sigma = (R S)(R S)^T (F.2.1). Parity target: kernel.cu:326-423.
    """
    w, x, y, z = rots[:, 0], rots[:, 1], rots[:, 2], rots[:, 3]
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    # Columns of M = R @ diag(s): col_j = s_j * R[:, j]
    m00 = (1 - 2 * (y * y + z * z)) * sx
    m01 = (2 * (x * y - z * w)) * sy
    m02 = (2 * (x * z + y * w)) * sz
    m10 = (2 * (x * y + z * w)) * sx
    m11 = (1 - 2 * (x * x + z * z)) * sy
    m12 = (2 * (y * z - x * w)) * sz
    m20 = (2 * (x * z - y * w)) * sx
    m21 = (2 * (y * z + x * w)) * sy
    m22 = (1 - 2 * (x * x + y * y)) * sz
    c_xx = m00 * m00 + m01 * m01 + m02 * m02
    c_xy = m00 * m10 + m01 * m11 + m02 * m12
    c_xz = m00 * m20 + m01 * m21 + m02 * m22
    c_yy = m10 * m10 + m11 * m11 + m12 * m12
    c_yz = m10 * m20 + m11 * m21 + m12 * m22
    c_zz = m20 * m20 + m21 * m21 + m22 * m22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=1)


def compute_cov2d(cov3ds, pcs, Rcw, fx, fy, width, height):
    """Stage 3: EWA projection of the 3D covariance to 2D (F.3.1-F.3.2).

    cov2d = M Sigma M^T + 0.3 I with M = J Rcw and x/z, y/z clamped to
    +-1.3 tan(fov) (tan_fov = W/(2 fx), matching the CUDA host wrapper
    /root/reference/gsplatcu/gausplat.cu:225-226). Returns [N,3] (a, b, c).
    Parity target: kernel.cu:425-551.
    """
    x, y, z = pcs[:, 0], pcs[:, 1], pcs[:, 2]
    zsafe = jnp.where(z >= MIN_DEPTH, z, 1.0)
    tan_fovx = width / (2.0 * fx)
    tan_fovy = height / (2.0 * fy)
    x = jnp.clip(x / zsafe, -1.3 * tan_fovx, 1.3 * tan_fovx) * zsafe
    y = jnp.clip(y / zsafe, -1.3 * tan_fovy, 1.3 * tan_fovy) * zsafe
    z2 = zsafe * zsafe

    # Rows of M = J @ Rcw with J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    r0 = Rcw[0]
    r1 = Rcw[1]
    r2 = Rcw[2]
    jx0 = (fx / zsafe)[:, None]
    jx2 = (-fx * x / z2)[:, None]
    jy1 = (fy / zsafe)[:, None]
    jy2 = (-fy * y / z2)[:, None]
    m0 = jx0 * r0[None, :] + jx2 * r2[None, :]  # [N,3]
    m1 = jy1 * r1[None, :] + jy2 * r2[None, :]  # [N,3]

    # Sigma as symmetric from upper triangle (xx, xy, xz, yy, yz, zz)
    sxx, sxy, sxz = cov3ds[:, 0], cov3ds[:, 1], cov3ds[:, 2]
    syy, syz, szz = cov3ds[:, 3], cov3ds[:, 4], cov3ds[:, 5]

    def sig_dot(v):  # Sigma @ v for v [N,3]
        return jnp.stack(
            [
                sxx * v[:, 0] + sxy * v[:, 1] + sxz * v[:, 2],
                sxy * v[:, 0] + syy * v[:, 1] + syz * v[:, 2],
                sxz * v[:, 0] + syz * v[:, 1] + szz * v[:, 2],
            ],
            axis=1,
        )

    s_m0 = sig_dot(m0)
    s_m1 = sig_dot(m1)
    a = jnp.sum(m0 * s_m0, axis=1) + 0.3
    b = jnp.sum(m0 * s_m1, axis=1)
    c = jnp.sum(m1 * s_m1, axis=1) + 0.3
    return jnp.stack([a, b, c], axis=1)


def sh2color(shs, pws, twc, degree=3):
    """Stage 4: real SH (deg 0..3) -> RGB along the view ray (F.4.1).

    shs: [N, 3*(degree+1)^2], RGB interleaved per basis function.
    Parity target: kernel.cu:619-807.
    """
    from easygaussiansplatting_tpu.utils.sh import sh_basis

    n_bases = shs.shape[1] // 3
    ray = pws - twc
    norm = jnp.linalg.norm(ray, axis=1, keepdims=True)
    ray = ray / jnp.maximum(norm, 1e-12)
    basis = sh_basis(jnp, ray[:, 0], ray[:, 1], ray[:, 2], degree)
    sh_rgb = shs.reshape(shs.shape[0], n_bases, 3)
    b = jnp.stack(basis[:n_bases], axis=1)  # [N, n_bases]
    # elementwise multiply + sum, NOT einsum/dot_general: a batch of 65k
    # (1 x n_bases)x(n_bases x 3) matmuls is the worst possible MXU shape
    # (contraction 16, tiles 128) — the VPU reduction fuses into the
    # surrounding elementwise preprocess instead. Plain fp32 adds, so the
    # 1e-4 gradient-parity contract is unaffected.
    return 0.5 + jnp.sum(b[:, :, None] * sh_rgb, axis=1)


def inverse_cov2d(cov2ds):
    """Stage 5: conic (2x2 analytic inverse) + 3-sigma extents (F.5.1-F.5.2).

    Returns (cinv2ds [N,3], areas [N,2] float). Degenerate determinants are
    guarded (zero-gradient) rather than marked like the reference
    (kernel.cu:274-324); the rasteriser's alpha' threshold culls them.
    """
    a, b, c = cov2ds[:, 0], cov2ds[:, 1], cov2ds[:, 2]
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    det_inv = 1.0 / det_safe
    cinv = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=1)
    areas = jnp.ceil(
        3.0 * jnp.sqrt(jnp.abs(jnp.stack([a, c], axis=1)))
    )
    return cinv, areas


def preprocess(pws, shs, alphas, scales, rots, cam, alive=None, sh_degree=3):
    """Run stages 1-5 for a camera. Returns a dict of per-Gaussian arrays plus
    the validity mask (depth cull + optional pool-alive mask)."""
    us, pcs, depths = project(pws, cam.Rcw, cam.tcw, cam.fx, cam.fy, cam.cx, cam.cy)
    cov3ds = compute_cov3d(rots, scales)
    cov2ds = compute_cov2d(cov3ds, pcs, cam.Rcw, cam.fx, cam.fy, cam.width, cam.height)
    colors = sh2color(shs, pws, cam.twc, degree=sh_degree)
    cinv2ds, areas = inverse_cov2d(cov2ds)
    valid = depths >= MIN_DEPTH
    if alive is not None:
        valid = valid & alive
    return {
        "us": us,
        "pcs": pcs,
        "depths": depths,
        "cov3ds": cov3ds,
        "cov2ds": cov2ds,
        "colors": colors,
        "cinv2ds": cinv2ds,
        "areas": areas,
        "alphas": alphas,
        "valid": valid,
    }
