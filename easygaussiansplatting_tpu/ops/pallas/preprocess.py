"""Fused Pallas preprocess: stages 1-5 + raster-table build in ONE kernel.

The per-gaussian preprocess (project / computeCov3D / computeCov2D / sh2Color
/ inverseCov2D, /root/reference/gsplatcu/kernel.cu:274-807) is pure
elementwise math — ~300 VPU ops and ~120 bytes of traffic per gaussian, i.e.
well under 0.1 ms of hardware time at bench scale. The plain-JAX stages
(ops/stages.py) nevertheless cost 3-5 ms in the jitted step (BASELINE.md
attribution): XLA materialises the chain as dozens of small fused loops over
[N]-shaped operands, and per-op fixed overhead dominates at 65k rows. This
module collapses forward AND backward into one pallas_call each.

Layout: gaussians fill both sublanes and lanes. Every per-gaussian scalar
component rides as a [R, 128] plane of a [C, R, 128] array (gaussian g lives
at plane (g // 128, g % 128)), so each VPU op runs at full 8x128 width —
a [N, C] row layout would put C on lanes and waste 128/C of the machine.
The wrapper transposes [N, C] params in and the [19, R, 128] result out;
four small relayouts replace ~100 XLA op dispatches.

Output rows (the forward's single [19, R, 128] array):
  0-15  the packed raster attribute table (kernels.py layout: ux uy ca cb cc
        alpha r g b, zeros pad) — fed straight to rasterize_pallas(table=...),
        which also removes the separate [N,16] concatenate;
  16    depth (camera z),
  17-18 3-sigma extents (areas).

The backward kernel re-reads the same parameter blocks, re-traces the block
forward with jax.vjp — reverse-mode INSIDE the kernel, so the whole
parameter-gradient chain (the reference's Jacobian matmuls,
/root/reference/gsplat/gsmodel.py:71-85) fuses into one Mosaic program — and
writes a [11+S, R, 128] cotangent stack (pws, shs, alpha, scales, rots).

DEFAULT ON for TPU since the r4 on-chip A/B at the landed defaults (15.19
vs 14.99 Mpix/s fwd+bwd, 31.0 vs 30.5 fwd-only; EGS_FUSED_PRE=0 restores
the stages chain, which stays the CPU/interpret default — see
ops/rasterize.py render). The GSPMD-sharded parallel layer runs it through
its own shard_map wrapper (a Mosaic call cannot be auto-partitioned;
parallel/train.py fused_batched_preprocess).

Limitation: camera-parameter gradients are NOT propagated (the custom_vjp
returns zeros for the camera vector) — unlike the stages path, where plain
autodiff would carry them. Nothing in the framework trains cameras; if pose
refinement is ever added, extend _bwd_kernel's jax.vjp to the cam operand.
"""

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from easygaussiansplatting_tpu.ops.pallas.kernels import PACK_ROWS
from easygaussiansplatting_tpu.ops.stages import MIN_DEPTH
from easygaussiansplatting_tpu.utils.sh import sh_basis

LANES = 128
# grid-block rows: RB*128 gaussians per grid step. 32 rows = 4096 gaussians
# keeps the backward's block footprint (params + cotangents + vjp
# intermediates at deg-3 SH) comfortably inside VMEM.
RB = int(os.environ.get("EGS_FUSED_RB", "32"))
OUT_ROWS = PACK_ROWS + 3  # table + depth + area_x + area_y
CAM_LEN = 21  # Rcw(9) tcw(3) twc(3) fx fy cx cy limx limy


def _forward_rows(cam, px, py, pz, sh, alpha, sx, sy, sz, qw, qx, qy, qz):
    """Stages 1-5 on [R,128] component planes -> list of OUT_ROWS planes.

    Expression-for-expression the same fp32 math as ops/stages.py (the
    parity oracle chain golden -> stages -> fused); `cam` is the flat
    camera vector (python-indexed scalars), `sh` a list of S planes.
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = (cam[i] for i in range(9))
    t0, t1, t2 = cam[9], cam[10], cam[11]
    w0, w1, w2 = cam[12], cam[13], cam[14]  # twc
    fx, fy, cx, cy = cam[15], cam[16], cam[17], cam[18]
    limx, limy = cam[19], cam[20]  # 1.3 * tan_fov

    # stage 1: project (stages.project)
    pcx = px * r00 + py * r01 + pz * r02 + t0
    pcy = px * r10 + py * r11 + pz * r12 + t1
    pcz = px * r20 + py * r21 + pz * r22 + t2
    zsafe = jnp.where(pcz >= MIN_DEPTH, pcz, 1.0)
    ux = pcx * fx / zsafe + cx
    uy = pcy * fy / zsafe + cy

    # stage 2: cov3d (stages.compute_cov3d) — columns of M = R(q) diag(s)
    m00 = (1 - 2 * (qy * qy + qz * qz)) * sx
    m01 = (2 * (qx * qy - qz * qw)) * sy
    m02 = (2 * (qx * qz + qy * qw)) * sz
    m10 = (2 * (qx * qy + qz * qw)) * sx
    m11 = (1 - 2 * (qx * qx + qz * qz)) * sy
    m12 = (2 * (qy * qz - qx * qw)) * sz
    m20 = (2 * (qx * qz - qy * qw)) * sx
    m21 = (2 * (qy * qz + qx * qw)) * sy
    m22 = (1 - 2 * (qx * qx + qy * qy)) * sz
    sxx = m00 * m00 + m01 * m01 + m02 * m02
    sxy = m00 * m10 + m01 * m11 + m02 * m12
    sxz = m00 * m20 + m01 * m21 + m02 * m22
    syy = m10 * m10 + m11 * m11 + m12 * m12
    syz = m10 * m20 + m11 * m21 + m12 * m22
    szz = m20 * m20 + m21 * m21 + m22 * m22

    # stage 3: EWA cov2d (stages.compute_cov2d)
    cxv = jnp.clip(pcx / zsafe, -limx, limx) * zsafe
    cyv = jnp.clip(pcy / zsafe, -limy, limy) * zsafe
    z2 = zsafe * zsafe
    jx0 = fx / zsafe
    jx2 = -fx * cxv / z2
    jy1 = fy / zsafe
    jy2 = -fy * cyv / z2
    # rows of M2 = J @ Rcw
    a0 = jx0 * r00 + jx2 * r20
    a1 = jx0 * r01 + jx2 * r21
    a2 = jx0 * r02 + jx2 * r22
    b0 = jy1 * r10 + jy2 * r20
    b1 = jy1 * r11 + jy2 * r21
    b2 = jy1 * r12 + jy2 * r22
    sa0 = sxx * a0 + sxy * a1 + sxz * a2
    sa1 = sxy * a0 + syy * a1 + syz * a2
    sa2 = sxz * a0 + syz * a1 + szz * a2
    sb0 = sxx * b0 + sxy * b1 + sxz * b2
    sb1 = sxy * b0 + syy * b1 + syz * b2
    sb2 = sxz * b0 + syz * b1 + szz * b2
    ca = a0 * sa0 + a1 * sa1 + a2 * sa2 + 0.3
    cb = a0 * sb0 + a1 * sb1 + a2 * sb2
    cc = b0 * sb0 + b1 * sb1 + b2 * sb2 + 0.3

    # stage 4: SH -> RGB (stages.sh2color; sh_basis is shape-polymorphic)
    rx = px - w0
    ry = py - w1
    rz = pz - w2
    norm = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    inv = 1.0 / jnp.maximum(norm, 1e-12)
    n_bases = len(sh) // 3
    deg = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4, 36: 5}[n_bases]
    basis = sh_basis(jnp, rx * inv, ry * inv, rz * inv, deg)
    col = [None, None, None]
    for c in range(3):
        acc = basis[0] * sh[c]
        for k in range(1, n_bases):
            acc = acc + basis[k] * sh[3 * k + c]
        col[c] = 0.5 + acc

    # stage 5: conic + extents (stages.inverse_cov2d)
    det = ca * cc - cb * cb
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    det_inv = 1.0 / det_safe
    zero = jnp.zeros_like(px)
    return [
        ux, uy, cc * det_inv, -cb * det_inv, ca * det_inv, alpha,
        col[0], col[1], col[2],
    ] + [zero] * (PACK_ROWS - 9) + [  # table pad -> PACK_ROWS rows
        pcz,
        jnp.ceil(3.0 * jnp.sqrt(jnp.abs(ca))),
        jnp.ceil(3.0 * jnp.sqrt(jnp.abs(cc))),
    ]


def _split(pws_ref, shs_ref, alphas_ref, scales_ref, rots_ref):
    sh = [shs_ref[i] for i in range(shs_ref.shape[0])]
    return (
        pws_ref[0], pws_ref[1], pws_ref[2], sh, alphas_ref[0],
        scales_ref[0], scales_ref[1], scales_ref[2],
        rots_ref[0], rots_ref[1], rots_ref[2], rots_ref[3],
    )


def _fwd_kernel(cam_ref, pws_ref, shs_ref, alphas_ref, scales_ref, rots_ref,
                out_ref):
    cam = [cam_ref[0, i] for i in range(CAM_LEN)]
    px, py, pz, sh, alpha, sx, sy, sz, qw, qx, qy, qz = _split(
        pws_ref, shs_ref, alphas_ref, scales_ref, rots_ref)
    rows = _forward_rows(cam, px, py, pz, sh, alpha, sx, sy, sz, qw, qx, qy, qz)
    for i, r in enumerate(rows):
        out_ref[i] = r


def _bwd_kernel(cam_ref, pws_ref, shs_ref, alphas_ref, scales_ref, rots_ref,
                ct_ref, dout_ref, *, s_dim):
    cam = [cam_ref[0, i] for i in range(CAM_LEN)]

    def f(pws, shs, alphas, scales, rots):
        rows = _forward_rows(
            cam, pws[0], pws[1], pws[2], [shs[i] for i in range(s_dim)],
            alphas[0], scales[0], scales[1], scales[2],
            rots[0], rots[1], rots[2], rots[3],
        )
        return jnp.stack(rows)

    primals = (pws_ref[:], shs_ref[:], alphas_ref[:], scales_ref[:], rots_ref[:])
    _, vjp = jax.vjp(f, *primals)
    d_pws, d_shs, d_alphas, d_scales, d_rots = vjp(ct_ref[:])
    dout_ref[0:3] = d_pws
    dout_ref[3:3 + s_dim] = d_shs
    dout_ref[3 + s_dim:4 + s_dim] = d_alphas
    dout_ref[4 + s_dim:7 + s_dim] = d_scales
    dout_ref[7 + s_dim:11 + s_dim] = d_rots


def _block(c):
    """BlockSpec: all C component planes resident, RB sublane rows per step."""
    return pl.BlockSpec((c, RB, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(cam, pws_t, shs_t, alphas_t, scales_t, rots_t, *, interpret):
    s = shs_t.shape[0]
    r = pws_t.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(r // RB,),
        in_specs=[
            # scalars must be 2D in SMEM (pallas guide) -> [1, CAM_LEN]
            pl.BlockSpec((1, CAM_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            _block(3), _block(s), _block(1), _block(3), _block(4),
        ],
        out_specs=_block(OUT_ROWS),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, r, LANES), jnp.float32),
        interpret=interpret,
    )(cam, pws_t, shs_t, alphas_t, scales_t, rots_t)


@partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(cam, pws_t, shs_t, alphas_t, scales_t, rots_t, ct, *, interpret):
    s = shs_t.shape[0]
    r = pws_t.shape[1]
    kern = functools.partial(_bwd_kernel, s_dim=s)
    return pl.pallas_call(
        kern,
        grid=(r // RB,),
        in_specs=[
            pl.BlockSpec((1, CAM_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            _block(3), _block(s), _block(1), _block(3), _block(4),
            _block(OUT_ROWS),
        ],
        out_specs=_block(11 + s),
        out_shape=jax.ShapeDtypeStruct((11 + s, r, LANES), jnp.float32),
        interpret=interpret,
    )(cam, pws_t, shs_t, alphas_t, scales_t, rots_t, ct)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(interpret, cam, pws_t, shs_t, alphas_t, scales_t, rots_t):
    return _fwd_call(cam, pws_t, shs_t, alphas_t, scales_t, rots_t,
                     interpret=interpret)


def _fused_fwd(interpret, cam, pws_t, shs_t, alphas_t, scales_t, rots_t):
    out = _fwd_call(cam, pws_t, shs_t, alphas_t, scales_t, rots_t,
                    interpret=interpret)
    return out, (cam, pws_t, shs_t, alphas_t, scales_t, rots_t)


def _fused_bwd(interpret, res, ct):
    cam, pws_t, shs_t, alphas_t, scales_t, rots_t = res
    s = shs_t.shape[0]
    d = _bwd_call(cam, pws_t, shs_t, alphas_t, scales_t, rots_t, ct,
                  interpret=interpret)
    return (
        jnp.zeros_like(cam),
        d[0:3], d[3:3 + s], d[3 + s:4 + s], d[4 + s:7 + s], d[7 + s:11 + s],
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def _to_planes(x):
    """[N, C] (or [N]) -> [C, N/128, 128] component planes."""
    if x.ndim == 1:
        x = x[:, None]
    n, c = x.shape
    return jnp.transpose(x, (1, 0)).reshape(c, n // LANES, LANES)


def fused_preprocess(pws, shs, alphas, scales, rots, cam, alive=None,
                     sh_degree=3, interpret=None):
    """Drop-in for stages.preprocess on the Pallas path.

    Returns the stages.preprocess dict (minus pcs/cov3ds/cov2ds, which no
    production consumer reads) plus ``table`` — the packed [N,16] raster
    attribute table ready for rasterize_pallas(table=...).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pws.shape[0]
    # stages.sh2color infers the basis count from the shs width (`degree` is
    # only an upper cap); mirror that — the kernel maps n_bases -> degree
    if shs.shape[1] % 3 or shs.shape[1] // 3 not in (1, 4, 9, 16, 25, 36):
        raise ValueError(f"shs width {shs.shape[1]} is not 3*(deg+1)^2")
    if shs.shape[1] > 3 * (sh_degree + 1) ** 2:
        raise ValueError(
            f"shs width {shs.shape[1]} exceeds sh_degree={sh_degree}"
        )
    step = LANES * RB
    n_pad = -(-n // step) * step

    def pad(x):
        return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

    f32 = jnp.float32
    limx = 1.3 * (cam.width / (2.0 * cam.fx))
    limy = 1.3 * (cam.height / (2.0 * cam.fy))
    camvec = jnp.concatenate([
        jnp.asarray(cam.Rcw, f32).reshape(9),
        jnp.asarray(cam.tcw, f32).reshape(3),
        jnp.asarray(cam.twc, f32).reshape(3),
        jnp.stack([jnp.asarray(v, f32) for v in
                   (cam.fx, cam.fy, cam.cx, cam.cy, limx, limy)]),
    ])[None, :]  # [1, CAM_LEN]: scalars ride SMEM as 2D
    out = _fused(
        bool(interpret), camvec,
        _to_planes(pad(pws.astype(f32))),
        _to_planes(pad(shs.astype(f32))),
        _to_planes(pad(alphas.astype(f32))),
        _to_planes(pad(scales.astype(f32))),
        _to_planes(pad(rots.astype(f32))),
    )  # [19, n_pad/128, 128]
    flat = jnp.transpose(out.reshape(OUT_ROWS, n_pad), (1, 0))[:n]
    table = flat[:, :PACK_ROWS]
    depths = flat[:, PACK_ROWS]
    valid = depths >= MIN_DEPTH
    if alive is not None:
        valid = valid & alive
    return {
        "table": table,
        "us": table[:, 0:2],
        "cinv2ds": table[:, 2:5],
        "colors": table[:, 6:9],
        "alphas": alphas,
        "depths": depths,
        "areas": flat[:, PACK_ROWS + 1:PACK_ROWS + 3],
        "valid": valid,
    }


def offset_table(table, us_offset):
    """Shift the fused table's screen coordinates by the densification
    ``us_offset`` and return ``(table, us)``.

    ``table`` is ``[..., N, PACK_ROWS]`` with (ux, uy) in columns 0:2 —
    this helper owns that layout so callers (ops/rasterize.render,
    parallel/train.train_step) stay in lockstep if it ever changes.
    ``us_offset`` is ``[N, 2]`` or None.
    """
    if us_offset is not None:
        table = table + jnp.pad(us_offset, ((0, 0), (0, PACK_ROWS - 2)))
    return table, table[..., 0:2]
