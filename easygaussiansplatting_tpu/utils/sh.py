"""Real spherical-harmonics constants, degrees 0..5.

Standard real-SH normalisation constants (see
https://en.wikipedia.org/wiki/Table_of_spherical_harmonics). The rendering
pipeline evaluates degrees 0..3 (capability parity with the reference CUDA
kernel, /root/reference/gsplatcu/common.cuh:29-44); degrees 4..5 are used by
the SH-fitting demo (parity with /root/reference/gsplat/sh_coef.py:1-46 and
sh_demo.py).

Each ``SH_Cn`` tuple holds the 2n+1 signed constants for degree n, ordered by
m = -n..n, matching the basis-polynomial order used by :func:`sh_basis`.
"""

import math

SH_C0 = (0.5 * math.sqrt(1.0 / math.pi),)  # Y0,0

_c1 = math.sqrt(3.0 / (4.0 * math.pi))
SH_C1 = (-_c1, _c1, -_c1)  # Y1,-1  Y1,0  Y1,1

SH_C2 = (
    0.5 * math.sqrt(15.0 / math.pi),    # Y2,-2
    -0.5 * math.sqrt(15.0 / math.pi),   # Y2,-1
    0.25 * math.sqrt(5.0 / math.pi),    # Y2,0
    -0.5 * math.sqrt(15.0 / math.pi),   # Y2,1
    0.25 * math.sqrt(15.0 / math.pi),   # Y2,2
)

SH_C3 = (
    -0.25 * math.sqrt(35.0 / (2.0 * math.pi)),  # Y3,-3
    0.5 * math.sqrt(105.0 / math.pi),           # Y3,-2
    -0.25 * math.sqrt(21.0 / (2.0 * math.pi)),  # Y3,-1
    0.25 * math.sqrt(7.0 / math.pi),            # Y3,0
    -0.25 * math.sqrt(21.0 / (2.0 * math.pi)),  # Y3,1
    0.25 * math.sqrt(105.0 / math.pi),          # Y3,2
    -0.25 * math.sqrt(35.0 / (2.0 * math.pi)),  # Y3,3
)

SH_C4 = (
    0.75 * math.sqrt(35.0 / math.pi),           # Y4,-4
    -0.75 * math.sqrt(35.0 / (2.0 * math.pi)),  # Y4,-3
    0.75 * math.sqrt(5.0 / math.pi),            # Y4,-2
    -0.75 * math.sqrt(5.0 / (2.0 * math.pi)),   # Y4,-1
    (3.0 / 16.0) * math.sqrt(1.0 / math.pi),    # Y4,0
    -0.75 * math.sqrt(5.0 / (2.0 * math.pi)),   # Y4,1
    (3.0 / 8.0) * math.sqrt(5.0 / math.pi),     # Y4,2
    -0.75 * math.sqrt(35.0 / (2.0 * math.pi)),  # Y4,3
    (3.0 / 16.0) * math.sqrt(35.0 / math.pi),   # Y4,4
)

SH_C5 = (
    -(3.0 / 32.0) * math.sqrt(154.0 / math.pi),   # Y5,-5
    (3.0 / 4.0) * math.sqrt(385.0 / math.pi),     # Y5,-4
    -(1.0 / 32.0) * math.sqrt(770.0 / math.pi),   # Y5,-3
    (1.0 / 4.0) * math.sqrt(1155.0 / math.pi),    # Y5,-2
    -(1.0 / 16.0) * math.sqrt(165.0 / math.pi),   # Y5,-1
    (1.0 / 16.0) * math.sqrt(11.0 / math.pi),     # Y5,0
    -(1.0 / 16.0) * math.sqrt(165.0 / math.pi),   # Y5,1
    (1.0 / 8.0) * math.sqrt(1155.0 / math.pi),    # Y5,2
    -(1.0 / 32.0) * math.sqrt(770.0 / math.pi),   # Y5,3
    (3.0 / 16.0) * math.sqrt(385.0 / math.pi),    # Y5,4
    -(3.0 / 32.0) * math.sqrt(154.0 / math.pi),   # Y5,5
)


def num_sh_bases(degree: int) -> int:
    """Number of SH basis functions for degrees 0..degree inclusive."""
    return (degree + 1) ** 2


def sh_basis(xp, x, y, z, degree: int):
    """Evaluate the real SH basis polynomials (degrees 0..degree) at unit
    directions (x, y, z).

    ``xp`` is the array namespace (numpy or jax.numpy) so the same expression
    serves the float64 golden model and the fp32 TPU path. Returns a list of
    (degree+1)^2 arrays shaped like ``x``.

    Basis order per degree matches the reference pipeline
    (/root/reference/gsplat/gausplat.py:56-99): deg 1 uses (y, z, x) etc.
    """
    one = xp.ones_like(x)
    out = [SH_C0[0] * one]
    if degree == 0:
        return out
    out += [SH_C1[0] * y, SH_C1[1] * z, SH_C1[2] * x]
    if degree == 1:
        return out
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out += [
        SH_C2[0] * xy,
        SH_C2[1] * yz,
        SH_C2[2] * (2.0 * zz - xx - yy),
        SH_C2[3] * xz,
        SH_C2[4] * (xx - yy),
    ]
    if degree == 2:
        return out
    out += [
        SH_C3[0] * y * (3.0 * xx - yy),
        SH_C3[1] * xy * z,
        SH_C3[2] * y * (4.0 * zz - xx - yy),
        SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        SH_C3[4] * x * (4.0 * zz - xx - yy),
        SH_C3[5] * z * (xx - yy),
        SH_C3[6] * x * (xx - 3.0 * yy),
    ]
    if degree == 3:
        return out
    out += [
        SH_C4[0] * xy * (xx - yy),
        SH_C4[1] * yz * (3.0 * xx - yy),
        SH_C4[2] * xy * (7.0 * zz - 1.0),
        SH_C4[3] * yz * (7.0 * zz - 3.0),
        SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
        SH_C4[5] * xz * (7.0 * zz - 3.0),
        SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
        SH_C4[7] * xz * (xx - 3.0 * yy),
        SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
    ]
    if degree == 4:
        return out
    # Degree-5 polynomial forms follow the reference SH demo's convention
    # (/root/reference/sh_demo.py:152-162), including its sign-flipped
    # variants for m = -1, 0, 1.
    zz2 = zz * zz
    out += [
        SH_C5[0] * y * (5.0 * xx * xx - 10.0 * xx * yy + yy * yy),
        SH_C5[1] * xy * z * (xx - yy),
        SH_C5[2] * y * (3.0 * xx - yy) * (9.0 * zz - 1.0),
        SH_C5[3] * xy * z * (3.0 * zz - 1.0),
        SH_C5[4] * y * (14.0 * zz - 21.0 * zz2 - 1.0),
        SH_C5[5] * z * (70.0 * zz - 63.0 * zz2 - 15.0),
        SH_C5[6] * x * (14.0 * zz - 21.0 * zz2 - 1.0),
        SH_C5[7] * z * (xx - yy) * (3.0 * zz - 1.0),
        SH_C5[8] * x * (xx - 3.0 * yy) * (9.0 * zz - 1.0),
        SH_C5[9] * z * (xx * xx - 6.0 * xx * yy + yy * yy),
        SH_C5[10] * x * (xx * xx - 10.0 * xx * yy + 5.0 * yy * yy),
    ]
    return out


def sh_basis_grad(xp, x, y, z, degree: int):
    """Gradients of the degree-0..3 basis polynomials w.r.t. the (pre-
    normalisation-chain) direction components: a list of (dY/dx, dY/dy,
    dY/dz) triples in :func:`sh_basis` order. Rendering evaluates degrees
    <= 3; the analytic-Jacobian harness (golden/analytic.py) chains these
    through the direction normalisation."""
    if degree > 3:
        raise NotImplementedError("analytic SH gradients cover degrees <= 3")
    zero = xp.zeros_like(x)
    out = [(zero, zero, zero)]  # Y0,0 constant
    if degree >= 1:
        c = SH_C1
        one = xp.ones_like(x)
        out += [
            (zero, c[0] * one, zero),          # c*y
            (zero, zero, c[1] * one),          # c*z
            (c[2] * one, zero, zero),          # c*x
        ]
    if degree >= 2:
        c = SH_C2
        out += [
            (c[0] * y, c[0] * x, zero),                        # xy
            (zero, c[1] * z, c[1] * y),                        # yz
            (-2 * c[2] * x, -2 * c[2] * y, 4 * c[2] * z),      # 2z^2-x^2-y^2
            (c[3] * z, zero, c[3] * x),                        # xz
            (2 * c[4] * x, -2 * c[4] * y, zero),               # x^2-y^2
        ]
    if degree >= 3:
        c = SH_C3
        xx, yy, zz = x * x, y * y, z * z
        out += [
            (c[0] * 6 * x * y, c[0] * (3 * xx - 3 * yy), zero),
            (c[1] * y * z, c[1] * x * z, c[1] * x * y),
            (c[2] * (-2 * x * y), c[2] * (4 * zz - xx - 3 * yy),
             c[2] * 8 * y * z),
            (c[3] * (-6 * x * z), c[3] * (-6 * y * z),
             c[3] * (6 * zz - 3 * xx - 3 * yy)),
            (c[4] * (4 * zz - 3 * xx - yy), c[4] * (-2 * x * y),
             c[4] * 8 * x * z),
            (c[5] * 2 * x * z, c[5] * (-2 * y * z), c[5] * (xx - yy)),
            (c[6] * (3 * xx - 3 * yy), c[6] * (-6 * x * y), zero),
        ]
    return out
