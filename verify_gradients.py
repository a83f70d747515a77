"""Numerical-differentiation verification of the whole differentiable pipeline.

The TPU counterpart of the reference's backward_cpu.py (numerical diff of
every Jacobian) and backward_gpu.py (device-vs-CPU parity): on the canonical
4-Gaussian / 32x16 fixture it checks, printing [OK]/[NG] at abs tol 1e-4:

 1. stage primal parity: JAX stages 1-5 vs the float64 golden model;
 2. stage gradients: JAX autodiff VJPs vs finite differences of the golden
    stage functions (random fixed cotangents);
 3. rendered-image parity: tiled + Pallas backends vs the golden tile render;
 4. end-to-end parameter gradients: d(L1 loss)/d{pws, shs, alphas, scales,
    rots} by autodiff vs finite differences through the full golden renderer
    — on BOTH backends: "tiled" (plain AD) at 1e-4, and the shipped Pallas
    kernels at a scale-relative fp32 tolerance (reference checks its device
    gradients too, backward_gpu.py:81-162).

35 checks (36 on TPU, where a multi-scan-block sort-reduce-vs-scatter
parity check runs at M=131072 — fixture scale cannot exercise inter-block
carries); exit code 0 iff everything is [OK]. The count includes the 8
hand-derived analytic Jacobian checks (golden/analytic.py — the third,
autodiff-independent gradient implementation, mirroring the reference's
backward_cpu.py:68-499).
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu import golden
    from easygaussiansplatting_tpu.data import example_camera, example_gaussians
    from easygaussiansplatting_tpu.golden.numdiff import check, numerical_derivative
    from easygaussiansplatting_tpu.models import Camera
    from easygaussiansplatting_tpu.ops import stages
    from easygaussiansplatting_tpu.ops.rasterize import render

    rng = np.random.default_rng(0)
    g = example_gaussians()
    c = example_camera()
    cam = Camera.from_dict(c)
    n = g["pws"].shape[0]
    # degree-3 SH like the reference harness (backward_cpu.py:503-527)
    shs = np.zeros((n, 48))
    shs[:, :3] = g["shs"]
    shs[:, 3:] = rng.normal(size=(n, 45)) * 0.05

    ok = True
    f32 = lambda x: jnp.asarray(x, jnp.float32)

    # ---- 1. stage primal parity -------------------------------------------
    us_g, pcs_g, depths_g = golden.project(
        g["pws"], c["Rcw"], c["tcw"], c["fx"], c["fy"], c["cx"], c["cy"]
    )
    us_j, pcs_j, depths_j = stages.project(
        f32(g["pws"]), cam.Rcw, cam.tcw, cam.fx, cam.fy, cam.cx, cam.cy
    )
    ok &= check(us_j, us_g, name="project: us")
    ok &= check(pcs_j, pcs_g, name="project: pcs")

    cov3d_g = golden.compute_cov3d(g["rots"], g["scales"])
    cov3d_j = stages.compute_cov3d(f32(g["rots"]), f32(g["scales"]))
    ok &= check(cov3d_j, cov3d_g, name="computeCov3D")

    cov2d_g = golden.compute_cov2d(cov3d_g, pcs_g, c["Rcw"], c["fx"], c["fy"], c["width"], c["height"])
    cov2d_j = stages.compute_cov2d(cov3d_j, pcs_j, cam.Rcw, cam.fx, cam.fy, cam.width, cam.height)
    ok &= check(cov2d_j, cov2d_g, name="computeCov2D")

    twc_g = -np.asarray(c["Rcw"]).T @ np.asarray(c["tcw"])
    color_g = golden.sh2color(shs, g["pws"], twc_g, degree=3)
    color_j = stages.sh2color(f32(shs), f32(g["pws"]), cam.twc, degree=3)
    ok &= check(color_j, color_g, name="sh2Color")

    cinv_g, areas_g = golden.inverse_cov2d(cov2d_g)
    cinv_j, areas_j = stages.inverse_cov2d(cov2d_j)
    ok &= check(cinv_j, cinv_g, name="inverseCov2D: cinv")
    ok &= check(areas_j, areas_g, name="inverseCov2D: areas")

    # ---- 2. stage gradients (VJP vs finite diff) --------------------------
    def vjp_vs_numdiff(name, jfun, gfun, args, wrt):
        primal = np.asarray(gfun(*args))
        ct = rng.normal(size=primal.shape)
        jargs = [f32(a) for a in args]
        _, vjp = jax.vjp(jfun, *jargs)
        grads = vjp(f32(ct))
        res = True
        for i in wrt:
            J = numerical_derivative(gfun, args, i)
            num = (ct.reshape(1, -1) @ J).reshape(np.asarray(args[i]).shape)
            res &= check(np.asarray(grads[i]), num, name=f"{name}: d/d arg{i}")
        return res

    ok &= vjp_vs_numdiff(
        "project grad",
        lambda pws: stages.project(pws, cam.Rcw, cam.tcw, cam.fx, cam.fy, cam.cx, cam.cy)[0],
        lambda pws: golden.project(pws, c["Rcw"], c["tcw"], c["fx"], c["fy"], c["cx"], c["cy"])[0],
        [g["pws"]], wrt=[0],
    )
    ok &= vjp_vs_numdiff(
        "cov3d grad", stages.compute_cov3d, golden.compute_cov3d,
        [g["rots"], g["scales"]], wrt=[0, 1],
    )
    ok &= vjp_vs_numdiff(
        "cov2d grad",
        lambda c3, pc: stages.compute_cov2d(c3, pc, cam.Rcw, cam.fx, cam.fy, cam.width, cam.height),
        lambda c3, pc: golden.compute_cov2d(c3, pc, c["Rcw"], c["fx"], c["fy"], c["width"], c["height"]),
        [cov3d_g, pcs_g], wrt=[0, 1],
    )
    ok &= vjp_vs_numdiff(
        "sh2color grad",
        lambda s, p: stages.sh2color(s, p, cam.twc, degree=3),
        lambda s, p: golden.sh2color(s, p, twc_g, degree=3),
        [shs, g["pws"]], wrt=[0, 1],
    )
    ok &= vjp_vs_numdiff(
        "conic grad",
        lambda c2: stages.inverse_cov2d(c2)[0],
        lambda c2: golden.inverse_cov2d(c2)[0],
        [cov2d_g], wrt=[0],
    )

    # ---- 2b. hand-derived analytic Jacobians (third implementation) -------
    # golden/analytic.py closes the triangle the reference closes with
    # backward_cpu.py: hand derivation vs numerics, independent of autodiff.
    from easygaussiansplatting_tpu.golden import analytic

    def blocks(J, out_per, in_per):
        nb = J.shape[0] // out_per
        return np.stack([
            J[i * out_per:(i + 1) * out_per, i * in_per:(i + 1) * in_per]
            for i in range(nb)
        ])

    du_a, dz_a = analytic.project_jacobians(
        g["pws"], c["Rcw"], c["tcw"], c["fx"], c["fy"])
    J = numerical_derivative(
        lambda p: golden.project(p, c["Rcw"], c["tcw"], c["fx"], c["fy"],
                                 c["cx"], c["cy"])[0], [g["pws"]], 0)
    ok &= check(du_a, blocks(J, 2, 3), name="analytic project Jacobian")
    dq_a, ds_a = analytic.cov3d_jacobians(g["rots"], g["scales"])
    J = numerical_derivative(
        lambda r: golden.compute_cov3d(r, g["scales"]), [g["rots"]], 0)
    ok &= check(dq_a, blocks(J, 6, 4), name="analytic cov3d dq Jacobian")
    J = numerical_derivative(
        lambda s: golden.compute_cov3d(g["rots"], s), [g["scales"]], 0)
    ok &= check(ds_a, blocks(J, 6, 3), name="analytic cov3d ds Jacobian")
    dsig_a, dpc_a = analytic.cov2d_jacobians(
        cov3d_g, pcs_g, c["Rcw"], c["fx"], c["fy"], c["width"], c["height"])
    J = numerical_derivative(
        lambda c3: golden.compute_cov2d(c3, pcs_g, c["Rcw"], c["fx"],
                                        c["fy"], c["width"], c["height"]),
        [cov3d_g], 0)
    ok &= check(dsig_a, blocks(J, 3, 6), name="analytic cov2d Jacobian")
    J = numerical_derivative(
        lambda pc: golden.compute_cov2d(cov3d_g, pc, c["Rcw"], c["fx"],
                                        c["fy"], c["width"], c["height"]),
        [pcs_g], 0)
    ok &= check(dpc_a, blocks(J, 3, 3), name="analytic cov2d dpc Jacobian")
    dshs_a, dpws_a = analytic.sh2color_jacobians(shs, g["pws"], twc_g)
    J = numerical_derivative(
        lambda h: golden.sh2color(h, g["pws"], twc_g), [shs], 0)
    ok &= check(dshs_a, blocks(J, 3, 48), name="analytic sh2color dshs")
    J = numerical_derivative(
        lambda p: golden.sh2color(shs, p, twc_g), [g["pws"]], 0)
    ok &= check(dpws_a, blocks(J, 3, 3), name="analytic sh2color dpws")
    J = numerical_derivative(
        lambda c2: golden.inverse_cov2d(c2)[0], [cov2d_g], 0)
    ok &= check(analytic.conic_jacobians(cov2d_g), blocks(J, 3, 3),
                name="analytic conic Jacobian")

    # ---- 3. rendered-image parity ------------------------------------------
    img_g, _ = golden.render(
        g["pws"], shs, g["alphas"], g["scales"], g["rots"],
        c["Rcw"], c["tcw"], c["fx"], c["fy"], c["cx"], c["cy"], c["width"], c["height"],
    )
    pargs = (f32(g["pws"]), f32(shs), f32(g["alphas"]), f32(g["scales"]), f32(g["rots"]))
    for backend in ("tiled", "pallas"):
        img_b, _ = render(*pargs, cam, backend=backend, max_patches=2**12)
        ok &= check(np.asarray(img_b), img_g, name=f"render image ({backend})")

    # ---- 4. end-to-end parameter gradients ---------------------------------
    gt = rng.uniform(size=(3, c["height"], c["width"]))

    def golden_loss(pws, shs_, alphas, scales, rots):
        img, _ = golden.render(
            pws, shs_, alphas, scales, rots,
            c["Rcw"], c["tcw"], c["fx"], c["fy"], c["cx"], c["cy"],
            c["width"], c["height"],
        )
        return np.array([np.abs(img - gt).mean()])

    def make_jax_loss(backend):
        def jax_loss(*params):
            img, _ = render(*params, cam, backend=backend, max_patches=2**12)
            return jnp.abs(img - jnp.asarray(gt, jnp.float32)).mean()

        return jax_loss

    grads = jax.grad(make_jax_loss("tiled"), argnums=(0, 1, 2, 3, 4))(*pargs)
    # flagship path: the shipped Pallas kernels, not just the AD fallback
    grads_p = jax.grad(make_jax_loss("pallas"), argnums=(0, 1, 2, 3, 4))(*pargs)
    gargs = [g["pws"], shs, g["alphas"], g["scales"], g["rots"]]
    names = ["pws", "shs", "alphas", "scales", "rots"]
    for i, nm in enumerate(names):
        J = numerical_derivative(golden_loss, gargs, i, delta=1e-6)
        num = J.reshape(np.asarray(gargs[i]).shape)
        ok &= check(np.asarray(grads[i]), num, name=f"dloss/d{nm}")
        # fp32 kernels vs float64 finite diff: hold the Pallas backward to a
        # scale-relative fp32 tolerance (hand-written suffix-product replay;
        # ~1e-3 of the gradient magnitude is the honest fp32 bound)
        tol = max(1e-4, 1.5e-3 * float(np.abs(num).max()))
        ok &= check(np.asarray(grads_p[i]), num, atol=tol,
                    name=f"dloss/d{nm} (pallas, fp32 tol {tol:.1e})")

    # ---- 5. gradient-reduction parity PAST the kernels' block lengths -----
    # The fixture is one scan-block/sort-block wide; a carry bug in the
    # segmented scan once corrupted per-gaussian sums ONLY for patch runs
    # crossing a 16384-lane block boundary (fixed; tests/test_scan.py).
    # On-chip, compare the sort-reduce path against the XLA scatter-add at
    # M well past the block length so inter-block carries are exercised.
    if jax.default_backend() == "tpu":
        from easygaussiansplatting_tpu.ops.pallas.rasterize import (
            GRAD_USED,
            _sort_reduce_grads,
        )

        m_big, n_big = 1 << 17, 4096  # ~32 patches/gaussian, 8 scan blocks
        gsid = np.sort(rng.integers(-1, n_big, size=m_big)).astype(np.int32)
        live = gsid >= 0
        gsafe = np.maximum(gsid, 0).astype(np.int32)
        rows_ct = np.where(
            live[None, :], rng.normal(size=(GRAD_USED, m_big)), 0.0
        ).astype(np.float32)
        counts = np.bincount(gsafe[live], minlength=n_big).astype(np.int32)
        got = np.asarray(_sort_reduce_grads(
            f32(rows_ct), jnp.asarray(gsafe), jnp.asarray(live),
            jnp.asarray(counts), n_big,
        ))
        want = np.zeros((GRAD_USED, n_big), np.float32)
        np.add.at(want.T, gsafe[live], rows_ct.T[live])
        ok &= check(got, want, atol=2e-4,
                    name=f"sort-reduce vs scatter @ M={m_big} (multi-block)")

    print("\nALL OK" if ok else "\nFAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
