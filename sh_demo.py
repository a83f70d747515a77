"""Spherical-harmonics fitting demo.

The TPU counterpart of the reference's sh_demo.py: fit real-SH coefficients
(degree <= 5, 36 basis functions x RGB = 108 dims, matching
/root/reference/sh_demo.py:181-192) to a color signal on the sphere sampled
from an equirectangular texture, then render the ground truth next to
reconstructions at increasing SH truncation degrees.

Where the reference trains a custom torch autograd Function with Adam on a
cached basis matrix, the TPU-native fit is a single closed-form
least-squares solve: C = (B^T B)^-1 B^T Y — one jitted MXU matmul chain.

    python sh_demo.py                      # procedural texture
    python sh_demo.py --image earth.jpg    # any equirectangular image
"""

import argparse

import numpy as np


def sphere_dirs(h, w):
    """Unit directions for an equirectangular grid (lat-long)."""
    theta = (np.arange(h) + 0.5) / h * np.pi          # polar angle [0, pi]
    phi = (np.arange(w) + 0.5) / w * 2.0 * np.pi      # azimuth [0, 2pi)
    t, p = np.meshgrid(theta, phi, indexing="ij")
    x = np.sin(t) * np.cos(p)
    y = np.sin(t) * np.sin(p)
    z = np.cos(t)
    return x, y, z, np.sin(t)  # sin(theta) = solid-angle weight


def procedural_texture(h, w):
    """Colorful smooth test signal (stands in for the reference's Earth map)."""
    x, y, z, _ = sphere_dirs(h, w)
    r = 0.5 + 0.45 * np.sin(3 * x + 2 * y) * np.cos(2 * z)
    g = 0.5 + 0.45 * np.cos(4 * y * z) * np.sin(x + z)
    b = 0.5 + 0.45 * np.sin(2 * (x + y + z))
    return np.stack([r, g, b], axis=-1).clip(0, 1)


def fit_sh(img, degree):
    """Weighted least-squares SH fit. img: [H,W,3]. Returns coeffs [K,3]."""
    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.utils.sh import sh_basis

    h, w, _ = img.shape
    x, y, z, wgt = sphere_dirs(h, w)
    basis = np.stack(
        sh_basis(np, x.ravel(), y.ravel(), z.ravel(), degree), axis=1
    )  # [N,K]

    @jax.jit
    def solve(B, Y, wv):
        Bw = B * wv[:, None]
        G = jnp.matmul(B.T, Bw, precision=jax.lax.Precision.HIGHEST)
        R = jnp.matmul(Bw.T, Y, precision=jax.lax.Precision.HIGHEST)
        return jnp.linalg.solve(G, R)

    coeffs = solve(
        jnp.asarray(basis, jnp.float32),
        jnp.asarray(img.reshape(-1, 3), jnp.float32),
        jnp.asarray(wgt.ravel(), jnp.float32),
    )
    return np.asarray(coeffs), basis


def reconstruct(basis, coeffs, degree, h, w):
    k = (degree + 1) ** 2
    return (basis[:, :k] @ coeffs[:k]).reshape(h, w, 3)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", help="equirectangular texture (default: procedural)")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--degree", type=int, default=5)
    ap.add_argument("--out", default="sh_demo.png")
    args = ap.parse_args()

    h = args.height
    w = 2 * h
    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((w, h)), np.float32
        ) / 255.0
    else:
        img = procedural_texture(h, w)

    coeffs, basis = fit_sh(img, args.degree)
    rows = [img]
    print(f"fit {coeffs.shape[0]} SH bases (degree {args.degree}, "
          f"{coeffs.size} coefficients)")
    for d in range(args.degree + 1):
        rec = reconstruct(basis, coeffs, d, h, w)
        err = float(np.abs(rec - img).mean())
        print(f"degree {d}: {(d + 1) ** 2:3d} bases, mean |err| = {err:.4f}")
        rows.append(rec.clip(0, 1))

    grid = np.concatenate(rows, axis=0)
    from PIL import Image

    Image.fromarray((grid * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out} (ground truth on top, then degrees 0..{args.degree})")


if __name__ == "__main__":
    main()
