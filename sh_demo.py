"""Spherical-harmonics fitting demo.

The TPU counterpart of the reference's sh_demo.py: fit real-SH coefficients
(degree <= 5, 36 basis functions x RGB = 108 dims, matching
/root/reference/sh_demo.py:181-192) to a color signal on the sphere sampled
from an equirectangular texture, then render the ground truth next to
reconstructions at increasing SH truncation degrees.

Where the reference trains a custom torch autograd Function with Adam on a
cached basis matrix, the TPU-native fit is a single closed-form
least-squares solve: C = (B^T B)^-1 B^T Y — one jitted MXU matmul chain.

    python sh_demo.py                      # procedural texture -> PNG grid
    python sh_demo.py --image earth.jpg    # any equirectangular image
    python sh_demo.py --serve              # interactive rotating spheres

--serve is the counterpart of the reference's live viewer scene
(/root/reference/sh_demo.py:206-271: GT + degree-1/3/4/5 SphereItems
rotating in the Qt window): a browser page shows the five spheres rendered
server-side (orthographic disc; one jitted function of the rotation angle)
and auto-rotates them; drag to scrub.
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


def make_sphere_renderer(img, coeffs, degrees=(1, 3, 4, 5), res=192):
    """Jitted angle -> [res, res*(1+len(degrees)), 3] float strip: the GT
    texture sphere and SH reconstructions at each truncation degree, drawn
    as orthographic discs rotated about the vertical axis (the reference's
    rotating SphereItem row, /root/reference/sh_demo.py:228-268)."""
    import jax
    import jax.numpy as jnp

    from easygaussiansplatting_tpu.utils.sh import sh_basis

    h, w, _ = img.shape
    tex = jnp.asarray(img, jnp.float32)
    cf = jnp.asarray(coeffs, jnp.float32)

    vv, uu = jnp.meshgrid(
        jnp.linspace(1, -1, res), jnp.linspace(-1, 1, res), indexing="ij"
    )
    rr = uu * uu + vv * vv
    mask = rr <= 1.0
    zz = jnp.sqrt(jnp.maximum(0.0, 1.0 - rr))  # toward the viewer

    @jax.jit
    def render(angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # view dirs (x right, z up, y toward viewer) rotated about z
        x = ca * uu + sa * zz
        y = -sa * uu + ca * zz
        z = vv
        panes = []
        # GT: bilinear equirectangular lookup
        theta = jnp.arccos(jnp.clip(z, -1, 1))
        phi = jnp.arctan2(y, x) % (2 * jnp.pi)
        fy = jnp.clip(theta / jnp.pi * h - 0.5, 0, h - 1)
        fx = phi / (2 * jnp.pi) * w - 0.5
        y0 = jnp.floor(fy).astype(jnp.int32)
        x0 = jnp.floor(fx).astype(jnp.int32) % w
        wy = (fy - y0)[..., None]
        wx = (fx - jnp.floor(fx))[..., None]
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = (x0 + 1) % w
        gt = ((1 - wy) * ((1 - wx) * tex[y0, x0] + wx * tex[y0, x1])
              + wy * ((1 - wx) * tex[y1, x0] + wx * tex[y1, x1]))
        panes.append(gt)
        basis = jnp.stack(
            sh_basis(jnp, x.ravel(), y.ravel(), z.ravel(), 5), axis=1
        )  # [res*res, 36]
        for d in degrees:
            k = (d + 1) ** 2
            rec = (basis[:, :k] @ cf[:k]).reshape(res, res, 3)
            panes.append(rec)
        strip = jnp.concatenate(panes, axis=1)
        return jnp.where(
            jnp.tile(mask, (1, len(panes)))[..., None],
            jnp.clip(strip, 0, 1), 0.08,
        )

    return render


_SH_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>SH demo</title><style>body{background:#111;color:#ddd;
font:13px sans-serif;text-align:center}img{margin-top:20px;cursor:grab;
user-select:none}</style></head><body>
<div>ground truth &middot; degree 1 &middot; degree 3 &middot; degree 4 &middot; degree 5
(drag to scrub, auto-rotating)</div>
<img id="i" draggable="false">
<script>
let a=0, drag=null, spin=true;
const img=document.getElementById('i');
img.addEventListener('mousedown',e=>{drag={x:e.clientX,a0:a};spin=false;e.preventDefault()});
window.addEventListener('mousemove',e=>{if(drag){a=drag.a0+(e.clientX-drag.x)*0.01;}});
window.addEventListener('mouseup',()=>{drag=null;spin=true});
async function loop(){
  if(spin) a+=0.03;
  const r=await fetch('/frame?angle='+a.toFixed(4));
  const b=await r.blob(); const u=URL.createObjectURL(b);
  img.onload=()=>URL.revokeObjectURL(u); img.src=u;
  setTimeout(loop, 30);
}
loop();
</script></body></html>"""


def serve_spheres(img, coeffs, port=8081, host="127.0.0.1"):
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import jax
    from PIL import Image

    render = make_sphere_renderer(img, coeffs)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body, ctype = _SH_PAGE.encode(), "text/html"
            elif url.path == "/frame":
                q = {k: v[-1] for k, v in parse_qs(url.query).items()}
                frame = np.asarray(
                    jax.block_until_ready(render(float(q.get("angle", 0.0))))
                )
                buf = io.BytesIO()
                Image.fromarray((frame * 255).astype(np.uint8)).save(
                    buf, format="JPEG", quality=90
                )
                body, ctype = buf.getvalue(), "image/jpeg"
            else:
                body, ctype = b"not found", "text/plain"
                self.send_response(404)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"sh demo: http://{host}:{port}/  (ctrl-c to stop)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", help="equirectangular texture (default: procedural)")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--degree", type=int, default=5)
    ap.add_argument("--out", default="sh_demo.png")
    ap.add_argument("--serve", action="store_true",
                    help="interactive rotating-spheres viewer")
    ap.add_argument("--port", type=int, default=8081)
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
    if args.serve:
        if args.degree < 5:
            coeffs = np.pad(coeffs, ((0, 36 - coeffs.shape[0]), (0, 0)))
        serve_spheres(img, coeffs, port=args.port)
        return

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
