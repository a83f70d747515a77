"""Tiled rasteriser: vectorised over tiles, chunked over depth, plain-AD.

Differentiable production path until/alongside the Pallas kernels: the tile
loop of the CUDA draw kernel (/root/reference/gsplatcu/kernel.cu:152-271)
becomes a lax.scan over fixed-size chunks of the per-tile draw lists with all
tiles processed in parallel (vmap). The chunk math lives in ops/blend.py and
is shared with the Pallas kernels. Reverse-mode AD through the scan replaces
drawB + atomicAdd with XLA's deterministic gather-transpose scatter-adds.

Static-capacity contract: each tile processes at most n_chunks * k_chunk
entries; deeper draw lists are truncated (front-to-back, so the truncated
tail is the least visible). The true maximum is returned in aux for overflow
monitoring — no silent caps.
"""

from functools import partial

import jax
import jax.numpy as jnp

from easygaussiansplatting_tpu.ops.blend import blend_chunk_fwd


@partial(jax.jit, static_argnames=("width", "height", "tile", "k_chunk", "n_chunks"))
def rasterize_tiled(
    us, cinv2ds, alphas, colors, patch_gsid, tile_start, tile_cnt,
    *, width, height, tile=16, k_chunk=64, n_chunks=16,
):
    """Blend binned Gaussians into an image.

    us [N,2], cinv2ds [N,3], alphas [N], colors [N,3];
    patch_gsid [M] int32 (from bin_gaussians, -1 padding), tile_start [T],
    tile_cnt [T].

    Returns (image [3,H,W], aux: contrib [H,W] i32, final_tau [H,W],
    max_tile_cnt scalar).
    """
    gx = -(-width // tile)
    gy = -(-height // tile)
    n_tiles = gx * gy
    p = tile * tile
    dtype = us.dtype

    m_total = patch_gsid.shape[0]
    gsid_safe = jnp.maximum(patch_gsid, 0)

    t_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = t_idx % gx
    ty = t_idx // gx
    lx = jnp.arange(tile, dtype=jnp.int32)
    px_l, py_l = jnp.meshgrid(lx, lx)  # [tile(ty), tile(tx)] row-major
    px = (tx[:, None] * tile + px_l.reshape(-1)[None, :]).astype(dtype)  # [T,P]
    py = (ty[:, None] * tile + py_l.reshape(-1)[None, :]).astype(dtype)

    k_off = jnp.arange(k_chunk, dtype=jnp.int32)

    def chunk_step(carry, c):
        tau, color, cont = carry
        local = c * k_chunk + k_off[None, :]  # [T,K]
        pidx = jnp.clip(tile_start[:, None] + local, 0, m_total - 1)
        ok = local < tile_cnt[:, None]
        gid = gsid_safe[pidx]  # [T,K]
        ok = ok & (patch_gsid[pidx] >= 0)

        us_k = us[gid]  # [T,K,2]
        cinv_k = cinv2ds[gid]
        alpha_k = alphas[gid]
        color_k = colors[gid]

        color_add, tau_out, cont_local = jax.vmap(blend_chunk_fwd)(
            tau, us_k, cinv_k, alpha_k, color_k, ok, px, py
        )
        color = color + color_add
        cont = jnp.where(cont_local > 0, c * k_chunk + cont_local, cont)
        return (tau_out, color, cont), None

    tau0 = jnp.ones((n_tiles, p), dtype)
    color0 = jnp.zeros((n_tiles, p, 3), dtype)
    cont0 = jnp.zeros((n_tiles, p), jnp.int32)
    (tau, color, cont), _ = jax.lax.scan(
        chunk_step, (tau0, color0, cont0), jnp.arange(n_chunks, dtype=jnp.int32)
    )

    def untile(x_tp):  # [T,P,...] -> [H,W,...]
        extra = x_tp.shape[2:]
        x = x_tp.reshape(gy, gx, tile, tile, *extra)
        x = jnp.swapaxes(x, 1, 2).reshape(gy * tile, gx * tile, *extra)
        return x[:height, :width]

    image = jnp.moveaxis(untile(color), -1, 0)  # [3,H,W]
    aux = {
        "contrib": untile(cont),
        "final_tau": untile(tau),
        "max_tile_cnt": jnp.max(tile_cnt),
        "n_truncated": jnp.sum(jnp.maximum(tile_cnt - n_chunks * k_chunk, 0)),
    }
    return image, aux


def render_tiled(pws, shs, alphas, scales, rots, cam, alive=None, sh_degree=3,
                 tile=16, max_patches=2**18, k_chunk=64, n_chunks=16):
    """Full differentiable forward: stages 1-5 (autodiff) + binning (discrete,
    gradient-free) + tiled blending (autodiff)."""
    from easygaussiansplatting_tpu.ops.binning import bin_gaussians
    from easygaussiansplatting_tpu.ops.stages import preprocess

    aux = preprocess(pws, shs, alphas, scales, rots, cam, alive=alive, sh_degree=sh_degree)
    binning = bin_gaussians(
        jax.lax.stop_gradient(aux["us"]),
        jax.lax.stop_gradient(aux["depths"]),
        jax.lax.stop_gradient(aux["areas"]),
        aux["valid"],
        width=cam.width, height=cam.height, tile=tile, max_patches=max_patches,
    )
    image, raux = rasterize_tiled(
        aux["us"], aux["cinv2ds"], aux["alphas"], aux["colors"],
        binning["patch_gsid"], binning["tile_start"], binning["tile_cnt"],
        width=cam.width, height=cam.height, tile=tile,
        k_chunk=k_chunk, n_chunks=n_chunks,
    )
    return image, {**aux, **raux, "binning": binning}
