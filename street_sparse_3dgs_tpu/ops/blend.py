"""Tiled front-to-back alpha blending (pure-JAX production path).

Consumes the fixed-capacity gather tables from ``ops/binning.py`` and blends
each 16×16 tile's Gaussians over its 256 pixels.  The per-tile math is the
closed-form version of the CUDA sequential blend (see ``ops/oracle.py`` for
the derivation of the stop-rule masks): per tile we build the [P, K] alpha
matrix, turn the running transmittance into an exclusive cumprod along K, and
contract weights against colors with a batched matmul — which is exactly the
shape the MXU wants ([P,K] @ [K,3] per tile).

Tiles are processed in chunks under ``lax.scan`` so peak memory stays at
O(chunk · 256 · K) instead of O(tiles · 256 · K); XLA fuses the elementwise
pipeline inside each chunk.  A fused Pallas kernel with custom VJP replaces
this on the TPU hot path (``ops/pallas_blend.py``) and is parity-tested
against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import TILE, TileBins, permute_rows
from .oracle import ALPHA_MAX, ALPHA_MIN, T_EPS


def blend_tiles(
    bins: TileBins,
    mean2d: jnp.ndarray,     # [N, 2] original rows
    conic: jnp.ndarray,      # [N, 3]
    color: jnp.ndarray,      # [N, 3]
    opacity: jnp.ndarray,    # [N]
    inv_depth: jnp.ndarray,  # [N]
    height: int,
    width: int,
    bg: jnp.ndarray,         # [3]
    tiles_chunk: int = 16,
):
    """Returns (image [3,H,W], invdepth [1,H,W], alpha [H,W])."""
    # The tile tables hold depth RANKS — move rows into depth order first.
    mean2d, conic, color, opacity, inv_depth = (
        permute_rows(v, bins.order, bins.rank)
        for v in (mean2d, conic, color, opacity, inv_depth))
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    t_total = tiles_x * tiles_y
    k_cap = bins.gather.shape[1]
    p = TILE * TILE

    # Pad tile count to a chunk multiple (padded tiles render background only
    # and are cropped away).
    pad = (-t_total) % tiles_chunk
    gather = jnp.concatenate(
        [bins.gather, jnp.zeros((pad, k_cap), bins.gather.dtype)], 0)
    mask = jnp.concatenate(
        [bins.mask, jnp.zeros((pad, k_cap), bool)], 0)
    n_chunks = (t_total + pad) // tiles_chunk

    ly, lx = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32),
                          jnp.arange(TILE, dtype=jnp.float32), indexing="ij")
    local = jnp.stack([lx.ravel(), ly.ravel()], axis=-1)     # [P, 2]

    def chunk_fn(_, ci):
        t0 = ci * tiles_chunk
        tid = t0 + jnp.arange(tiles_chunk)
        origin = jnp.stack([(tid % tiles_x) * TILE,
                            (tid // tiles_x) * TILE], axis=-1).astype(jnp.float32)
        pix = origin[:, None, :] + local[None, :, :]          # [C, P, 2]

        g = jax.lax.dynamic_slice_in_dim(gather, t0, tiles_chunk)   # [C, K]
        m = jax.lax.dynamic_slice_in_dim(mask, t0, tiles_chunk)     # [C, K]
        mu = mean2d[g]                                        # [C, K, 2]
        co = conic[g]                                         # [C, K, 3]
        rgb = color[g]                                        # [C, K, 3]
        op = opacity[g]                                       # [C, K]
        ivd = inv_depth[g]                                    # [C, K]

        d = pix[:, :, None, :] - mu[:, None, :, :]            # [C, P, K, 2]
        dx, dy = d[..., 0], d[..., 1]
        a = co[..., 0][:, None, :]
        b = co[..., 1][:, None, :]
        c = co[..., 2][:, None, :]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN)
                          & m[:, None, :], alpha, 0.0)        # [C, P, K]

        log_om = jnp.log1p(-alpha)
        cum = jnp.cumsum(log_om, axis=-1)
        t_excl = jnp.exp(cum - log_om)
        fail = jnp.exp(cum) < T_EPS
        include = jnp.cumsum(fail.astype(jnp.int32), axis=-1) == 0

        w = jnp.where(include, alpha * t_excl, 0.0)           # [C, P, K]
        out_rgb = jnp.einsum("cpk,ckd->cpd", w, rgb,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        out_ivd = jnp.einsum("cpk,ck->cp", w, ivd,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        acc = jnp.sum(w, axis=-1)
        t_final = jnp.exp(jnp.sum(jnp.where(include, log_om, 0.0), axis=-1))
        out_rgb = out_rgb + t_final[..., None] * bg[None, None, :]
        return None, (out_rgb, out_ivd, acc)

    _, (rgb, ivd, acc) = jax.lax.scan(chunk_fn, None, jnp.arange(n_chunks))
    # [n_chunks, C, P, ...] -> [T_pad, P, ...]
    rgb = rgb.reshape(t_total + pad, p, 3)
    ivd = ivd.reshape(t_total + pad, p)
    acc = acc.reshape(t_total + pad, p)

    def to_image(flat, channels):
        img = flat[:t_total].reshape(tiles_y, tiles_x, TILE, TILE, channels)
        img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE,
                                                   tiles_x * TILE, channels)
        return img[:height, :width]

    image = to_image(rgb, 3).transpose(2, 0, 1)               # [3, H, W]
    invdepth = to_image(ivd[..., None], 1).transpose(2, 0, 1) # [1, H, W]
    alpha_img = to_image(acc[..., None], 1)[..., 0]           # [H, W]
    return image, invdepth, alpha_img
