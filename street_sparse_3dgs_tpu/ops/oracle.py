"""Pure-jnp reference rasterizer — the correctness oracle.

A dense, fully differentiable implementation of the 3DGS forward blend with
the exact inclusion semantics of the reference CUDA rasterizer family
(contract per SURVEY.md §2.3):

- Gaussians are blended front-to-back in depth order;
- a Gaussian is skipped at a pixel when its exponent is positive or its alpha
  is below 1/255; alpha is clamped at 0.99;
- a pixel *stops* at the first Gaussian whose inclusion would push the
  transmittance below 1e-4 (that Gaussian and all later ones excluded);
- remaining transmittance multiplies the background color;
- the depth channel accumulates inverse depth with the same blend weights.

The stop rule is expressed in closed form so the whole thing stays a dense
vectorized graph: before the first failure the running transmittance equals
the plain exclusive cumprod of (1-α), so the failure flag is
``cumprod_excl·(1-α) < 1e-4`` latched with a cumulative-max.  JAX autodiff
through this graph reproduces the CUDA backward exactly (the masks are
piecewise-constant, as in the hand-written kernel).

Memory is O(pixels × N) — use only on small scenes; the production path in
``ops/binning.py`` + ``ops/blend.py`` is parity-tested against this.
"""

from __future__ import annotations

import jax.numpy as jnp

from .preprocess import Projected

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_pixels(
    pix_xy: jnp.ndarray,        # [P, 2] float pixel coordinates
    proj: Projected,            # depth-UNsorted; sorted internally
    bg: jnp.ndarray,            # [3]
    tile_grid: tuple[int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (color [P,3], inv_depth [P], alpha [P]).

    When ``tile_grid=(tiles_x, tiles_y)`` is given, each Gaussian only affects
    pixels whose 16×16 tile lies inside its covered rectangle — reproducing
    the footprint truncation of the tiled/CUDA path bit-for-bit (a Gaussian's
    1/255-alpha isocontour can slightly exceed its 3σ binning radius)."""
    order = jnp.argsort(proj.depth)  # invalid rows carry depth=inf -> tail
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opac = proj.opacity[order]
    invd = proj.inv_depth[order]
    valid = proj.valid[order]

    if tile_grid is not None:
        from .binning import TILE, tile_rect
        tiles_x, tiles_y = tile_grid
        x0, y0, x1, y1 = tile_rect(mean2d, proj.radius[order], tiles_x, tiles_y)
        ptx = (pix_xy[:, 0] // TILE).astype(jnp.int32)
        pty = (pix_xy[:, 1] // TILE).astype(jnp.int32)
        in_rect = ((ptx[:, None] >= x0[None, :]) & (ptx[:, None] < x1[None, :])
                   & (pty[:, None] >= y0[None, :]) & (pty[:, None] < y1[None, :]))
    else:
        in_rect = True

    d = pix_xy[:, None, :] - mean2d[None, :, :]            # [P, N, 2]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN) & valid[None, :]
                      & in_rect, alpha, 0.0)                # [P, N]

    log_one_minus = jnp.log1p(-alpha)                       # alpha <= 0.99 ⇒ finite
    cum = jnp.cumsum(log_one_minus, axis=1)
    t_excl = jnp.exp(cum - log_one_minus)                   # exclusive cumprod
    t_incl = jnp.exp(cum)
    fail = t_incl < T_EPS
    done = jnp.cumsum(fail.astype(jnp.int32), axis=1) > 0   # latched stop flag
    include = ~done

    w = jnp.where(include, alpha * t_excl, 0.0)             # [P, N]
    out_color = w @ color                                   # [P, 3]
    out_invd = w @ invd                                     # [P]
    acc_alpha = jnp.sum(w, axis=1)
    t_final = jnp.exp(jnp.sum(jnp.where(include, log_one_minus, 0.0), axis=1))
    out_color = out_color + t_final[:, None] * bg[None, :]
    return out_color, out_invd, acc_alpha


def render_oracle(proj: Projected, height: int, width: int,
                  bg: jnp.ndarray, tile_grid: tuple[int, int] | None = None):
    """Render a full image densely.  Returns (image [3,H,W], invdepth [1,H,W],
    alpha [H,W])."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)                           # [H, W]
    pix = jnp.stack([px.ravel(), py.ravel()], axis=-1)      # [H*W, 2]
    color, invd, acc = blend_pixels(pix, proj, bg, tile_grid=tile_grid)
    image = color.reshape(height, width, 3).transpose(2, 0, 1)
    invdepth = invd.reshape(1, height, width)
    return image, invdepth, acc.reshape(height, width)
