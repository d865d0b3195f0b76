"""Tile binning: assign depth-sorted Gaussians to 16×16 pixel tiles.

TPU-native replacement for the CUDA rasterizer's duplicate-keys radix sort
(SURVEY.md §7.3 'tile binning + depth sort without atomics'): everything is
static-shaped and built from `lax.sort` / `searchsorted` / gathers.

Algorithm:
  1. sort Gaussians by camera depth once (`argsort`; culled rows carry inf);
  2. each Gaussian covers a clamped rectangle of tiles derived from its pixel
     radius; it emits up to ``max_dup`` (tile, gaussian) pairs, row-major over
     its rectangle (overflow beyond ``max_dup`` tiles is counted, not silently
     dropped);
  3. the [N·D] pair list is stably sorted by tile id — stability preserves the
     global depth order within every tile, so no depth key is needed;
  4. per-tile segments are located with ``searchsorted`` and materialized as a
     fixed-capacity gather table [num_tiles, K] + validity mask (per-tile
     overflow beyond K is likewise counted).

The gather table indexes into the *depth-sorted* attribute arrays; gradients
flow back through those gathers as scatter-adds inserted by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Projected

TILE = 16


class TileBins(NamedTuple):
    order: jnp.ndarray        # [N] depth-sort permutation (into original rows)
    gather: jnp.ndarray       # [T, K] indices into depth-sorted arrays
    mask: jnp.ndarray         # [T, K] bool validity
    counts: jnp.ndarray       # [T] number of gaussians binned per tile (pre-clip)
    dup_overflow: jnp.ndarray   # scalar: tiles lost to the per-gaussian cap
    tile_overflow: jnp.ndarray  # scalar: pairs lost to the per-tile cap
    tiles_x: int
    tiles_y: int


def num_tiles(height: int, width: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              tiles_x: int, tiles_y: int):
    """Per-Gaussian covered tile rectangle, exclusive max (CUDA ``getRect``
    semantics: ``min = (p - r) / B``, ``max = (p + r + B - 1) / B``, both
    clamped to the grid; negative coordinates clamp to 0 so trunc-vs-floor is
    immaterial).  Returns int32 (x0, y0, x1, y1)."""
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return x0, y0, jnp.maximum(x1, x0), jnp.maximum(y1, y0)


def bin_gaussians(proj: Projected, height: int, width: int,
                  max_dup: int, tile_capacity: int) -> TileBins:
    n = proj.depth.shape[0]
    tiles_x, tiles_y = num_tiles(height, width)
    t_total = tiles_x * tiles_y

    order = jnp.argsort(proj.depth)                    # stable; inf (culled) last
    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    valid = proj.valid[order]

    x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y)

    nx = jnp.where(valid, x1 - x0, 0)
    ny = jnp.where(valid, y1 - y0, 0)
    coverage = nx * ny                                  # [N]
    dup_overflow = jnp.sum(jnp.maximum(coverage - max_dup, 0))

    slots = jnp.arange(max_dup, dtype=jnp.int32)        # [D]
    nx_safe = jnp.maximum(nx, 1)
    sy = slots[None, :] // nx_safe[:, None]             # [N, D]
    sx = slots[None, :] % nx_safe[:, None]
    tile_id = (y0[:, None] + sy) * tiles_x + (x0[:, None] + sx)
    in_range = slots[None, :] < jnp.minimum(coverage, max_dup)[:, None]
    keys = jnp.where(in_range, tile_id, t_total).astype(jnp.int32).ravel()   # [N*D]
    vals = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_dup)).ravel()

    sorted_keys, sorted_vals = jax.lax.sort((keys, vals), num_keys=1,
                                            is_stable=True)

    boundaries = jnp.searchsorted(sorted_keys,
                                  jnp.arange(t_total + 1, dtype=jnp.int32))
    starts = boundaries[:-1]                            # [T]
    counts = boundaries[1:] - starts
    tile_overflow = jnp.sum(jnp.maximum(counts - tile_capacity, 0))

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = jnp.minimum(starts[:, None] + k[None, :], n * max_dup - 1)
    gather = sorted_vals[idx]                           # [T, K]
    mask = k[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
    gather = jnp.where(mask, gather, 0)

    return TileBins(order=order, gather=gather, mask=mask, counts=counts,
                    dup_overflow=dup_overflow, tile_overflow=tile_overflow,
                    tiles_x=tiles_x, tiles_y=tiles_y)
