"""Ground-truth point-cloud densification constraint (street-sparse fork).

Reference: ``scene/gaussian_model.py:796-962`` — a FAISS index over the
LiDAR/SfM ground-truth cloud; at every densify round, Gaussians lying inside
the GT x/y bounds whose nearest GT point is farther than
``constraint_treshold`` are pruned (newly split children are protected for
one round; scaffold rows never pruned).

TPU-native replacement (SURVEY.md §7.3): a voxel grid hash built host-side
once (cell size = threshold, so any neighbor within the threshold lies in
the 3×3×3 cell neighborhood), queried under jit with fixed per-cell
capacity.  The constraint only needs "is any GT point within r" — not the
exact 1-NN distance — so capped cells only risk keeping a point alive
(never wrongly pruning), and the cap overflow is counted, not silent.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class GtIndex(NamedTuple):
    """Voxel-hash index over the GT cloud (device arrays, jit-friendly)."""

    points: jnp.ndarray        # [M, 3] cell-sorted GT points
    cell_keys: jnp.ndarray     # [C] sorted unique (hashed) cell keys, int32
    cell_start: jnp.ndarray    # [C] start offset into points
    cell_count: jnp.ndarray    # [C] points per cell (uncapped true count)
    cell_size: float           # == constraint threshold
    bounds: jnp.ndarray        # [4]: x_min, x_max, y_min, y_max
    cap_overflow: int          # points beyond per-cell cap (diagnostic)
    max_per_cell: int


_PRIMES = np.array([73856093, 19349669, 83492791], dtype=np.int64)


def _cell_key(cells: np.ndarray) -> np.ndarray:
    """[N,3] int cells -> int32 hash key (spatial hash truncated to 32 bits —
    matching jax's default int width so host build and jit query agree;
    collisions only cause an extra distance re-check, never a wrong prune)."""
    c = cells.astype(np.int64)
    k = (c[:, 0] * _PRIMES[0]) ^ (c[:, 1] * _PRIMES[1]) \
        ^ (c[:, 2] * _PRIMES[2])
    return k.astype(np.int32)  # truncate BEFORE sorting (order must match)


def build_index(gt_points: np.ndarray, threshold: float,
                max_per_cell: int = 64) -> GtIndex:
    """Host-side one-shot build (the load_gt_point_cloud analogue)."""
    pts = np.asarray(gt_points, np.float32)
    cells = np.floor(pts / threshold).astype(np.int64)
    keys = _cell_key(cells)
    order = np.argsort(keys, kind="stable")
    pts_sorted = pts[order]
    keys_sorted = keys[order]
    uniq, start, count = np.unique(keys_sorted, return_index=True,
                                   return_counts=True)
    overflow = int(np.maximum(count - max_per_cell, 0).sum())
    bounds = np.array([pts[:, 0].min(), pts[:, 0].max(),
                       pts[:, 1].min(), pts[:, 1].max()], np.float32)
    return GtIndex(
        points=jnp.asarray(pts_sorted),
        cell_keys=jnp.asarray(uniq),
        cell_start=jnp.asarray(start.astype(np.int32)),
        cell_count=jnp.asarray(count.astype(np.int32)),
        cell_size=float(threshold),
        bounds=jnp.asarray(bounds),
        cap_overflow=overflow,
        max_per_cell=int(max_per_cell),
    )


def _query_chunk(index: GtIndex, xyz: jnp.ndarray) -> jnp.ndarray:
    """[Q,3] -> [Q] bool: True when some GT point is within cell_size."""
    r2 = index.cell_size ** 2
    base = jnp.floor(xyz / index.cell_size).astype(jnp.int32)   # [Q, 3]
    m = index.points.shape[0]
    cap = index.max_per_cell
    near = jnp.zeros(xyz.shape[0], bool)

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                cell = base + jnp.asarray([ox, oy, oz], jnp.int32)
                # int32 multiply wraps = the host build's 64->32 truncation.
                key = ((cell[:, 0] * jnp.int32(_PRIMES[0]))
                       ^ (cell[:, 1] * jnp.int32(_PRIMES[1]))
                       ^ (cell[:, 2] * jnp.int32(_PRIMES[2])))
                pos = jnp.searchsorted(index.cell_keys, key)
                pos_c = jnp.minimum(pos, index.cell_keys.shape[0] - 1)
                hit = index.cell_keys[pos_c] == key
                start = index.cell_start[pos_c]
                count = jnp.minimum(index.cell_count[pos_c], cap)
                slot = jnp.arange(cap)[None, :]                  # [Q, cap]
                idx = jnp.minimum(start[:, None] + slot, m - 1)
                cand = index.points[idx]                         # [Q, cap, 3]
                d2 = jnp.sum((cand - xyz[:, None, :]) ** 2, axis=-1)
                valid = hit[:, None] & (slot < count[:, None])
                near = near | jnp.any(valid & (d2 <= r2), axis=1)
    return near


def too_far_mask(index: GtIndex, xyz: jnp.ndarray,
                 active: jnp.ndarray, chunk: int = 8192) -> jnp.ndarray:
    """[C] bool: active rows inside the GT x/y bounds with no GT point within
    the threshold (the compare_points_to_gt prune criterion).  Chunked scan
    keeps the candidate gather bounded."""
    n = xyz.shape[0]
    pad = (-n) % chunk
    xyz_p = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)

    def step(_, xb):
        return None, _query_chunk(index, xb)

    _, near = jax.lax.scan(step, None,
                           xyz_p.reshape(-1, chunk, 3))
    near = near.reshape(-1)[:n]
    in_bounds = ((xyz[:, 0] >= index.bounds[0])
                 & (xyz[:, 0] <= index.bounds[1])
                 & (xyz[:, 1] >= index.bounds[2])
                 & (xyz[:, 1] <= index.bounds[3]))
    return active & in_bounds & ~near
