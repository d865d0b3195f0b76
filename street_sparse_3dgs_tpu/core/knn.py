"""K-nearest-neighbour distances for Gaussian scale initialisation.

TPU-native replacement for the reference's ``simple-knn`` CUDA extension
(``distCUDA2``, used once at init: ``scene/gaussian_model.py:207-211``):
mean *squared* distance to the 3 nearest neighbours of each point.

Implementation: blocked exact KNN.  Queries are processed in row blocks; for
each block we stream column blocks of the full point set, computing pairwise
squared distances via the ‖x‖² − 2⟨x,y⟩ + ‖y‖² matmul identity (the 2⟨x,y⟩
term rides the MXU) and maintaining a running top-(k+1) smallest set merged
with ``jax.lax.top_k``.  O(N²) FLOPs but matmul-shaped, which is fast on TPU
for the one-shot init sizes involved (≤ a few million points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_rows(x: jnp.ndarray, block: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], jnp.inf, x.dtype)], 0)
    return x


@functools.partial(jax.jit, static_argnames=("k", "query_block", "point_block"))
def knn_sq_dists(points: jnp.ndarray, k: int = 3, query_block: int = 4096,
                 point_block: int = 65536) -> jnp.ndarray:
    """[N,3] -> [N,k] squared distances to the k nearest *other* points."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    q = _pad_rows(pts, query_block)
    p = _pad_rows(pts, point_block)
    nq, np_ = q.shape[0], p.shape[0]
    p_norm2 = jnp.where(jnp.isfinite(p[:, 0]), jnp.sum(p * p, -1), jnp.inf)
    p_safe = jnp.where(jnp.isfinite(p), p, 0.0)

    def query_step(_, qi):
        qb = jax.lax.dynamic_slice_in_dim(q, qi * query_block, query_block)
        qb_safe = jnp.where(jnp.isfinite(qb), qb, 0.0)
        q_norm2 = jnp.sum(qb_safe * qb_safe, -1, keepdims=True)
        q_valid = jnp.isfinite(qb[:, 0])

        def col_step(carry, pj):
            best = carry  # [B, k+1] running smallest distances (negated for top_k)
            pb = jax.lax.dynamic_slice_in_dim(p_safe, pj * point_block, point_block)
            pb_n2 = jax.lax.dynamic_slice_in_dim(p_norm2, pj * point_block, point_block)
            d2 = (q_norm2
                  - 2.0 * jnp.matmul(qb_safe, pb.T,
                                     precision=jax.lax.Precision.HIGHEST)
                  + pb_n2[None, :])
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(jnp.isfinite(pb_n2)[None, :], d2, jnp.inf)
            # Exclude self-distance: the query itself appears once with d2≈0.
            merged = jnp.concatenate([-best, -d2], axis=1)
            best_neg, _ = jax.lax.top_k(merged, k + 1)
            return -best_neg, None

        init = jnp.full((query_block, k + 1), jnp.inf, jnp.float32)
        best, _ = jax.lax.scan(col_step, init, jnp.arange(np_ // point_block))
        # Drop the closest entry (self, distance 0) and keep the next k.
        out = best[:, 1:]
        return None, jnp.where(q_valid[:, None], out, 0.0)

    _, chunks = jax.lax.scan(query_step, None, jnp.arange(nq // query_block))
    return chunks.reshape(nq, k)[:n]


def mean_sq_dist_to_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 equivalent: [N,3] -> [N] mean squared distance to 3 NN."""
    return jnp.mean(knn_sq_dists(points, k=3), axis=-1)


# ---------------------------------------------------------------------------
# Grid-hash approximate 3-NN for production-scale init (millions of points):
# the exact blocked KNN above is O(N²) matmuls — fine to a few hundred
# thousand points, too slow at the reference's 8M-Gaussian scale.  The
# approximation searches the 3×3×3 voxel neighborhood at a cell size tied to
# the local point spacing; isolated points fall back to the cell size
# (upper-bounding their scale — harmless for init, the reference clamps
# scene scales anyway, ``scene/gaussian_model.py:208-210``).

EXACT_KNN_MAX = 200_000


def grid_mean_sq_dist_to_3nn(points, cell_size: float | None = None,
                             max_per_cell: int = 32,
                             query_chunk: int = 8192):
    """[N,3] -> [N] approximate mean squared 3-NN distance via voxel hash."""
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    if cell_size is None:
        lo, hi = pts.min(0), pts.max(0)
        vol = float(np.prod(np.maximum(hi - lo, 1e-6)))
        cell_size = 2.0 * (vol / max(n, 1)) ** (1.0 / 3.0)

    cells = np.floor(pts / cell_size).astype(np.int64)
    primes = np.array([73856093, 19349669, 83492791], dtype=np.int64)
    keys = ((cells[:, 0] * primes[0]) ^ (cells[:, 1] * primes[1])
            ^ (cells[:, 2] * primes[2])).astype(np.int32)
    order = np.argsort(keys, kind="stable")
    pts_sorted = jnp.asarray(pts[order])
    keys_sorted = keys[order]
    uniq, start, count = np.unique(keys_sorted, return_index=True,
                                   return_counts=True)
    uniq_j = jnp.asarray(uniq)
    start_j = jnp.asarray(start.astype(np.int32))
    count_j = jnp.asarray(count.astype(np.int32))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = np.arange(n)

    m = n
    cap = max_per_cell
    fallback = jnp.float32(cell_size * cell_size)

    def query(xb):
        base = jnp.floor(xb / cell_size).astype(jnp.int32)
        best = jnp.full((xb.shape[0], 4), jnp.inf, jnp.float32)
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for oz in (-1, 0, 1):
                    cell = base + jnp.asarray([ox, oy, oz], jnp.int32)
                    key = ((cell[:, 0] * jnp.int32(73856093))
                           ^ (cell[:, 1] * jnp.int32(19349669))
                           ^ (cell[:, 2] * jnp.int32(83492791)))
                    pos = jnp.minimum(jnp.searchsorted(uniq_j, key),
                                      uniq_j.shape[0] - 1)
                    hit = uniq_j[pos] == key
                    st = start_j[pos]
                    ct = jnp.minimum(count_j[pos], cap)
                    slot = jnp.arange(cap)[None, :]
                    idx = jnp.minimum(st[:, None] + slot, m - 1)
                    cand = pts_sorted[idx]
                    d2 = jnp.sum((cand - xb[:, None, :]) ** 2, axis=-1)
                    d2 = jnp.where(hit[:, None] & (slot < ct[:, None]),
                                   d2, jnp.inf)
                    merged = jnp.concatenate([best, d2], axis=1)
                    nb, _ = jax.lax.top_k(-merged, 4)
                    best = -nb
        # Drop self (distance 0) and average the next 3; isolated points
        # (fewer than 4 in-radius neighbors incl. self) fall back.
        three = best[:, 1:4]
        out = jnp.where(jnp.isfinite(three), three, fallback)
        return jnp.mean(out, axis=1)

    pad = (-n) % query_chunk
    xq = jnp.concatenate(
        [jnp.asarray(pts), jnp.zeros((pad, 3), jnp.float32)], 0)

    def step(_, xb):
        return None, query(xb)

    _, out = jax.lax.scan(step, None, xq.reshape(-1, query_chunk, 3))
    return out.reshape(-1)[:n]


def mean_sq_dist_to_3nn_auto(points) -> jnp.ndarray:
    """distCUDA2 equivalent with automatic exact/grid switch by size."""
    if points.shape[0] <= EXACT_KNN_MAX:
        return mean_sq_dist_to_3nn(points)
    return grid_mean_sq_dist_to_3nn(points)
