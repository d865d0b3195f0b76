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
            d2 = q_norm2 - 2.0 * qb_safe @ pb.T + pb_n2[None, :]
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
