"""LOD hierarchy: flat SoA node arrays + vectorized view-dependent cut.

TPU-native replacement for the reference's ``gaussian_hierarchy._C`` extension
(interface recovered in SURVEY.md §2.3: ``load_hierarchy``, ``expand_to_size``,
``get_interpolation_weights``; call sites ``train_post.py:91-113``,
``render_hierarchy.py:63-85``).  Instead of a recursive C++/CUDA traversal,
the cut is a **closed-form vectorized selection over all nodes**: a node is in
the cut iff its own projected size is under the limit while its parent's is
not.  That is O(nodes) of pure VPU work with no data-dependent control flow —
the natural XLA formulation (SURVEY.md §7.3 'hierarchy traversal under jit').

Node layout (our own documented format — the upstream ``.hier`` layout lives
in a missing submodule, so formats are validated against rendered images, not
bytes):
  - one Gaussian row per node: rows [0, n_nodes) of ``params`` are tree nodes
    (leaves = trained chunk Gaussians, interior = moment-matched merges), and
    rows [n_nodes, n_nodes + skybox_count) are the skybox tail (the reference
    also stores the skybox at the tail: ``train_post.py:168-174``,
    ``gaussian_renderer/__init__.py:221-235``);
  - ``parent[i]`` (-1 for the root), ``child_start/child_count`` with sibling
    ranges contiguous, ``box_center/box_half`` world AABBs, and ``size`` (the
    node's world-space extent, the cut metric numerator).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams


class Hierarchy(NamedTuple):
    params: GaussianParams        # [n_nodes + skybox] raw (pre-activation)
    parent: jnp.ndarray           # [n_nodes] int32, -1 at root
    child_start: jnp.ndarray      # [n_nodes] int32
    child_count: jnp.ndarray      # [n_nodes] int32 (0 => leaf)
    box_center: jnp.ndarray       # [n_nodes, 3]
    box_half: jnp.ndarray         # [n_nodes, 3]
    size: jnp.ndarray             # [n_nodes] world-space extent (cut metric)
    anchors: jnp.ndarray          # [n_nodes] bool — frozen during post-opt
    skybox_count: int             # static tail rows

    @property
    def n_nodes(self) -> int:
        return self.parent.shape[0]

    @property
    def n_rows(self) -> int:
        return self.params.xyz.shape[0]


class Cut(NamedTuple):
    """A view-dependent hierarchy cut, fixed [n_nodes]-shaped (mask form).

    ``selected`` marks the nodes to render; ``weights`` blends each selected
    node with its parent (w·node + (1-w)·parent — the ``interps`` convention
    of ``gaussian_renderer/__init__.py:203-219``); ``num_siblings`` is the
    selected node's sibling count (the kernel-path normalizer, kept for
    parity)."""

    selected: jnp.ndarray         # [n_nodes] bool
    weights: jnp.ndarray          # [n_nodes] float in (0, 1]
    parent: jnp.ndarray           # [n_nodes] int32 (self-index at root)
    num_siblings: jnp.ndarray     # [n_nodes] int32


def pixel_limit(tau: float, tan_fovx: float, width: int) -> float:
    """Convert a target granularity in pixels (τ) to the world size-over-
    distance limit (reference ``render_hierarchy.py:61``)."""
    return (2.0 * (tau + 0.5)) * tan_fovx / (0.5 * width)


def _cut_metric(h: Hierarchy, campos: jnp.ndarray):
    """(metric, parent_metric, is_leaf) — THE cut-selection predicate
    inputs, shared by ``select_cut`` and ``budget_limit`` so the bisection
    counts exactly what selection selects."""
    eps = 1e-6
    d_center = jnp.linalg.norm(h.box_center - campos[None, :], axis=-1)
    d = jnp.maximum(d_center - jnp.linalg.norm(h.box_half, axis=-1), eps)
    metric = h.size / d
    parent = jnp.where(h.parent >= 0, h.parent, 0)
    parent_metric = jnp.where(h.parent < 0, jnp.inf, metric[parent])
    return metric, parent_metric, h.child_count == 0


def budget_limit(h: Hierarchy, campos: jnp.ndarray, budget: int,
                 iters: int = 20) -> jnp.ndarray:
    """Smallest (finest) size-over-distance limit whose cut stays within
    ``budget`` rendered nodes — the SIBR hierarchy viewer's VRAM
    ``--budget`` auto-regulation (README.md:233-256), reformulated as a
    jittable bisection: the cut size is non-increasing in the limit, so
    ~20 halvings pin the finest limit that fits.  Pair with
    ``select_cut(h, campos, budget_limit(...))``."""
    metric, parent_metric, is_leaf = _cut_metric(h, campos)

    def count(lim):
        return jnp.sum((((metric <= lim) | is_leaf)
                        & (parent_metric > lim)).astype(jnp.int32))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        fits = count(mid) <= budget
        return (jnp.where(fits, lo, mid), jnp.where(fits, mid, hi))

    hi0 = jnp.maximum(jnp.max(jnp.where(jnp.isfinite(metric), metric, 0.0)),
                      1.0) * 2.0
    _, hi = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), hi0))
    return hi


def select_cut(h: Hierarchy, campos: jnp.ndarray, limit) -> Cut:
    """Vectorized ``expand_to_size`` + ``get_interpolation_weights``.

    Metric: m(i) = size_i / max(dist(campos, box_i), eps) where dist is the
    distance to the box's near surface (center distance minus half-diagonal).
    Selection: m(i) ≤ limit (or i is a leaf) AND m(parent) > limit; the root
    is selected when its own metric passes.  Weight: how far the limit has
    swept from the parent's metric toward the node's own,
    t = clamp((m_p − limit)/(m_p − m_i), 0, 1) → 1 as the cut is about to
    descend past the node, 0 just after it left the parent.
    """
    eps = 1e-6
    metric, parent_metric, is_leaf = _cut_metric(h, campos)
    parent = jnp.where(h.parent >= 0, h.parent, 0)
    is_root = h.parent < 0

    small_enough = (metric <= limit) | is_leaf
    selected = small_enough & (parent_metric > limit)

    t = (parent_metric - limit) / jnp.maximum(parent_metric - metric, eps)
    t = jnp.where(jnp.isinf(parent_metric), 1.0, t)
    weights = jnp.clip(t, 0.0, 1.0)
    weights = jnp.where(selected, jnp.maximum(weights, eps), 1.0)

    parent_self = jnp.where(is_root, jnp.arange(h.n_nodes), h.parent)
    num_siblings = jnp.where(is_root, 1, h.child_count[parent])
    return Cut(selected=selected, weights=weights,
               parent=parent_self.astype(jnp.int32),
               num_siblings=num_siblings.astype(jnp.int32))
