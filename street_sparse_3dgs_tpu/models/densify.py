"""Adaptive density control (clone / split / prune) as pure static-shape ops.

Reference behavior (``scene/gaussian_model.py:672-793``):
  - stats: per-row running **max** of the screen-space position-grad norm and
    max observed pixel radius;
  - gate: ``grad · max_radii2D · opacity^{1/5} ≥ threshold`` and opacity>0.15,
    excluding the scaffold block;
  - clone (small Gaussians, max scale ≤ percent_dense·extent): duplicate row;
  - split (big ones): 2 children sampled from N(0, diag(scales²)) rotated into
    world frame, scales ÷ (0.8·2); parent removed;
  - prune: opacity < min_opacity (scaffold excluded);
  - new rows enter the optimizer with zeroed moments
    (``cat_tensors_to_optimizer``), stats reset after each round.

TPU-native shape discipline: arrays stay at fixed capacity; removed rows just
flip ``active`` off, and new rows are scattered into free slots enumerated
with a stable argsort + cumsum ranking.  If more rows are requested than free
slots exist the surplus is **counted** in ``overflow`` (never silently
dropped — the host grows capacity and re-jits, SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import adam
from .gaussians import GaussianMeta, GaussianParams, activate_opacity
from ..core.quaternion import to_rotation_matrix


class DensifyState(NamedTuple):
    grad_accum: jnp.ndarray    # [C] max screen-grad norm seen since last round
    denom: jnp.ndarray         # [C] #views the row was visible in
    max_radii2d: jnp.ndarray   # [C] max pixel radius seen


def init(capacity: int) -> DensifyState:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyState(z, z, z)


def add_stats(state: DensifyState, screen_grad: jnp.ndarray,
              radii: jnp.ndarray, visible: jnp.ndarray) -> DensifyState:
    """Accumulate one view's stats.

    ``screen_grad``: [C,2] gradient w.r.t. the screen-space mean residual
    (the jax.grad analogue of torch's retained ``means2D.grad``,
    ``gaussian_renderer/__init__.py:29-33``).
    """
    norm = jnp.linalg.norm(screen_grad[:, :2], axis=-1)
    return DensifyState(
        grad_accum=jnp.where(visible, jnp.maximum(state.grad_accum, norm),
                             state.grad_accum),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(visible,
                              jnp.maximum(state.max_radii2d, radii),
                              state.max_radii2d),
    )


class DensifyResult(NamedTuple):
    params: GaussianParams
    active: jnp.ndarray
    adam_state: adam.AdamState
    densify_state: DensifyState
    n_active: jnp.ndarray      # scalar int32
    overflow: jnp.ndarray      # scalar int32: rows that did not fit capacity


def densify_and_prune(
    key,
    params: GaussianParams,
    active: jnp.ndarray,
    adam_state: adam.AdamState,
    state: DensifyState,
    meta: GaussianMeta,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float = 0.01,
    extra_prune: jnp.ndarray | None = None,
) -> DensifyResult:
    capacity = params.xyz.shape[0]
    rows = jnp.arange(capacity)
    not_frozen = rows >= meta.n_frozen

    opacity = activate_opacity(params, meta)
    scales = jnp.exp(params.log_scales)
    max_scale = jnp.max(scales, axis=1)

    grads = jnp.nan_to_num(state.grad_accum)
    gate = (grads * state.max_radii2d * jnp.power(jnp.maximum(opacity, 0.0),
                                                  0.2) >= grad_threshold)
    gate = gate & (opacity > 0.15) & active & not_frozen

    prune_mask = (opacity < min_opacity) & active & not_frozen
    if extra_prune is not None:
        # GT-point-cloud constraint (``compare_points_to_gt``): rows too far
        # from the LiDAR/SfM cloud are pruned and excluded from cloning, so
        # no copy of a too-far point survives the round (the reference prunes
        # both parent and clone; split children are protected for one round
        # by construction here — they do not exist yet when the mask is
        # computed on the pre-densify rows).
        prune_mask = prune_mask | (extra_prune & active & not_frozen)
        gate = gate & ~extra_prune

    clone_mask = gate & (max_scale <= percent_dense * extent)
    split_mask = gate & (max_scale > percent_dense * extent)

    # Rows that survive this round in place.
    survive = active & ~split_mask & ~prune_mask

    # Free slots (stable: lowest indices first).  ~survive rows are reusable.
    free_slots = jnp.argsort(survive, stable=True)        # False(0) first
    n_free = capacity - jnp.sum(survive)

    n_clones = jnp.sum(clone_mask)
    clone_rank = jnp.cumsum(clone_mask) - 1               # [C]
    split_rank = jnp.cumsum(split_mask) - 1

    n_new = n_clones + 2 * jnp.sum(split_mask)
    overflow = jnp.maximum(n_new - n_free, 0).astype(jnp.int32)

    def slot_of(rank, want):
        """Free-slot index for a new row of given rank, or `capacity` (an
        out-of-bounds sentinel scatter-dropped by .at[].set(mode='drop'))."""
        ok = want & (rank >= 0) & (rank < n_free)
        return jnp.where(ok, free_slots[jnp.clip(rank, 0, capacity - 1)],
                         capacity)

    clone_slots = slot_of(clone_rank, clone_mask)                   # [C]
    split_slots0 = slot_of(n_clones + 2 * split_rank, split_mask)   # [C]
    split_slots1 = slot_of(n_clones + 2 * split_rank + 1, split_mask)

    # Children of split rows: xyz + R @ N(0, diag(scales)), scales ÷ 1.6.
    k0, k1 = jax.random.split(key)
    R = to_rotation_matrix(params.quats)                            # [C,3,3]

    def split_child(k):
        noise = jax.random.normal(k, (capacity, 3)) * scales
        child_xyz = params.xyz + jnp.einsum(
            "cij,cj->ci", R, noise,
            precision=jax.lax.Precision.HIGHEST)
        child_log_scales = params.log_scales - jnp.log(0.8 * 2)
        return params._replace(xyz=child_xyz, log_scales=child_log_scales)

    children = (split_child(k0), split_child(k1))

    def scatter(dest_leaf, src_leaf, slots):
        return dest_leaf.at[slots].set(src_leaf, mode="drop")

    new_params = params
    new_active = survive
    touched = jnp.zeros((capacity,), bool)

    for src, slots in ((params, clone_slots), (children[0], split_slots0),
                       (children[1], split_slots1)):
        new_params = GaussianParams(*(
            scatter(d, s, slots) for d, s in zip(new_params, src)))
        new_active = new_active.at[slots].set(True, mode="drop")
        touched = touched.at[slots].set(True, mode="drop")

    # New rows start with zeroed optimizer moments (reference surgery).
    new_adam = adam.scatter_zero_rows(adam_state, touched)

    # Stats reset (reference zeroes accum+denom on postfix and max_radii2D at
    # the end of densify_and_prune).
    new_dstate = init(capacity)

    return DensifyResult(params=new_params, active=new_active,
                         adam_state=new_adam, densify_state=new_dstate,
                         n_active=jnp.sum(new_active).astype(jnp.int32),
                         overflow=overflow)


def reset_opacity(params: GaussianParams, meta: GaussianMeta) -> GaussianParams:
    """Clamp opacity to ≤0.01 (in activated space), skybox head rows excluded
    (reference ``scene/gaussian_model.py:528-532``)."""
    from .gaussians import inverse_sigmoid

    op = jax.nn.sigmoid(params.opacity_raw)
    new_raw = inverse_sigmoid(jnp.minimum(op, 0.01))
    keep_head = jnp.arange(params.opacity_raw.shape[0]) < meta.skybox_points
    new_raw = jnp.where(keep_head[:, None], params.opacity_raw, new_raw)
    return params._replace(opacity_raw=new_raw)
