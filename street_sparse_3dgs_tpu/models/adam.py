"""Sparse (visibility-masked) Adam — the OurAdam-equivalent optimizer.

The reference's ``scene/OurAdam.py:105-175,249-337`` gathers only the rows
listed in ``relevant`` (rows whose opacity grad is nonzero, i.e. Gaussians
that actually contributed to the rendered image), applies standard Adam math
to them, and scatters back; moments of untouched rows do **not** decay, and
the bias-correction step counter is global per parameter group.

On TPU a gather-update-scatter touches HBM randomly, so this implements the
semantically identical *masked dense* update (SURVEY.md §7.3 'Sparse Adam on
TPU'): ``where(relevant, adam(p), p)`` with moment updates likewise masked.
Every row is streamed exactly once per step (sequential HBM traffic), which
is what the hardware wants regardless of sparsity.

Per-parameter learning rates mirror the reference groups
(``scene/gaussian_model.py:286-298``): xyz (scheduled ×spatial_lr_scale),
f_dc, f_rest (= f_dc/20), opacity, scaling, rotation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussians import GaussianParams

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15          # reference: Adam(l, lr=0.0, eps=1e-15)
EXPOSURE_EPS = 1e-8  # torch.optim.Adam default used for the exposure group


class AdamState(NamedTuple):
    mu: GaussianParams       # first moments, same pytree as params
    nu: GaussianParams       # second moments
    step: jnp.ndarray        # scalar int32 — global step (bias correction)


def init(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, step=jnp.int32(0))


class ParamLrs(NamedTuple):
    """Per-group learning rates (scalars; xyz is scheduled per step)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray
    opacity_raw: jnp.ndarray

    @staticmethod
    def from_config(xyz_lr, feature_lr, opacity_lr, scaling_lr, rotation_lr):
        """Group wiring per the reference's ``training_setup``
        (f_rest = feature_lr / 20)."""
        return ParamLrs(
            xyz=jnp.float32(xyz_lr),
            features_dc=jnp.float32(feature_lr),
            features_rest=jnp.float32(feature_lr / 20.0),
            log_scales=jnp.float32(scaling_lr),
            quats=jnp.float32(rotation_lr),
            opacity_raw=jnp.float32(opacity_lr),
        )


def step(params: GaussianParams, grads: GaussianParams, state: AdamState,
         lrs: ParamLrs, relevant: jnp.ndarray,
         eps: float = EPS) -> tuple[GaussianParams, AdamState]:
    """One masked Adam step.

    ``relevant``: [C] bool — rows to update (the reference derives it as
    ``opacity.grad != 0``; callers here pass the rasterizer's visibility mask
    ANDed with any freeze masks, which selects the same rows).
    """
    t = state.step + 1
    bc1 = 1.0 - BETA1 ** t.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** t.astype(jnp.float32)

    def leaf(p, g, m, v, lr):
        mask = relevant.reshape((-1,) + (1,) * (p.ndim - 1))
        m_new = jnp.where(mask, BETA1 * m + (1.0 - BETA1) * g, m)
        v_new = jnp.where(mask, BETA2 * v + (1.0 - BETA2) * g * g, v)
        denom = jnp.sqrt(v_new / bc2) + eps
        p_new = jnp.where(mask, p - lr * (m_new / bc1) / denom, p)
        return p_new, m_new, v_new

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(params, grads, state.mu, state.nu, lrs):
        pn, mn, vn = leaf(p, g, m, v, lr)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (GaussianParams(*new_p),
            AdamState(mu=GaussianParams(*new_m), nu=GaussianParams(*new_v),
                      step=t))


# ---------------------------------------------------------------------------
# Plain dense Adam for auxiliary params (exposure; hierarchy post-opt uses it
# for everything, reference ``train_post.py:37``: our_adam=False).


class DenseAdamState(NamedTuple):
    mu: jnp.ndarray
    nu: jnp.ndarray
    step: jnp.ndarray


def dense_init(param: jnp.ndarray) -> DenseAdamState:
    return DenseAdamState(jnp.zeros_like(param), jnp.zeros_like(param),
                          jnp.int32(0))


def dense_step(param, grad, state: DenseAdamState, lr,
               eps: float = EXPOSURE_EPS):
    t = state.step + 1
    bc1 = 1.0 - BETA1 ** t.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** t.astype(jnp.float32)
    m = BETA1 * state.mu + (1.0 - BETA1) * grad
    v = BETA2 * state.nu + (1.0 - BETA2) * grad * grad
    new = param - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return new, DenseAdamState(m, v, t)


def scatter_zero_rows(state: AdamState, rows_mask: jnp.ndarray) -> AdamState:
    """Zero the moments of the given rows — the optimizer-state 'surgery' the
    reference performs when new Gaussians are appended
    (``scene/gaussian_model.py:600-648``: extensions get zeros)."""
    def zero(leaf):
        mask = rows_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, 0.0, leaf)

    return AdamState(mu=jax.tree.map(zero, state.mu),
                     nu=jax.tree.map(zero, state.nu), step=state.step)
