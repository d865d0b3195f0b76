"""Hierarchy post-optimization — the ``train_post.py`` equivalent.

Reference semantics (``train_post.py:31-198``):
  - per step, a random granularity limit ~ logU[0.005, 0.1] (``:66-74``);
  - ``expand_to_size`` + ``get_interpolation_weights`` pick the cut;
  - ``render_post`` lerps child/parent and rasterizes; photometric loss only;
  - grads flow through the lerp to BOTH child and parent rows;
  - skybox tail rows (when locked) and anchor nodes get their grads zeroed
    (``:167-181``);
  - dense ``torch.optim.Adam`` step (``our_adam=False``, eps 1e-15), exposure
    pre-trained from the chunk stage (looked up, not optimized).

TPU-first: the cut is the vectorized mask form (``hierarchy/structure.py``)
so the jitted step has static shapes for every random limit; the dense Adam
is the masked sparse Adam with an all-rows mask.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig, PipelineConfig
from ..core.schedules import expon_lr
from ..hierarchy.render import render_cut, render_cut_compacted
from ..hierarchy.structure import Hierarchy, select_cut
from ..models import adam
from ..models.gaussians import GaussianParams, apply_exposure
from .step import CameraBatch, raster_config
from . import losses

LIMIT_MIN = 0.005
LIMIT_MAX = 0.1


class PostTrainState(NamedTuple):
    params: GaussianParams           # hierarchy rows (abs-opacity convention)
    adam_state: adam.AdamState
    step: jnp.ndarray


def init_post_state(h: Hierarchy) -> PostTrainState:
    return PostTrainState(params=h.params, adam_state=adam.init(h.params),
                          step=jnp.int32(0))


def random_limit(rng) -> float:
    """limit = 2^(u·(log2 max − log2 min) + log2 min) (``train_post.py:
    66-74``); host-side python RNG like the reference's torch.rand."""
    u = rng.random()
    return math.pow(2, u * (math.log2(LIMIT_MAX) - math.log2(LIMIT_MIN))
                    + math.log2(LIMIT_MIN))


def default_post_capacity(h: Hierarchy, campos_list,
                          limit: float = LIMIT_MIN) -> int:
    """Initial compact-cut capacity: sample the FINEST-granularity cut at a
    few camera positions and pad 1.5× to the next power of two (bounded
    compile set under growth)."""
    topo = h._replace(params=None)
    worst = 0
    for campos in list(campos_list)[:8]:
        cut = select_cut(topo, jnp.asarray(campos), limit)
        worst = max(worst, int(jnp.sum(cut.selected)))
    need = int(worst * 1.5) + 64
    return 1 << max(6, (need - 1).bit_length())


class CompactPostDriver:
    """Host driver for the O(cut) compacted post-opt step with static-shape
    capacity growth.

    The step is dispatched with a one-step lag: step t's ``cut_overflow`` is
    checked right before dispatching t+1 (host batch prep overlaps device
    work).  On overflow the capacity is grown to the next power of two that
    fits, the step re-jitted, and step t REDONE from its pre-step state —
    no work is ever silently dropped (the densification growth policy,
    ``train/loop.py``)."""

    def __init__(self, h: Hierarchy, opt: OptimizationConfig,
                 pipe: PipelineConfig, capacity: int, **step_kwargs):
        self._h = h
        self._opt = opt
        self._pipe = pipe
        self._kwargs = step_kwargs
        self.capacity = int(capacity)
        self.state = init_post_state(h)
        self.redos = 0
        self._pending = None          # (pre-step state, args, aux)
        self._make()

    def _make(self):
        self._step = make_post_step(self._h, self._opt, self._pipe,
                                    compact_capacity=self.capacity,
                                    **self._kwargs)

    def _resolve(self):
        prev, args, aux = self._pending
        self._pending = None
        ovf = int(aux["cut_overflow"])
        while ovf > 0:
            need = self.capacity + ovf
            self.capacity = 1 << (need - 1).bit_length()
            self._make()
            self.redos += 1
            self.state, aux = self._step(prev, *args)
            ovf = int(aux["cut_overflow"])
        return aux

    def step(self, batch: CameraBatch, limit, exposure_row):
        """Run one post-opt step; returns the PREVIOUS step's resolved aux
        (None on the first call).  Call ``finish()`` after the loop."""
        out = self._resolve() if self._pending is not None else None
        prev = self.state
        args = (batch, limit, exposure_row)
        self.state, aux = self._step(prev, *args)
        self._pending = (prev, args, aux)
        return out

    def finish(self) -> PostTrainState:
        """Resolve the in-flight step and return the final state."""
        if self._pending is not None:
            self._resolve()
        return self.state


def make_post_step(
    h: Hierarchy,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    *,
    skybox_locked: bool = True,
    use_trained_exp: bool = True,
    white_background: bool = False,
    compact_capacity: int | None = None,
):
    """Returns jitted ``(state, batch, limit, exposure_row) -> (state, aux)``.
    Topology arrays are closed over (they never change during post-opt).

    Post-opt renders against the *fixed* white/black background — unlike the
    coarse/single stages it does not randomize per step (``train_post.py:
    42-43,123``).

    ``compact_capacity`` switches the render from the O(nodes) mask form to
    the O(cut) compacted form (``hierarchy/render.blend_cut_compact``): only
    the selected rows (+ skybox tail) are gathered, lerped and rasterized;
    grads scatter-add back to the node arrays through the gather VJP.  The
    aux ``cut_overflow`` counts selected nodes beyond capacity — the driver
    must grow the capacity and REDO the step when it is nonzero (static
    shapes + host growth, same policy as densification)."""
    cfg = raster_config(pipe)
    bg = (jnp.ones((3,), jnp.float32) if white_background
          else jnp.zeros((3,), jnp.float32))
    n_nodes = h.n_nodes
    skybox_count = h.skybox_count
    total = h.n_rows
    sh_degree = int(math.isqrt(
        h.params.features_rest.shape[1] + 1)) - 1
    topo = Hierarchy(params=None, parent=h.parent, child_start=h.child_start,
                     child_count=h.child_count, box_center=h.box_center,
                     box_half=h.box_half, size=h.size, anchors=h.anchors,
                     skybox_count=skybox_count)

    anchor_rows = jnp.concatenate(
        [h.anchors, jnp.zeros((total - n_nodes,), bool)])
    if skybox_locked and skybox_count > 0:
        tail = jnp.arange(total) >= (total - skybox_count)
        frozen_rows = anchor_rows | tail
    else:
        frozen_rows = anchor_rows

    def loss_fn(params, batch: CameraBatch, cut, exposure_row):
        if compact_capacity is not None:
            out = render_cut_compacted(params, cut, n_nodes, skybox_count,
                                       compact_capacity, batch.camera,
                                       sh_degree, bg, cfg)
        else:
            out = render_cut(params, cut, n_nodes, skybox_count, batch.camera,
                             sh_degree, bg, cfg)
        image = out["render"]
        if use_trained_exp:
            image = apply_exposure(image, exposure_row)
        image = jnp.clip(image, 0.0, 1.0)
        loss = losses.photometric(image * batch.alpha_mask, batch.gt_image,
                                  opt.lambda_dssim)
        return loss, (image, out.get("cut_overflow", jnp.int32(0)))

    @jax.jit
    def step_fn(state: PostTrainState, batch: CameraBatch, limit,
                exposure_row):
        it = state.step + 1
        cut = select_cut(topo, batch.camera.campos, limit)

        (loss, (image, cut_overflow)), g_params = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, cut, exposure_row)

        g_params = GaussianParams(*(jnp.where(
            frozen_rows.reshape((-1,) + (1,) * (g.ndim - 1)), 0.0, g)
            for g in g_params))

        xyz_lr = expon_lr(it, opt.position_lr_init, opt.position_lr_final,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        lrs = adam.ParamLrs.from_config(xyz_lr, opt.feature_lr,
                                        opt.opacity_lr, opt.scaling_lr,
                                        opt.rotation_lr)
        # Dense Adam (reference: our_adam=False) == masked Adam, all rows on.
        all_rows = jnp.ones((total,), bool)
        new_params, new_adam = adam.step(state.params, g_params,
                                         state.adam_state, lrs, all_rows)
        new_state = PostTrainState(params=new_params, adam_state=new_adam,
                                   step=it)
        return new_state, {"loss": loss, "image": image,
                           "n_selected": jnp.sum(cut.selected),
                           "cut_overflow": cut_overflow}

    return step_fn
