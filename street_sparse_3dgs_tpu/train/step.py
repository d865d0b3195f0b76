"""The jitted per-iteration training step (render → loss → grads → update).

One compiled XLA program per (capacity, resolution, mode) covering what the
reference does across ``train_single.py:100-241`` / ``train_coarse.py:60-148``
per iteration: forward render, photometric + depth losses, backward, grad
masking (skybox / scaffold / depth-only), the OurAdam sparse step on rows
whose opacity grad is nonzero, the exposure Adam step, the scheduled learning
rates, and densification-stat accumulation.  Densify/prune itself runs at its
cadence as a separate jitted function (``models/densify.py``), orchestrated
by the host loop (``train/loop.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig, PipelineConfig
from ..core.camera import CameraParams
from ..core.schedules import expon_lr
from ..models import adam
from ..models.gaussians import (GaussianMeta, GaussianParams, activate_opacity,
                                activate_scales, apply_exposure, sh_coeffs)
from ..ops.rasterize import RasterConfig, rasterize
from . import losses


class TrainState(NamedTuple):
    params: GaussianParams
    active: jnp.ndarray              # [C] bool
    adam_state: adam.AdamState
    exposure: jnp.ndarray            # [n_images, 3, 4]
    exposure_adam: adam.DenseAdamState
    grad_accum: jnp.ndarray          # [C] densify stats (max screen-grad norm)
    denom: jnp.ndarray               # [C]
    max_radii2d: jnp.ndarray         # [C]
    step: jnp.ndarray                # scalar int32 (1-based like the reference)


class CameraBatch(NamedTuple):
    """Everything one training view contributes (arrays only; static flags
    like is_depth_only select a different compiled step)."""

    camera: CameraParams
    gt_image: jnp.ndarray            # [3, H, W]
    alpha_mask: jnp.ndarray          # [1, H, W] (ones if absent)
    mono_invdepth: jnp.ndarray       # [1, H, W] (zeros if absent)
    depth_mask: jnp.ndarray          # [1, H, W]
    depth_reliable: jnp.ndarray      # scalar bool
    image_index: jnp.ndarray         # scalar int32 — exposure table row


def init_state(params: GaussianParams, active, n_images: int) -> TrainState:
    from ..models.gaussians import init_exposure

    c = params.xyz.shape[0]
    z = jnp.zeros((c,), jnp.float32)
    return TrainState(
        params=params, active=active, adam_state=adam.init(params),
        exposure=init_exposure(n_images),
        exposure_adam=adam.dense_init(init_exposure(n_images)),
        grad_accum=z, denom=z, max_radii2d=z, step=jnp.int32(0))


def raster_config(pipe: PipelineConfig) -> RasterConfig:
    if pipe.exact_extra < 0:
        raise ValueError(
            "exact_extra == -1 (self-sizing) must be resolved by the train "
            "loop's autosizer before building a step")
    return RasterConfig(method=pipe.raster_method, max_dup=pipe.max_dup,
                        tile_capacity=pipe.tile_capacity,
                        tiles_chunk=pipe.tiles_chunk,
                        exact_extra=pipe.exact_extra,
                        grad_sort=pipe.grad_sort,
                        grad_reduce=pipe.grad_reduce,
                        dup_overscan=pipe.dup_overscan,
                        dup_tails=tuple(pipe.dup_tails))


def make_train_step(
    meta: GaussianMeta,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    spatial_lr_scale: float,
    *,
    sh_degree_schedule: bool = True,
    is_depth_only: bool = False,
    use_trained_exp: bool = True,
    optimize_xyz: bool = True,
    additional_depth_maps_weight: float = 0.9,
    zero_scaling_grads_for_skybox: bool = False,
    clamp_extent: float | None = None,
    clamp_fraction: float = 0.02,
    random_background: bool = True,
    white_background: bool = False,
    background_seed: int = 17,
):
    """Build the jitted step for one training mode.

    Flags map to reference behaviors:
      - ``is_depth_only``: the virtual LiDAR-camera branch
        (``train_single.py:145-161, 203-215``) — hinge+pure depth loss only,
        features/exposure grads zeroed, exposure optimizer skipped;
      - ``optimize_xyz=False``: coarse stage (xyz lr forced 0,
        ``train_coarse.py:55-57``);
      - ``zero_scaling_grads_for_skybox``: coarse stage
        (``train_coarse.py:132``);
      - ``use_trained_exp``: per-image exposure affine applied post-render
        (``gaussian_renderer/__init__.py:115-118``);
      - ``clamp_extent``: when set, the per-iteration big-Gaussian scale
        clamp (×0.8 above ``clamp_fraction·extent``, ``train_single.py:
        235-241``) is fused into the step — one dispatch per iteration
        instead of two;
      - ``random_background``: a fresh uniform [0,1)³ background per
        iteration, drawn in-step from a PRNG key folded with the step
        counter (the reference draws ``torch.rand(3)`` every step:
        ``train_coarse.py:62``, ``train_single.py:74``) — this is what stops
        opacity from exploiting a fixed background; ``white_background``
        selects the fixed color when it's off (eval / post-opt semantics).
    """
    cfg = raster_config(pipe)
    max_sh = meta.sh_degree
    bg_key = jax.random.PRNGKey(background_seed)
    fixed_bg = (jnp.ones((3,), jnp.float32) if white_background
                else jnp.zeros((3,), jnp.float32))

    def render_with(params, active, exposure_row, mean2d_res, batch,
                    active_sh, bg):
        out = rasterize(
            params.xyz, activate_scales(params), params.quats,
            activate_opacity(params, meta), sh_coeffs(params), batch.camera,
            active_sh, bg, cfg,
            active_mask=active, mean2d_residual=mean2d_res)
        image = out["render"]
        if use_trained_exp and not is_depth_only:
            image = apply_exposure(image, exposure_row)
        image = jnp.clip(image, 0.0, 1.0)
        return image, out

    def loss_fn(params, exposure_row, mean2d_res, active, batch,
                active_sh, depth_w, bg):
        image, out = render_with(params, active, exposure_row, mean2d_res,
                                 batch, active_sh, bg)
        inv_depth = out["depth"]
        if is_depth_only:
            pure = losses.depth_l1(inv_depth, batch.mono_invdepth,
                                   batch.depth_mask)
            hinge = losses.depth_hinge(inv_depth, batch.mono_invdepth)
            w = additional_depth_maps_weight
            loss = depth_w * (w * hinge + (1.0 - w) * pure)
            loss = jnp.where(batch.depth_reliable, loss, 0.0)
        else:
            image_m = image * batch.alpha_mask
            loss = losses.photometric(image_m, batch.gt_image,
                                      opt.lambda_dssim)
            pure = losses.depth_l1(inv_depth, batch.mono_invdepth,
                                   batch.depth_mask)
            loss = loss + jnp.where(batch.depth_reliable, depth_w * pure, 0.0)
        return loss, (image, out)

    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def step_fn(state: TrainState, batch: CameraBatch, active_sh: int):
        it = state.step + 1
        xyz_lr = expon_lr(it, opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        if not optimize_xyz:
            xyz_lr = jnp.float32(0.0)
        exp_lr = expon_lr(it, opt.exposure_lr_init, opt.exposure_lr_final,
                          lr_delay_steps=opt.exposure_lr_delay_steps,
                          lr_delay_mult=opt.exposure_lr_delay_mult,
                          max_steps=opt.iterations)
        depth_w = expon_lr(it, opt.depth_l1_weight_init,
                           opt.depth_l1_weight_final,
                           max_steps=opt.iterations)

        capacity = state.params.xyz.shape[0]
        mean2d_res = jnp.zeros((capacity, 2), jnp.float32)
        exposure_row = state.exposure[batch.image_index]
        if random_background:
            bg = jax.random.uniform(jax.random.fold_in(bg_key, it), (3,))
        else:
            bg = fixed_bg

        (loss, (image, out)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, exposure_row, mean2d_res, state.active,
                batch, active_sh, depth_w, bg)
        g_params, g_exposure_row, g_screen = grads

        # --- Grad masking ---------------------------------------------------
        rows = jnp.arange(capacity)
        if meta.skybox_locked and meta.skybox_points > 0:
            locked = rows < meta.skybox_points
            g_params = GaussianParams(*(jnp.where(
                locked.reshape((-1,) + (1,) * (g.ndim - 1)), 0.0, g)
                for g in g_params))
        if zero_scaling_grads_for_skybox and meta.skybox_points > 0:
            sky = (rows < meta.skybox_points)[:, None]
            g_params = g_params._replace(
                log_scales=jnp.where(sky, 0.0, g_params.log_scales))
        if is_depth_only:
            g_params = g_params._replace(
                features_dc=jnp.zeros_like(g_params.features_dc),
                features_rest=jnp.zeros_like(g_params.features_rest))

        # --- Sparse Adam on rows with nonzero opacity grad ------------------
        relevant = (g_params.opacity_raw[:, 0] != 0.0) & state.active
        lrs = adam.ParamLrs.from_config(xyz_lr, opt.feature_lr, opt.opacity_lr,
                                        opt.scaling_lr, opt.rotation_lr)
        new_params, new_adam = adam.step(state.params, g_params,
                                         state.adam_state, lrs, relevant)

        # --- Exposure Adam (dense over the whole table, as torch does) ------
        if use_trained_exp and not is_depth_only:
            g_exp = jnp.zeros_like(state.exposure).at[batch.image_index].set(
                g_exposure_row)
            new_exposure, new_exp_adam = adam.dense_step(
                state.exposure, g_exp, state.exposure_adam, exp_lr)
        else:
            new_exposure, new_exp_adam = state.exposure, state.exposure_adam

        # --- Densification stats -------------------------------------------
        visible = out["visibility"] & state.active
        norm = jnp.linalg.norm(g_screen[:, :2], axis=-1)
        grad_accum = jnp.where(visible,
                               jnp.maximum(state.grad_accum, norm),
                               state.grad_accum)
        denom = state.denom + visible.astype(jnp.float32)
        max_radii2d = jnp.where(visible,
                                jnp.maximum(state.max_radii2d, out["radii"]),
                                state.max_radii2d)

        if clamp_extent is not None:
            from ..models.gaussians import clamp_big_gaussians

            new_params = clamp_big_gaussians(
                new_params, meta, clamp_extent, clamp_fraction, state.active)

        new_state = TrainState(
            params=new_params, active=state.active, adam_state=new_adam,
            exposure=new_exposure, exposure_adam=new_exp_adam,
            grad_accum=grad_accum, denom=denom, max_radii2d=max_radii2d,
            step=it)
        aux = {"loss": loss, "image": image, "bg": bg,
               "n_visible": jnp.sum(visible),
               "dup_overflow": out["dup_overflow"],
               "tile_overflow": out["tile_overflow"]}
        if cfg.grad_reduce == "counts" and cfg.exact_extra:
            # Corrupted-gradient guard (VERDICT r4 item 2): the counts-based
            # backward is only sound at tile_overflow == 0 — window-budget
            # drops shift every later rank's gradient segment.  On an
            # overflowing step REVERT the whole update in-step (no host
            # sync; the step counter still advances so the loop proceeds)
            # and surface ``update_skipped``; the loop's overflow check
            # grows ``exact_extra`` and re-jits.  Corrupted gradients are
            # never applied.
            ok = out["tile_overflow"] == 0
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                new_state, state._replace(step=it))
            aux["update_skipped"] = jnp.where(ok, 0, 1).astype(jnp.int32)
        return new_state, aux

    def step(state: TrainState, batch: CameraBatch):
        # SH degree warmup: +1 every 1000 iters up to max (reference
        # ``oneupSHdegree``, ``train_single.py:104-106``).
        it = int(state.step)
        active_sh = min(it // 1000, max_sh) if sh_degree_schedule else max_sh
        return step_fn(state, batch, active_sh)

    return step
