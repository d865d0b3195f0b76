"""Data-parallel (multi-view) sharded training step.

Scales one chunk's optimization across chips: a batch of B cameras is
sharded over the mesh's ``data`` axis (each chip renders + backprops its own
views — the rasterizer is embarrassingly parallel across images), parameters
are replicated, and XLA inserts the gradient ``psum`` over ICI when the
per-view grads are averaged into the replicated update.  This is the TPU
scaling axis the reference simply doesn't have (SURVEY.md §2.6 P7/P8: its
only parallelism is Slurm process fan-out across chunks).

Semantics vs the single-view step (``train/step.py``):
  - loss is the *mean* over the batch (B aggregated views per optimizer step
    instead of 1 — the standard large-batch equivalent);
  - the sparse-Adam ``relevant`` mask is the **union** of per-view visibility
    (a row steps if any view produced an opacity grad, mirroring OurAdam's
    nonzero-grad row selection);
  - densification stats take the per-row **max** over views of the screen-
    gradient norm and radius — identical to accumulating the views serially
    (the reference accumulates with max anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizationConfig, PipelineConfig
from ..core.schedules import expon_lr
from ..models import adam
from ..models.gaussians import (GaussianMeta, GaussianParams, activate_opacity,
                                activate_scales, apply_exposure, sh_coeffs)
from ..ops.rasterize import rasterize
from ..train import losses
from ..train.step import CameraBatch, TrainState, raster_config


def make_dp_train_step(
    meta: GaussianMeta,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    spatial_lr_scale: float,
    mesh: Mesh,
    *,
    use_trained_exp: bool = True,
    optimize_xyz: bool = True,
    zero_scaling_grads_for_skybox: bool = False,
    additional_depth_maps_weight: float = 0.9,
    random_background: bool = True,
    white_background: bool = False,
    background_seed: int = 17,
):
    """Returns a jitted ``(state, batched CameraBatch, active_sh,
    depth_flags) -> (state, aux)`` step.  Every array in the batch has a
    leading B axis sharded over ``data``; B must be a multiple of the
    data-axis size.

    ``depth_flags`` (optional [B] bool) marks depth-only virtual-LiDAR views
    inside a mixed batch: those views contribute the hinge+pure depth loss
    (``train_single.py:145-161``) instead of the photometric loss.  The
    selection is a per-view ``where`` on the scalar loss, so feature and
    exposure gradients from depth-only views vanish exactly as in the serial
    depth-only step (the depth channel does not depend on SH color or on the
    exposure affine).

    The per-view random background mirrors the reference's per-iteration
    ``torch.rand(3)`` (``train_single.py:74``); every view in the batch gets
    its own draw, deterministic in (seed, step, view-slot) so each chip
    computes its shard without host round-trips."""
    cfg = raster_config(pipe)
    bg_key = jax.random.PRNGKey(background_seed)
    fixed_bg = (jnp.ones((3,), jnp.float32) if white_background
                else jnp.zeros((3,), jnp.float32))
    w_add = additional_depth_maps_weight

    def loss_one(params, active, exposure_row, mean2d_res, batch: CameraBatch,
                 active_sh, depth_w, bg, depth_flag):
        out = rasterize(
            params.xyz, activate_scales(params), params.quats,
            activate_opacity(params, meta), sh_coeffs(params), batch.camera,
            active_sh, bg, cfg,
            active_mask=active, mean2d_residual=mean2d_res)
        image = out["render"]
        if use_trained_exp:
            image = apply_exposure(image, exposure_row)
        image = jnp.clip(image, 0.0, 1.0)
        photo = losses.photometric(image * batch.alpha_mask, batch.gt_image,
                                   opt.lambda_dssim)
        pure = losses.depth_l1(out["depth"], batch.mono_invdepth,
                               batch.depth_mask)
        photo = photo + jnp.where(batch.depth_reliable, depth_w * pure, 0.0)
        hinge = losses.depth_hinge(out["depth"], batch.mono_invdepth)
        donly = depth_w * (w_add * hinge + (1.0 - w_add) * pure)
        donly = jnp.where(batch.depth_reliable, donly, 0.0)
        loss = jnp.where(depth_flag, donly, photo)
        return loss, (out["visibility"], out["radii"])

    def batched_loss(params, active, exposure, mean2d_res, batch, active_sh,
                     depth_w, bgs, depth_flags):
        exposure_rows = exposure[batch.image_index]          # [B, 3, 4]
        lv, (vis, radii) = jax.vmap(
            loss_one, in_axes=(None, None, 0, 0, 0, None, None, 0, 0))(
                params, active, exposure_rows, mean2d_res, batch, active_sh,
                depth_w, bgs, depth_flags)
        return jnp.mean(lv), (vis, radii)

    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def step_fn(state: TrainState, batch: CameraBatch, active_sh: int = None,
                depth_flags: jnp.ndarray | None = None):
        active_sh_ = meta.sh_degree if active_sh is None else active_sh
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
                           opt.depth_l1_weight_final, max_steps=opt.iterations)

        capacity = state.params.xyz.shape[0]
        b = batch.image_index.shape[0]
        mean2d_res = jnp.zeros((b, capacity, 2), jnp.float32)
        if depth_flags is None:
            depth_flags = jnp.zeros((b,), bool)
        if random_background:
            bgs = jax.random.uniform(jax.random.fold_in(bg_key, it), (b, 3))
        else:
            bgs = jnp.broadcast_to(fixed_bg, (b, 3))

        (loss, (vis, radii)), grads = jax.value_and_grad(
            batched_loss, argnums=(0, 2, 3), has_aux=True)(
                state.params, state.active, state.exposure, mean2d_res,
                batch, active_sh_, depth_w, bgs, depth_flags)
        g_params, g_exposure, g_screen = grads

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

        relevant = (g_params.opacity_raw[:, 0] != 0.0) & state.active
        lrs = adam.ParamLrs.from_config(xyz_lr, opt.feature_lr, opt.opacity_lr,
                                        opt.scaling_lr, opt.rotation_lr)
        new_params, new_adam = adam.step(state.params, g_params,
                                         state.adam_state, lrs, relevant)

        if use_trained_exp:
            new_exposure, new_exp_adam = adam.dense_step(
                state.exposure, g_exposure, state.exposure_adam, exp_lr)
        else:
            new_exposure, new_exp_adam = state.exposure, state.exposure_adam

        # Densify stats: per-row max over views == serial accumulation.
        visible_any = jnp.any(vis, axis=0) & state.active
        norm = jnp.max(jnp.linalg.norm(g_screen[..., :2], axis=-1), axis=0)
        grad_accum = jnp.where(visible_any,
                               jnp.maximum(state.grad_accum, norm),
                               state.grad_accum)
        denom = state.denom + jnp.sum(vis, axis=0).astype(jnp.float32)
        max_radii2d = jnp.where(visible_any,
                                jnp.maximum(state.max_radii2d,
                                            jnp.max(radii, axis=0)),
                                state.max_radii2d)

        new_state = state._replace(
            params=new_params, adam_state=new_adam, exposure=new_exposure,
            exposure_adam=new_exp_adam, grad_accum=grad_accum, denom=denom,
            max_radii2d=max_radii2d, step=it)
        return new_state, {"loss": loss, "n_visible": jnp.sum(visible_any)}

    def shard_batch(batch: CameraBatch) -> CameraBatch:
        """Place the batch with its leading axis sharded over ``data``."""
        ds = NamedSharding(mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(x, ds), batch)

    def shard_state(state: TrainState) -> TrainState:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)

    return step_fn, shard_batch, shard_state
