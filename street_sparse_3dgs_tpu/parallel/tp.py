"""Tile-sharded TRAINING step: loss and gradients through the sharded blend.

Round-2 verdict item #4: the sharded renderers (``parallel/tiles.py``,
``parallel/ring.py``) had image+grad parity but nothing *trained* through
them — street-scale views (Cyclomedia cube faces) could only be optimized
one-chip-per-view.  This module shards the blend of a whole training batch
over the mesh:

- Each of the B views is projected / binned / packed replicated (O(N) work,
  cheap next to the blend — same stance as ``rasterize_tile_sharded``).
- The B per-view padded tile ranges are CONCATENATED along the tile axis
  into one [B·T_pad, 16, K] attribute array, sharded over the mesh's
  combined ``(data, tile)`` axes with ``shard_map``: every chip blends a
  contiguous slab of (view, tile) pairs.  The kernel recovers each tile's
  pixel origin from the flattened index via the static ``t_mod = T_pad``
  wrap (``ops/pallas_blend._pixel_coords``), and per-view random
  backgrounds ride a per-tile [B·T_pad, 3] SMEM row.
- The loss is the batch mean; grads flow through the shard_map VJP (the
  per-slab attribute cotangents re-assemble onto the replicated
  segment-reduction of ``_gather_pack``) and land in the replicated sparse
  Adam update exactly as in the serial step.

Composability: one mesh axis is enough for a single big image (pure tile
sharding); with B > 1 the same flattened axis spreads whole views AND their
tiles — a (data × tile) mesh degenerates to slicing that one axis, so both
parallelism styles are the same program here.  Parity vs the serial step is
locked by ``tests/test_parallel.py`` (images, per-parameter grads, state
equality after steps, including a mixed depth-only batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import OptimizationConfig, PipelineConfig
from ..core.schedules import expon_lr
from ..models import adam
from ..models.gaussians import (GaussianMeta, GaussianParams, activate_opacity,
                                activate_scales, apply_exposure, sh_coeffs)
from ..ops.binning import TILE, bin_gaussians, num_tiles
from ..ops.pallas_blend import (OA, OB, OI, OR, _blend_exact, _blend_packed,
                                _interpret_default, pack_gather_attrs)
from ..ops.preprocess import project_gaussians
from ..train import losses
from ..train.step import CameraBatch, TrainState, raster_config


def rasterize_batch_tile_sharded(
    means3d, scales, quats, opacities, shs, cameras, sh_degree: int,
    bgs: jnp.ndarray,                      # [B, 3] per-view backgrounds
    mesh: Mesh,
    axes: tuple[str, ...] = ("data", "tile"),
    config=None,
    active_mask=None,
    mean2d_residual=None,                  # [B, N, 2] or None
    interpret: bool | None = None,
):
    """Render B views with all their tiles sharded over ``axes``.

    Returns per-view stacked outputs: render [B,3,H,W], depth [B,1,H,W],
    alpha [B,H,W], radii/visibility [B,N], overflow counters (summed).
    All views share one camera resolution (the training-batch contract the
    DP step already has)."""
    from ..ops.rasterize import RasterConfig

    cfg = config or RasterConfig(method="pallas")
    b = bgs.shape[0]
    n_shards = 1
    for ax in axes:
        n_shards *= mesh.shape[ax]

    cam0 = jax.tree.map(lambda x: x[0], cameras)
    h, w = cam0.height, cam0.width

    projs = []
    for i in range(b):
        cam = jax.tree.map(lambda x: x[i], cameras)
        proj = project_gaussians(means3d, scales, quats, opacities, shs,
                                 cam, sh_degree, 1.0, active_mask)
        if mean2d_residual is not None:
            proj = proj._replace(mean2d=proj.mean2d + mean2d_residual[i])
        projs.append(proj)

    if cfg.exact_extra:
        return _rasterize_batch_exact(projs, h, w, bgs, mesh, axes,
                                      n_shards, cfg, interpret)

    attrs_views, bins_list = [], []
    for proj in projs:
        bins = bin_gaussians(proj, h, w, cfg.max_dup, cfg.tile_capacity)
        attrs_views.append(pack_gather_attrs(
            bins.gather, proj.mean2d, proj.conic, proj.color,
            proj.opacity, proj.inv_depth, order=bins.order, rank=bins.rank))
        bins_list.append(bins)

    tiles_x, tiles_y = bins_list[0].tiles_x, bins_list[0].tiles_y
    t_total = tiles_x * tiles_y
    # Per-view range padded so every view starts shard-aligned AND at a
    # multiple of its own tile count (the kernel wraps with t_mod = t_pad).
    t_pad = t_total + ((-t_total) % n_shards)
    k_cap = attrs_views[0].shape[2]

    def pad_view(a):
        return jnp.concatenate(
            [a, jnp.zeros((t_pad - t_total,) + a.shape[1:], a.dtype)], 0)

    attrs = jnp.concatenate([pad_view(a) for a in attrs_views], 0)
    counts = jnp.concatenate(
        [pad_view(bi.counts.astype(jnp.int32)) for bi in bins_list]
    )[None, :]                                          # [1, B·T_pad] (SMEM row)
    bg_tiles = jnp.repeat(bgs, t_pad, axis=0)           # [B·T_pad, 3]

    interp = _interpret_default() if interpret is None else interpret
    t_local = (b * t_pad) // n_shards

    def shard_index():
        idx = jnp.int32(0)
        for ax in axes:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        return idx

    def local_blend(attrs_shard, counts_shard, bg_shard):
        tile0 = (shard_index() * t_local).astype(jnp.int32).reshape(1, 1)
        return _blend_packed(interp, tiles_x, t_pad, 1, tile0, counts_shard,
                             attrs_shard, bg_shard)

    out = shard_map(
        local_blend, mesh=mesh,
        in_specs=(P(axes), P(None, axes), P(axes)), out_specs=P(axes),
        check_vma=False,
    )(attrs, counts, bg_tiles)                          # [B·T_pad, 8, 256]
    out = out.reshape(b, t_pad, 8, TILE * TILE)

    def to_image(flat, channels):
        img = flat[:t_total].reshape(tiles_y, tiles_x, channels, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * TILE, tiles_x * TILE)
        return img[:, :h, :w]

    images = jnp.stack([to_image(out[i, :, OR:OB + 1, :], 3)
                        for i in range(b)])
    depths = jnp.stack([to_image(out[i, :, OI:OI + 1, :], 1)
                        for i in range(b)])
    alphas = jnp.stack([to_image(out[i, :, OA:OA + 1, :], 1)[0]
                        for i in range(b)])
    return {
        "render": images, "depth": depths, "alpha": alphas,
        "radii": jnp.stack([p.radius for p in projs]),
        "visibility": jnp.stack([p.valid for p in projs]),
        "dup_overflow": sum(bn.dup_overflow for bn in bins_list),
        "tile_overflow": sum(bn.tile_overflow for bn in bins_list),
    }


def _rasterize_batch_exact(projs, h, w, bgs, mesh, axes, n_shards, cfg,
                           interpret):
    """Exact (virtual-tile) multi-view blend, sharded over the mesh.

    Each view bins with the shard-segmented window allocation
    (``exact_shards = n_shards``), so its virtual-tile range is
    ``n_shards`` static segments of ``l_v`` windows whose boundaries never
    split a tile's windows.  The concatenated [B·T_v] axis is therefore
    ``B·n_shards`` such segments, and any device boundary (a multiple of
    ``B·l_v``) lands on a segment boundary — every tile's cross-window
    VMEM scratch carry stays device-local.  Tile ids ride meta GLOBALLY
    (``view · tpp + local``; the kernels wrap by the static ``t_mod=tpp``
    for pixel coords), which keeps the backward's per-real-tile broadcast
    unambiguous across views.

    Per-view random backgrounds cannot ride the exact kernels' single
    replicated SMEM bg, so the blend runs on a ZERO background and the
    composite happens outside: ``image = rgb + (1 − alpha) · bg`` — exact,
    because the blend's alpha output is ``1 − T_final``, and
    differentiable through the backward's handled alpha cotangent."""
    b = len(projs)
    tiles_x, tiles_y = num_tiles(h, w)
    t_total = tiles_x * tiles_y
    extra = -(-cfg.exact_extra // n_shards) * n_shards
    with_counts = cfg.grad_reduce == "counts"

    kw = dict(exact_extra=extra, exact_shards=n_shards,
              with_seg_pos=with_counts, dup_overscan=cfg.dup_overscan)
    if cfg.dup_tails:
        kw["dup_tails"] = cfg.dup_tails

    attrs_l, meta_l, lastv_l, bins_list = [], [], [], []
    t_v = tpp = None
    for i, proj in enumerate(projs):
        bins = bin_gaussians(proj, h, w, cfg.max_dup, cfg.tile_capacity,
                             **kw)
        attrs_l.append(pack_gather_attrs(
            bins.gather, proj.mean2d, proj.conic, proj.color, proj.opacity,
            proj.inv_depth, order=bins.order, rank=bins.rank,
            grad_sort=cfg.grad_sort, seg_pos=bins.seg_pos,
            pair_major=True))
        t_v = bins.t_of_v.shape[0]
        tpp = t_v - extra                     # shard-padded real-tile count
        used = bins.t_of_v < tpp
        t_glob = jnp.where(used, i * tpp + bins.t_of_v, b * tpp)
        t_safe = jnp.minimum(bins.t_of_v, t_total - 1)
        is_last = ((bins.t_of_v >= t_total)
                   | (jnp.arange(t_v, dtype=jnp.int32)
                      == bins.last_v[t_safe])).astype(jnp.int32)
        meta_l.append(jnp.stack([t_glob, bins.wt, bins.vcounts, is_last]))
        # Last window of EVERY padded tile (real + shard padding) — shard
        # padding tiles carry one zero-count window each; their outputs
        # are never read (zero cotangent) but the backward broadcast
        # indexes them, so the table must stay in-bounds and consistent.
        lastv_full = jnp.zeros((tpp + 1,), jnp.int32).at[
            jnp.where(used, bins.t_of_v, tpp)].max(
            jnp.arange(t_v, dtype=jnp.int32))[:tpp]
        lastv_l.append(i * t_v + lastv_full)
        bins_list.append(bins)

    attrs = jnp.concatenate(attrs_l, axis=0)          # [B·T_v, K, 10]
    meta = jnp.concatenate(meta_l, axis=1)            # [4, B·T_v]
    last_v = jnp.concatenate(lastv_l)                 # [B·tpp]
    n_local = (b * t_v) // n_shards
    tb = next(d for d in (8, 4, 2, 1) if n_local % d == 0)

    interp = _interpret_default() if interpret is None else interpret
    zero_bg = jnp.zeros((1, 3), jnp.float32)
    out = _blend_exact(interp, tiles_x, tb, mesh, tuple(axes), tpp, meta,
                       last_v, attrs, zero_bg)        # [B·tpp, 8, P]
    out = out.reshape(b, tpp, 8, TILE * TILE)

    def to_image(flat, channels):
        img = flat[:t_total].reshape(tiles_y, tiles_x, channels, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * TILE, tiles_x * TILE)
        return img[:, :h, :w]

    alphas = jnp.stack([to_image(out[i, :, OA:OA + 1, :], 1)[0]
                        for i in range(b)])
    images = jnp.stack([
        to_image(out[i, :, OR:OB + 1, :], 3)
        + (1.0 - alphas[i])[None] * bgs[i][:, None, None]
        for i in range(b)])
    depths = jnp.stack([to_image(out[i, :, OI:OI + 1, :], 1)
                        for i in range(b)])
    return {
        "render": images, "depth": depths, "alpha": alphas,
        "radii": jnp.stack([p.radius for p in projs]),
        "visibility": jnp.stack([p.valid for p in projs]),
        "dup_overflow": sum(bn.dup_overflow for bn in bins_list),
        "tile_overflow": sum(bn.tile_overflow for bn in bins_list),
    }


def make_tile_sharded_train_step(
    meta: GaussianMeta,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    spatial_lr_scale: float,
    mesh: Mesh,
    axes: tuple[str, ...] = ("data", "tile"),
    *,
    use_trained_exp: bool = True,
    optimize_xyz: bool = True,
    zero_scaling_grads_for_skybox: bool = False,
    additional_depth_maps_weight: float = 0.9,
    random_background: bool = True,
    white_background: bool = False,
    background_seed: int = 17,
    interpret: bool | None = None,
):
    """Jitted ``(state, batched CameraBatch, active_sh, depth_flags) ->
    (state, aux)``: the DP step's semantics (batch-mean loss, union
    visibility, per-row max densify stats, mixed depth-only views) with the
    BLEND of all views sharded over the mesh — parameters stay replicated,
    the attribute-gradient segment reduction and Adam update run replicated
    after the shard_map VJP."""
    cfg = raster_config(pipe)
    bg_key = jax.random.PRNGKey(background_seed)
    fixed_bg = (jnp.ones((3,), jnp.float32) if white_background
                else jnp.zeros((3,), jnp.float32))
    w_add = additional_depth_maps_weight

    def batched_loss(params, active, exposure, mean2d_res, batch: CameraBatch,
                     active_sh, depth_w, bgs, depth_flags):
        out = rasterize_batch_tile_sharded(
            params.xyz, activate_scales(params), params.quats,
            activate_opacity(params, meta), sh_coeffs(params), batch.camera,
            active_sh, bgs, mesh, axes, cfg,
            active_mask=active, mean2d_residual=mean2d_res,
            interpret=interpret)
        b = bgs.shape[0]
        exposure_rows = exposure[batch.image_index]          # [B, 3, 4]

        def view_loss(i):
            image = out["render"][i]
            if use_trained_exp:
                image = apply_exposure(image, exposure_rows[i])
            image = jnp.clip(image, 0.0, 1.0)
            gt = jax.tree.map(lambda x: x[i], batch)
            photo = losses.photometric(image * gt.alpha_mask, gt.gt_image,
                                       opt.lambda_dssim)
            pure = losses.depth_l1(out["depth"][i], gt.mono_invdepth,
                                   gt.depth_mask)
            photo = photo + jnp.where(gt.depth_reliable, depth_w * pure, 0.0)
            hinge = losses.depth_hinge(out["depth"][i], gt.mono_invdepth)
            donly = depth_w * (w_add * hinge + (1.0 - w_add) * pure)
            donly = jnp.where(gt.depth_reliable, donly, 0.0)
            return jnp.where(depth_flags[i], donly, photo)

        lv = jnp.stack([view_loss(i) for i in range(b)])
        return jnp.mean(lv), (out["visibility"], out["radii"],
                              out["tile_overflow"], out["dup_overflow"])

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

        (loss, (vis, radii, tile_of, dup_of)), grads = jax.value_and_grad(
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
        aux = {"loss": loss, "n_visible": jnp.sum(visible_any),
               "tile_overflow": tile_of, "dup_overflow": dup_of}
        if cfg.grad_reduce == "counts" and cfg.exact_extra:
            # Corrupted-gradient guard — same contract as the serial step
            # (train/step.py): counts-mode segment boundaries are only
            # sound at tile_overflow == 0, so an overflowing step reverts
            # its whole update (the step counter still advances).
            ok = tile_of == 0
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                new_state, state._replace(step=it))
            aux["update_skipped"] = jnp.where(ok, 0, 1).astype(jnp.int32)
        return new_state, aux

    def replicate_all(tree):
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    return step_fn, replicate_all
