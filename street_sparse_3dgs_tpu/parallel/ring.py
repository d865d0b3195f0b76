"""Ring-staged rendering: Gaussians AND tiles sharded over the mesh.

SURVEY §5.7's answer to chunks whose primitives exceed per-chip HBM
(reference analogue: the CUDA rasterizer assumes one GPU owns every
Gaussian — ``submodules/hierarchy-rasterizer`` has no multi-GPU path, the
fork scales by splitting chunks).  Here one *image* is rendered
cooperatively: each chip owns a 1/n block of the Gaussians and a 1/n slab
of the image tiles, and Gaussian blocks ride the ICI ring (``ppermute``)
past every tile shard.

Depth-correct compositing without materializing a global sort:

  Pass A (light, non-differentiable): the (mean2d, radius, depth, base)
  geometry struct circulates; at each stage a chip expands the visiting
  block's tile rectangles, keeps the pairs that land in ITS tile slab
  (static per-stage capacity, overflow counted — never silently dropped),
  and banks (tile, depth, global-row) triples.  After n stages the banked
  pairs are sorted lexicographically by (tile, depth, row) — exactly the
  order the single-device path realizes via its stable depth argsort — and
  cut into per-tile gather tables of global row ids.

  Pass B (heavy, differentiable): the packed 16-channel attribute rows
  circulate; at each stage a chip copies the visiting block's rows into the
  table slots that reference them.  Gradients flow back through the same
  ring (ppermute's VJP is the reverse permute) into each owner's projection.

The blend itself is the same fused Pallas kernel as the tile-sharded path
(per-slab ``tile0`` origin).  Parity: images and grads match the
single-device rasterizer bit-for-tolerance on the virtual mesh
(``tests/test_parallel.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.camera import CameraParams
from ..ops.binning import TILE, num_tiles, tile_rect
from ..ops.pallas_blend import (_blend_packed, _interpret_default,
                                N_CH, OA, OB, OI, OR)
from ..ops.preprocess import project_gaussians
from ..ops.rasterize import RasterConfig


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def rasterize_ring_staged(
    means3d: jnp.ndarray,          # [N, 3] sharded over mesh axis 0
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    camera: CameraParams,
    sh_degree: int,
    bg: jnp.ndarray,
    mesh: Mesh,
    config: RasterConfig = RasterConfig(),
    active_mask: jnp.ndarray | None = None,
    stage_pair_capacity: int | None = None,
    axis: str = "tile",
    interpret: bool | None = None,
    mean2d_residual: jnp.ndarray | None = None,
):
    """Differentiable render with Gaussians sharded over ``mesh[axis]``.

    ``N`` must divide evenly by the mesh axis size (pad with inactive rows).
    ``stage_pair_capacity`` bounds how many (tile, gaussian) pairs one chip
    banks from one visiting block (default: the lossless ``blk·max_dup``;
    shrink it to trade HBM for counted overflow).  Returns the same dict as
    ``ops.rasterize.rasterize`` plus ``pair_overflow`` (and, for training,
    per-Gaussian ``radii``/``visibility``, sharded like the inputs).
    ``mean2d_residual`` [N, 2] is the screen-grad densify-stats hook (the
    ``retain_grad`` trick), sharded like the Gaussians."""
    if config.exact_extra:
        # Exact (virtual-tile) windows are deliberately NOT implemented on
        # the ring: its per-chip memory bound is the banked pair table
        # (n_dev · stage_pair_capacity rows), not the [t_local, K] blend
        # input — with tiles already sharded n_dev-ways, t_local is small
        # enough that raising tile_capacity directly (K = 1024+ per chip
        # costs what K = 128 costs single-device) is the honest capacity
        # lever, and the ring's per-stage banking would need a second
        # dynamic allocation pass to place windows.  Fail loudly instead
        # of silently truncating at a K the caller believes is uncapped
        # (advisor r4 note).
        raise ValueError(
            "rasterize_ring_staged does not support exact_extra; raise "
            "tile_capacity (per-chip tiles are 1/n of the image) or use "
            "the tile-sharded exact path for models that fit per-chip HBM")
    n_dev = mesh.shape[axis]
    n = means3d.shape[0]
    if n % n_dev:
        raise ValueError(f"N={n} not divisible by mesh axis {n_dev}")
    blk = n // n_dev
    h, w = camera.height, camera.width
    tiles_x, tiles_y = num_tiles(h, w)
    t_total = tiles_x * tiles_y
    pad_t = (-t_total) % n_dev
    t_local = (t_total + pad_t) // n_dev
    max_dup = config.max_dup
    k_cap = config.tile_capacity
    p_stage = stage_pair_capacity or blk * max_dup
    perm = _ring_perm(n_dev)
    interp = _interpret_default() if interpret is None else interpret

    def local_render(xyz, sc, qu, op, sh, act, res2d, bg_rep):
        d = jax.lax.axis_index(axis)
        t0 = (d * t_local).astype(jnp.int32)
        proj = project_gaussians(xyz, sc, qu, op, sh, camera, sh_degree,
                                 1.0, act)
        proj = proj._replace(mean2d=proj.mean2d + res2d)
        base = (d * blk).astype(jnp.int32)

        # ---- Pass A: circulate light geometry, bank my tiles' pairs ----
        sentinel_tile = jnp.int32(t_local)       # local ids in [0, t_local)
        slots = jnp.arange(max_dup, dtype=jnp.int32)

        def bank_pairs(struct):
            mean2d, radius, depth, valid, vbase = struct
            x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y)
            nx = jnp.where(valid, x1 - x0, 0)
            ny = jnp.where(valid, y1 - y0, 0)
            cov = nx * ny
            nxs = jnp.maximum(nx, 1)
            sy = slots[None, :] // nxs[:, None]
            sx = slots[None, :] % nxs[:, None]
            tile = (y0[:, None] + sy) * tiles_x + (x0[:, None] + sx)
            in_range = slots[None, :] < jnp.minimum(cov, max_dup)[:, None]
            dup_ovf = jnp.sum(jnp.maximum(cov - max_dup, 0))
            loc = tile - t0
            mine = in_range & (loc >= 0) & (loc < t_local)
            ltile = jnp.where(mine, loc, sentinel_tile).astype(
                jnp.int32).ravel()
            pdep = jnp.broadcast_to(depth[:, None],
                                    (blk, max_dup)).ravel()
            pdep = jnp.where(mine.ravel(), pdep, jnp.inf)
            pref = (vbase + jnp.arange(blk, dtype=jnp.int32))[:, None]
            pref = jnp.broadcast_to(pref, (blk, max_dup)).ravel()
            # Compact kept pairs to the front (deterministic tiebreak).
            keep = (~mine.ravel()).astype(jnp.int32)
            _, _, ctile, cdep, cref = jax.lax.sort(
                (keep, jnp.arange(blk * max_dup, dtype=jnp.int32),
                 ltile, pdep, pref), num_keys=2, is_stable=False)
            kept = jnp.sum(mine)
            pair_ovf = jnp.maximum(kept - p_stage, 0)
            return (ctile[:p_stage], cdep[:p_stage], cref[:p_stage],
                    dup_ovf, pair_ovf)

        struct0 = (proj.mean2d, proj.radius,
                   jnp.where(proj.valid, proj.depth, jnp.inf),
                   proj.valid, base)

        def stage_a(struct, _):
            ctile, cdep, cref, dovf, povf = bank_pairs(struct)
            nxt = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), struct)
            return nxt, (ctile, cdep, cref, dovf, povf)

        _, (a_tile, a_dep, a_ref, a_dovf, a_povf) = jax.lax.scan(
            stage_a, struct0, None, length=n_dev)
        pairs_tile = a_tile.reshape(-1)          # [n_dev * p_stage]
        pairs_dep = a_dep.reshape(-1)
        pairs_ref = a_ref.reshape(-1)

        # (tile, depth, row) — the single-device blend order.
        s_tile, _, s_ref = jax.lax.sort(
            (pairs_tile, pairs_dep, pairs_ref), num_keys=3,
            is_stable=False)
        bounds = jnp.searchsorted(
            s_tile, jnp.arange(t_local + 1, dtype=jnp.int32))
        starts = bounds[:-1]
        counts = bounds[1:] - starts
        tile_ovf = jnp.sum(jnp.maximum(counts - k_cap, 0))
        padded = jnp.concatenate(
            [s_ref, jnp.zeros((k_cap,), s_ref.dtype)])
        table = jax.vmap(
            lambda s: jax.lax.dynamic_slice(padded, (s,), (k_cap,)))(starts)
        kk = jnp.arange(k_cap, dtype=jnp.int32)
        tmask = kk[None, :] < jnp.minimum(counts, k_cap)[:, None]
        table = jnp.where(tmask, table, -1)      # -1 never matches a block

        # ---- Pass B: circulate packed attributes, fill the tables ----
        attrs_blk = jnp.concatenate([
            proj.mean2d, proj.conic, proj.color, proj.opacity[:, None],
            proj.inv_depth[:, None]], axis=1)        # [blk, N_CH]

        table_nd = jax.lax.stop_gradient(table)

        def stage_b(carry, _):
            attrs_v, vbase, acc = carry
            local = table_nd - vbase
            sel = (local >= 0) & (local < blk) & tmask
            rows = attrs_v[jnp.clip(local, 0, blk - 1)]   # [T_l, K, 10]
            rows = jnp.swapaxes(rows, 1, 2)               # [T_l, 10, K]
            acc = jnp.where(sel[:, None, :], rows, acc)
            attrs_v = jax.lax.ppermute(attrs_v, axis, perm)
            vbase = jax.lax.ppermute(vbase, axis, perm)
            return (attrs_v, vbase, acc), None

        acc0 = jnp.zeros((t_local, N_CH, k_cap), attrs_blk.dtype)
        (_, _, attrs_t), _ = jax.lax.scan(
            stage_b, (attrs_blk, base, acc0), None, length=n_dev)
        # Slot validity is k < count in the kernel (tmask ≡ that rule);
        # no mask plane to set.

        out = _blend_packed(interp, tiles_x, 0, 1, t0.reshape(1, 1),
                            counts.astype(jnp.int32)[None, :], attrs_t,
                            bg_rep)

        dup_ovf = jax.lax.psum(jnp.sum(a_dovf), axis) // n_dev
        pair_ovf = jax.lax.psum(jnp.sum(a_povf), axis)
        tile_ovf = jax.lax.psum(tile_ovf, axis)
        return (out, dup_ovf[None], pair_ovf[None], tile_ovf[None],
                jax.lax.stop_gradient(proj.radius),
                jax.lax.stop_gradient(proj.valid))

    specs = P(axis)
    out, dup_ovf, pair_ovf, tile_ovf, radii, valid = shard_map(
        local_render, mesh=mesh,
        in_specs=(specs, specs, specs, specs, specs, specs, specs, P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )(means3d, scales, quats, opacities, sh_coeffs,
      jnp.ones(n, bool) if active_mask is None else active_mask,
      jnp.zeros((n, 2), means3d.dtype) if mean2d_residual is None
      else mean2d_residual,
      bg[None, :])

    def to_image(flat, channels):
        img = flat[:t_total].reshape(tiles_y, tiles_x, channels, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(channels,
                                                   tiles_y * TILE,
                                                   tiles_x * TILE)
        return img[:, :h, :w]

    image = to_image(out[:, OR:OB + 1, :], 3)
    invdepth = to_image(out[:, OI:OI + 1, :], 1)
    alpha_img = to_image(out[:, OA:OA + 1, :], 1)[0]
    return {"render": image, "depth": invdepth, "alpha": alpha_img,
            "radii": radii, "visibility": valid,
            "dup_overflow": dup_ovf[0],
            "pair_overflow": pair_ovf[0],
            "tile_overflow": tile_ovf[0]}


def make_ring_train_step(
    meta,
    opt,
    pipe,
    spatial_lr_scale: float,
    mesh: Mesh,
    axis: str = "tile",
    *,
    use_trained_exp: bool = True,
    optimize_xyz: bool = True,
    zero_scaling_grads_for_skybox: bool = False,
    additional_depth_maps_weight: float = 0.9,
    random_background: bool = True,
    white_background: bool = False,
    background_seed: int = 17,
    stage_pair_capacity: int | None = None,
    interpret: bool | None = None,
):
    """Model-parallel TRAINING step: Gaussian rows (params, Adam moments,
    densify stats) sharded over ``mesh[axis]``, one view per step rendered
    by the ring (VERDICT round-2 #4's HBM-exceeding-chunk case: no chip
    ever holds the full model).

    The render runs under ``shard_map`` (ring VJP routes each block's
    cotangents back to its owner); everything around it — loss, exposure,
    sparse Adam, stat accumulation — is ordinary elementwise jit that XLA
    partitions along the already-sharded row axis, so the update never
    gathers the model.  Returns ``(step_fn, shard_state)``;
    ``shard_state`` places a replicated/fresh TrainState onto the mesh
    (rows over ``axis``, exposure and scalars replicated)."""
    import functools

    from jax.sharding import NamedSharding

    from ..core.schedules import expon_lr
    from ..models import adam
    from ..models.gaussians import (GaussianParams, activate_opacity,
                                    activate_scales, apply_exposure,
                                    sh_coeffs)
    from ..train import losses
    from ..train.step import TrainState, raster_config

    cfg = raster_config(pipe)
    bg_key = jax.random.PRNGKey(background_seed)
    fixed_bg = (jnp.ones((3,), jnp.float32) if white_background
                else jnp.zeros((3,), jnp.float32))
    w_add = additional_depth_maps_weight

    def loss_fn(params, active, exposure, mean2d_res, batch, active_sh,
                depth_w, bg, depth_flag):
        out = rasterize_ring_staged(
            params.xyz, activate_scales(params), params.quats,
            activate_opacity(params, meta), sh_coeffs(params), batch.camera,
            active_sh, bg, mesh, cfg, active_mask=active,
            stage_pair_capacity=stage_pair_capacity, axis=axis,
            interpret=interpret, mean2d_residual=mean2d_res)
        image = out["render"]
        if use_trained_exp:
            image = apply_exposure(image, exposure[batch.image_index])
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

    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def step_fn(state: TrainState, batch, active_sh: int = None,
                depth_flag: jnp.ndarray | None = None):
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
                           opt.depth_l1_weight_final,
                           max_steps=opt.iterations)
        capacity = state.params.xyz.shape[0]
        mean2d_res = jnp.zeros((capacity, 2), jnp.float32)
        if depth_flag is None:
            depth_flag = jnp.asarray(False)
        if random_background:
            bg = jax.random.uniform(jax.random.fold_in(bg_key, it), (3,))
        else:
            bg = fixed_bg

        (loss, (vis, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 2, 3), has_aux=True)(
                state.params, state.active, state.exposure, mean2d_res,
                batch, active_sh_, depth_w, bg, depth_flag)
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
        lrs = adam.ParamLrs.from_config(xyz_lr, opt.feature_lr,
                                        opt.opacity_lr, opt.scaling_lr,
                                        opt.rotation_lr)
        new_params, new_adam = adam.step(state.params, g_params,
                                         state.adam_state, lrs, relevant)

        if use_trained_exp:
            new_exposure, new_exp_adam = adam.dense_step(
                state.exposure, g_exposure, state.exposure_adam, exp_lr)
        else:
            new_exposure, new_exp_adam = state.exposure, state.exposure_adam

        visible = vis & state.active
        norm = jnp.linalg.norm(g_screen[..., :2], axis=-1)
        grad_accum = jnp.where(visible,
                               jnp.maximum(state.grad_accum, norm),
                               state.grad_accum)
        denom = state.denom + visible.astype(jnp.float32)
        max_radii2d = jnp.where(visible,
                                jnp.maximum(state.max_radii2d, radii),
                                state.max_radii2d)

        new_state = state._replace(
            params=new_params, adam_state=new_adam, exposure=new_exposure,
            exposure_adam=new_exp_adam, grad_accum=grad_accum, denom=denom,
            max_radii2d=max_radii2d, step=it)
        return new_state, {"loss": loss, "n_visible": jnp.sum(visible)}

    def shard_state(state: TrainState) -> TrainState:
        row = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())

        def place(x, sharded):
            sharded = sharded and jnp.ndim(x) >= 1
            return jax.device_put(x, row if sharded else rep)

        return TrainState(
            params=jax.tree.map(lambda x: place(x, True), state.params),
            active=place(state.active, True),
            adam_state=jax.tree.map(lambda x: place(x, True),
                                    state.adam_state),
            exposure=place(state.exposure, False),
            exposure_adam=jax.tree.map(lambda x: place(x, False),
                                       state.exposure_adam),
            grad_accum=place(state.grad_accum, True),
            denom=place(state.denom, True),
            max_radii2d=place(state.max_radii2d, True),
            step=place(state.step, False))

    return step_fn, shard_state
