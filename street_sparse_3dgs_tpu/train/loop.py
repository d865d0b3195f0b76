"""Host-side training loop engine (the train_single/train_coarse skeleton).

Drives the jitted step (``train/step.py``) over a camera stream and applies
the reference's cadenced side effects (``train_single.py:186-241``):

  - densify+prune every ``densification_interval`` iters within
    [densify_from_iter, densify_until_iter);
  - opacity reset every ``opacity_reset_interval``;
  - big-Gaussian scale clamp each iteration (×0.8 when max scale exceeds
    ``clamp_fraction · cameras_extent``);
  - capacity growth: when densification overflows the padded capacity the
    arrays are grown ×2 on the host (one re-jit), never silently dropped.

The loop is deliberately dumb Python — all math lives in compiled functions.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, OptimizationConfig, PipelineConfig
from ..models import adam, densify
from ..models.gaussians import GaussianMeta, GaussianParams
from .step import CameraBatch, TrainState, make_train_step


@functools.partial(jax.jit, static_argnames=("meta", "grad_threshold",
                                             "min_opacity", "percent_dense"))
def _densify_jit(key, state: TrainState, meta: GaussianMeta,
                 grad_threshold: float, min_opacity: float,
                 extent, percent_dense: float, extra_prune=None):
    dstate = densify.DensifyState(state.grad_accum, state.denom,
                                  state.max_radii2d)
    res = densify.densify_and_prune(
        key, state.params, state.active, state.adam_state, dstate, meta,
        grad_threshold, min_opacity, extent, percent_dense,
        extra_prune=extra_prune)
    new_state = state._replace(
        params=res.params, active=res.active, adam_state=res.adam_state,
        grad_accum=res.densify_state.grad_accum,
        denom=res.densify_state.denom,
        max_radii2d=res.densify_state.max_radii2d)
    return new_state, res.n_active, res.overflow


@functools.partial(jax.jit, static_argnames=("meta",))
def _reset_opacity_jit(state: TrainState, meta: GaussianMeta):
    return state._replace(params=densify.reset_opacity(state.params, meta))


def grow_capacity(state: TrainState, meta: GaussianMeta,
                  new_capacity: int) -> tuple[TrainState, GaussianMeta]:
    """Pad all capacity-indexed arrays with inactive rows (host-side; causes
    one re-jit of the step at the new shape)."""
    old = meta.capacity
    pad = new_capacity - old
    if pad <= 0:
        return state, meta

    def pad_rows(a, fill=0.0):
        if a.ndim == 0 or a.shape[0] != old:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    def pad_params(p: GaussianParams) -> GaussianParams:
        out = GaussianParams(*(pad_rows(leaf) for leaf in p))
        return out._replace(
            quats=out.quats.at[old:, 0].set(1.0),
            log_scales=out.log_scales.at[old:].set(-10.0),
            opacity_raw=out.opacity_raw.at[old:].set(-10.0))

    new_state = state._replace(
        params=pad_params(state.params),
        active=pad_rows(state.active, False),
        adam_state=adam.AdamState(
            mu=GaussianParams(*(pad_rows(x) for x in state.adam_state.mu)),
            nu=GaussianParams(*(pad_rows(x) for x in state.adam_state.nu)),
            step=state.adam_state.step),
        grad_accum=pad_rows(state.grad_accum),
        denom=pad_rows(state.denom),
        max_radii2d=pad_rows(state.max_radii2d))
    new_meta = dataclasses.replace(meta, capacity=new_capacity)
    return new_state, new_meta


def autosize_pipeline(pipe: PipelineConfig, state: TrainState,
                      meta: GaussianMeta, batches,
                      max_views: int = 8) -> PipelineConfig:
    """Resolve ``exact_extra == -1`` (self-sizing) into measured knobs:
    sample up to ``max_views`` cameras from the (re-iterable) batch stream,
    derive the emission ladder + window budget from binning statistics
    (``ops/autosize.py``), and return the concrete PipelineConfig."""
    import itertools

    from ..models.gaussians import activate_opacity, activate_scales, \
        sh_coeffs
    from ..ops.autosize import autosize_raster

    sample = list(itertools.islice(iter(batches), max_views))
    if not sample:
        raise ValueError("autosize: empty batch stream")
    cams = [b.camera for b in sample]
    # Scan-window escalation bound: the [capacity, S] emission arrays must
    # stay well under HBM (~1 GB per array at 2^28 elements).
    cap_max = int(min(256, max(32, (1 << 28) // meta.capacity)))
    knobs = autosize_raster(
        state.params.xyz, activate_scales(state.params), state.params.quats,
        activate_opacity(state.params, meta), sh_coeffs(state.params), cams,
        meta.sh_degree, cams[0].height, cams[0].width, pipe.tile_capacity,
        max_dup=0, active_mask=state.active, scan_cap_max=cap_max)
    print(f"  autosized exact mode: max_dup={knobs.max_dup} "
          f"overscan={knobs.dup_overscan} tails={knobs.dup_tails} "
          f"exact_extra={knobs.exact_extra} "
          f"(measured extras={knobs.expected_extras}, "
          f"dup_of={knobs.expected_dup_overflow})")
    return dataclasses.replace(
        pipe, max_dup=knobs.max_dup, dup_overscan=knobs.dup_overscan,
        dup_tails=knobs.dup_tails, exact_extra=knobs.exact_extra)


@dataclasses.dataclass
class LoopHooks:
    """Optional host callbacks (progress, checkpointing, network GUI)."""

    on_step: Callable | None = None          # (it, state, aux) -> None
    on_densify: Callable | None = None       # (it, n_active) -> None
    checkpoint_iterations: tuple = ()
    on_checkpoint: Callable | None = None    # (it, state, meta) -> None
    # Live viewer: a ViewerHook (viewer/hook.py), polled at the top of every
    # iteration with the current state like the reference
    # (``train_single.py:80-97``).
    viewer_poll: Callable | None = None      # (state, meta, done, bg) -> bool


def train_loop(
    state: TrainState,
    meta: GaussianMeta,
    batches: Iterable[CameraBatch],
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    model_cfg: ModelConfig,
    cameras_extent: float,
    spatial_lr_scale: float,
    *,
    iterations: int | None = None,
    densify_enabled: bool = True,
    clamp_fraction: float = 0.02,
    coarse_mode: bool = False,
    rng_seed: int = 0,
    hooks: LoopHooks = LoopHooks(),
    gt_index=None,
) -> tuple[TrainState, GaussianMeta, dict]:
    """Run the optimization loop.  ``batches`` yields CameraBatch objects
    (shuffled camera stream, like the reference's DataLoader over the
    CameraDataset); the loop stops after ``iterations`` steps."""
    iterations = iterations or opt.iterations
    key = jax.random.PRNGKey(rng_seed)

    from ..utils import EmaMeter

    auto_mode = pipe.raster_method == "pallas" and pipe.exact_extra == -1
    if auto_mode:
        # Self-sizing exact mode (VERDICT r4 item 2): derive the emission
        # ladder and window budget from binning statistics over sample
        # views — zero hand-set exact knobs, like the reference's
        # dynamically-sized rasterizer.  Drift past the margin during
        # training is caught by the overflow check below and by the
        # re-autosize at capacity growths.
        pipe = autosize_pipeline(pipe, state, meta, batches)

    ema = EmaMeter()
    progress_every = max(1, min(500, iterations // 10))
    # Exact-mode overflow check cadence: sync the on-device overflow
    # accumulator often enough that budget drift is caught within ~100
    # steps (the in-step corrupted-gradient guard makes the window safe —
    # overflowing steps revert their update rather than train on shifted
    # gradient segments).
    exact_on = pipe.raster_method == "pallas" and pipe.exact_extra > 0
    check_every = min(100, progress_every) if exact_on else progress_every
    tile_seen = 0

    fold_clamp = not model_cfg.skip_scale_big_gauss
    clamp_frac = 0.1 if coarse_mode else clamp_fraction

    def build_photo_step(meta_):
        return make_train_step(
            meta_, opt, pipe, spatial_lr_scale,
            is_depth_only=False, use_trained_exp=not coarse_mode,
            optimize_xyz=not coarse_mode,
            zero_scaling_grads_for_skybox=coarse_mode,
            additional_depth_maps_weight=(
                model_cfg.additional_depth_maps_weight),
            clamp_extent=float(cameras_extent) if fold_clamp else None,
            clamp_fraction=clamp_frac,
            random_background=True,
            white_background=model_cfg.white_background,
            background_seed=rng_seed + 17)

    step_photo = build_photo_step(meta)
    step_depth = None  # built lazily on the first depth-only batch

    stats = {"losses": [], "n_active": [], "overflows": 0,
             "exact_growths": 0, "skipped_updates": 0}
    pending_losses: list = []  # unsynced device scalars, drained periodically

    def drain_losses():
        if pending_losses:
            stats["losses"].extend(
                np.asarray(jnp.stack(pending_losses)).tolist())
            pending_losses.clear()

    dup_acc = jnp.int32(0)
    tile_acc = jnp.int32(0)
    skip_acc = jnp.int32(0)
    it = 0
    last_bg = None
    batch_iter = iter(batches)
    while it < iterations:
        try:
            batch = next(batch_iter)
        except StopIteration:
            batch_iter = iter(batches)
            batch = next(batch_iter)
        it += 1

        if hooks.viewer_poll is not None:
            hooks.viewer_poll(state, meta, it >= iterations, last_bg)

        is_depth_only = bool(getattr(batch, "is_depth_only", False))
        if is_depth_only:
            if step_depth is None:
                step_depth = make_train_step(
                    meta, opt, pipe, spatial_lr_scale, is_depth_only=True,
                    additional_depth_maps_weight=(
                        model_cfg.additional_depth_maps_weight),
                    clamp_extent=float(cameras_extent) if fold_clamp
                    else None, clamp_fraction=clamp_frac,
                    random_background=True,
                    white_background=model_cfg.white_background,
                    background_seed=rng_seed + 17)
            state, aux = step_depth(state, batch)
        else:
            state, aux = step_photo(state, batch)

        last_bg = aux.get("bg")
        if hooks.on_step is not None:
            hooks.on_step(it, state, aux)
        # Device scalars are kept unsynced; only the periodic progress line
        # forces a host round-trip (the per-step float() sync costs more
        # than the math at small resolutions).  Losses are drained to host
        # floats at progress cadence so at most ``progress_every`` device
        # buffers are ever live (30k+ at reference iteration counts
        # otherwise).  Overflow counters accumulate ON DEVICE every step so
        # transient overflows between progress lines are never lost ("never
        # silently drop work").
        pending_losses.append(aux["loss"])
        dup_acc = dup_acc + aux.get("dup_overflow", 0)
        tile_acc = tile_acc + aux.get("tile_overflow", 0)
        skip_acc = skip_acc + aux.get("update_skipped", 0)
        if exact_on and it % check_every == 0:
            tile_now = int(tile_acc)
            if tile_now > tile_seen:
                # Window-budget overflow: GROW exact_extra (host re-jit,
                # same pattern as densify capacity growth) so later steps
                # regain exactness; any steps that overflowed in counts
                # mode already reverted their update in-step.
                delta = tile_now - tile_seen
                tile_seen = tile_now
                grown = max(pipe.exact_extra * 2,
                            pipe.exact_extra
                            + -(-delta // pipe.tile_capacity))
                grown = -(-grown // 128) * 128
                print(f"  exact window budget overflow (+{delta} pair "
                      f"slots): growing exact_extra "
                      f"{pipe.exact_extra} -> {grown} (re-jit)")
                pipe = dataclasses.replace(pipe, exact_extra=grown)
                stats["exact_growths"] += 1
                step_photo = build_photo_step(meta)
                step_depth = None
        if it % progress_every == 0:
            drain_losses()
            ema.update(stats["losses"][-1])
            print(f"  it {it}/{iterations} loss(ema) {ema.value:.5f} "
                  f"visible {int(aux['n_visible'])}")
            # No silent caps: surface binning overflow (raise max_dup /
            # tile_capacity in PipelineConfig when these fire).
            dup, tile = int(dup_acc), int(tile_acc)
            if dup or tile:
                print(f"  WARNING: binning overflow since start "
                      f"dup={dup} tile={tile} (rendered image is missing "
                      "contributions; raise max_dup/tile_capacity)")

        # --- densification cadence -----------------------------------------
        if (densify_enabled and it < opt.densify_until_iter
                and it > opt.densify_from_iter
                and it % opt.densification_interval == 0):
            key, sub = jax.random.split(key)
            extra_prune = None
            if gt_index is not None:
                from ..models.gt_constraint import too_far_mask

                extra_prune = too_far_mask(gt_index, state.params.xyz,
                                           state.active)
            state, n_active, overflow = _densify_jit(
                sub, state, meta, opt.densify_grad_threshold, 0.005,
                jnp.float32(cameras_extent), opt.percent_dense,
                extra_prune)
            if int(overflow) > 0:
                stats["overflows"] += 1
                state, meta = grow_capacity(
                    state, meta, max(meta.capacity * 2,
                                     meta.capacity + int(overflow)))
                if auto_mode:
                    # Densification changed the splat-size distribution
                    # (and the capacity bound on the scan window): refresh
                    # the measured emission/window knobs with the grown
                    # model before re-jitting.
                    pipe = autosize_pipeline(pipe, state, meta, batches)
                step_photo = build_photo_step(meta)
                step_depth = None
            stats["n_active"].append(int(n_active))
            if hooks.on_densify is not None:
                hooks.on_densify(it, int(n_active))

        # Opacity reset: at the interval, plus once at densify_from_iter on
        # white backgrounds (reference ``train_single.py:199``).
        if (densify_enabled and it < opt.densify_until_iter
                and (it % opt.opacity_reset_interval == 0
                     or (model_cfg.white_background
                         and it == opt.densify_from_iter))):
            state = _reset_opacity_jit(state, meta)
            # Reference also resets the sparse-Adam moments of opacity rows
            # implicitly via replace_tensor_to_optimizer (zeroed state).
            state = state._replace(adam_state=state.adam_state._replace(
                mu=state.adam_state.mu._replace(
                    opacity_raw=jnp.zeros_like(
                        state.adam_state.mu.opacity_raw)),
                nu=state.adam_state.nu._replace(
                    opacity_raw=jnp.zeros_like(
                        state.adam_state.nu.opacity_raw))))

        # (big-Gaussian clamp is fused into the step when fold_clamp.)

        if it in hooks.checkpoint_iterations:
            if hooks.on_checkpoint:
                hooks.on_checkpoint(it, state, meta)
            else:
                from ..models.serialize import save_checkpoint

                if model_cfg.model_path:
                    save_checkpoint(
                        Path(model_cfg.model_path) / f"chkpnt{it}.npz",
                        state, meta, it)

    drain_losses()
    stats["dup_overflow"] = int(dup_acc)
    stats["tile_overflow"] = int(tile_acc)
    stats["skipped_updates"] = int(skip_acc)
    stats["final_pipe"] = pipe
    if stats["dup_overflow"] or stats["tile_overflow"]:
        print(f"  WARNING: binning overflow over the run "
              f"dup={stats['dup_overflow']} tile={stats['tile_overflow']}")
    return state, meta, stats
