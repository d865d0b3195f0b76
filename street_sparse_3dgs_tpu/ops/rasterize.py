"""Public differentiable rasterization API.

The TPU-native analogue of the reference's ``GaussianRasterizer.__call__``
contract (``gaussian_renderer/__init__.py:105-113``):

    rasterize(means3D, scales, rotations, opacities, shs, camera, ...) ->
        {render [3,H,W], depth [1,H,W], alpha [H,W], radii [N],
         visibility [N], overflow stats}

Differences by design (TPU-first):
- fully functional — no settings object mutation, everything jit-traceable;
- ``mean2d_residual`` replaces torch's `retain_grad` screenspace trick
  (``gaussian_renderer/__init__.py:29-33``): pass zeros [N,2] and take
  ``jax.grad`` w.r.t. it to obtain the screen-space position gradients the
  densification heuristic needs;
- static-shaped binning with explicit overflow counters instead of dynamic
  per-tile lists.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.camera import CameraParams
from .binning import bin_gaussians, num_tiles
from .blend import blend_tiles
from .oracle import render_oracle
from .preprocess import project_gaussians


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer tuning knobs (hashable → usable as a jit static arg)."""

    method: str = "tiled"        # "tiled" (production) | "oracle" (dense check)
    max_dup: int = 64            # per-Gaussian tile-coverage cap
    tile_capacity: int = 512     # per-tile Gaussian cap (K)
    tiles_chunk: int = 16        # tiles blended per scan step (memory knob)
    # "bf16": EXPERIMENTAL — pallas-path blend attributes (and their
    # backward per-slot grads) packed bfloat16 with f32 blend accumulators.
    # Measured NOT faster on v5e (the TPU sort does not reward narrower
    # payloads) and it quantizes ABSOLUTE pixel coordinates: bf16 spacing
    # is 2 px for coords in [256,512), so splat centers shift O(1) px at
    # ≥512-wide resolutions (fine ≤256).  Kept only as a documented
    # negative result; default f32 is both faster and exact.
    attr_dtype: str = "f32"      # "f32" | "bf16" (pallas method only)
    # Visible compaction: bin only the nearest ``vis_capacity`` in-frustum
    # gaussians (None = all N).  At street scale (millions of rows, most
    # culled per view) this shrinks the binning scan grid and keeps the
    # single-operand packed pair sort in range; visible rows beyond the
    # cap — the farthest — are dropped and counted (``vis_overflow``).
    vis_capacity: int | None = None
    # Cotangent payload width through the backward segment-reduction sort
    # (pallas method): "f32" exact (default) or "bf16" — channel pairs
    # packed two-per-uint32, 11 -> 6 sort operands (see
    # pallas_blend._gather_pack).  Street-scale training knob.
    grad_sort: str = "f32"       # "f32" | "bf16"
    # Tiles per Pallas kernel program (0 = auto: 8 at >= 2048 tiles).
    # Amortizes per-program overhead at street-scale tile counts.
    tile_batch: int = 0
    # Exact (virtual-tile) mode, pallas method only: budget of EXTRA
    # K-wide windows so tiles with more than tile_capacity binned pairs
    # keep all of them (no per-tile truncation — the reference rasterizer
    # has no per-tile cap; round-4 K-ladder showed truncation is visibly
    # lossy at street scale).  0 = off.  Pairs beyond the budget are still
    # counted in tile_overflow.  Size it to the scene: the view needs
    # sum(ceil(per-tile count / K)) − T extras; every UNUSED budget window
    # is K dead slot-rows riding all downstream sorts/gathers.
    exact_extra: int = 0
    # Backward segment-reduction scheme (pallas + exact mode): "sort"
    # (query-row merge sort, always sound) or "counts" — segment
    # boundaries from per-rank emitted-pair counts, dropping the N query
    # rows and the re-key sort (faster at street scale).  "counts" is
    # only sound while tile_overflow == 0 (monitor the counter; drops
    # would shift every later rank's gradient segment).
    grad_reduce: str = "sort"
    # Pair-emission shape knobs (advanced): rect positions scanned per
    # gaussian = max_dup × dup_overscan (0 = module default 4); dup_tails
    # overrides the tail-bucket ladder ((budget, width), ...) — a LARGE
    # first bucket permits a narrow max_dup (smaller pair-emission sort)
    # without dropping big gaussians' tiles.
    dup_overscan: int = 0
    dup_tails: tuple = ()


def rasterize(
    means3d: jnp.ndarray,        # [N, 3]
    scales: jnp.ndarray,         # [N, 3] activated
    quats: jnp.ndarray,          # [N, 4]
    opacities: jnp.ndarray,      # [N] activated
    sh_coeffs: jnp.ndarray,      # [N, K, 3]
    camera: CameraParams,
    sh_degree: int,
    bg: jnp.ndarray,             # [3]
    config: RasterConfig = RasterConfig(),
    scale_modifier: float = 1.0,
    active_mask: jnp.ndarray | None = None,
    mean2d_residual: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
):
    proj = project_gaussians(means3d, scales, quats, opacities, sh_coeffs,
                             camera, sh_degree, scale_modifier, active_mask)
    if colors_precomp is not None:
        proj = proj._replace(color=colors_precomp)
    if mean2d_residual is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_residual)

    h, w = camera.height, camera.width
    out = {"radii": proj.radius, "visibility": proj.valid}

    if config.method == "oracle":
        image, invdepth, alpha = render_oracle(
            proj, h, w, bg, tile_grid=num_tiles(h, w))
        out["dup_overflow"] = jnp.int32(0)
        out["tile_overflow"] = jnp.int32(0)
        out["vis_overflow"] = jnp.int32(0)
    elif config.method == "tiled":
        # The gather tables index original rows (depth order is baked into
        # each tile's slot order), so no [N]-permutation happens here — the
        # backward stays free of permutation scatters.
        bins = bin_gaussians(proj, h, w, config.max_dup, config.tile_capacity,
                             vis_capacity=config.vis_capacity)
        image, invdepth, alpha = blend_tiles(
            bins, proj.mean2d, proj.conic, proj.color,
            proj.opacity, proj.inv_depth, h, w, bg,
            tiles_chunk=config.tiles_chunk)
        out["dup_overflow"] = bins.dup_overflow
        out["tile_overflow"] = bins.tile_overflow
        out["vis_overflow"] = bins.vis_overflow
    elif config.method == "pallas":
        from .pallas_blend import blend_tiles_pallas

        if config.grad_reduce == "counts" and not config.exact_extra:
            raise ValueError("grad_reduce='counts' requires exact mode "
                             "(exact_extra > 0)")
        kw = dict(vis_capacity=config.vis_capacity,
                  exact_extra=config.exact_extra,
                  with_seg_pos=config.grad_reduce == "counts",
                  dup_overscan=config.dup_overscan)
        if config.dup_tails:
            kw["dup_tails"] = config.dup_tails
        bins = bin_gaussians(proj, h, w, config.max_dup,
                             config.tile_capacity, **kw)
        image, invdepth, alpha = blend_tiles_pallas(
            bins, proj.mean2d, proj.conic, proj.color,
            proj.opacity, proj.inv_depth, h, w, bg, grad_sort=config.grad_sort,
            tile_batch=config.tile_batch,
            attr_dtype=jnp.bfloat16 if config.attr_dtype == "bf16"
            else jnp.float32)
        out["dup_overflow"] = bins.dup_overflow
        out["tile_overflow"] = bins.tile_overflow
        out["vis_overflow"] = bins.vis_overflow
    else:
        raise ValueError(f"unknown raster method {config.method!r}")

    out["render"] = image
    out["depth"] = invdepth
    out["alpha"] = alpha
    return out
