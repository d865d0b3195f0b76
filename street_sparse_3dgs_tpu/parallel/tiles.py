"""Tile-sharded rendering — the framebuffer's SP-analog (SURVEY.md §5.7).

One image's 16×16 tiles are sharded across the mesh's ``tile`` axis with
``shard_map``: every chip runs the fused Pallas blend over its contiguous
slab of tiles (the kernel receives the slab's first global tile id so pixel
origins stay correct), Gaussians stay replicated, and the per-shard attribute
gradients all-reduce back through the (automatic) VJP of the replicated
gather.  Tiles are embarrassingly parallel — there is no cross-shard
compositing, so no depth-ordered ring is needed until Gaussians themselves
are sharded (SURVEY.md §7.3 'order-dependent compositing across shards':
start tile-sharded with replicated Gaussians, ring-stage only when a chunk's
primitives exceed per-chip HBM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.camera import CameraParams
from ..ops.binning import TILE, bin_gaussians
from ..ops.pallas_blend import (_blend_packed, _interpret_default,
                                OA, OB, OI, OR)
from ..ops.preprocess import project_gaussians
from ..ops.rasterize import RasterConfig


def rasterize_tile_sharded(
    means3d: jnp.ndarray,
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
    mean2d_residual: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Differentiable render with tiles sharded over ``mesh``'s ``tile``
    axis.  Same outputs as ``ops.rasterize.rasterize``.  Projection and
    binning run replicated (they are O(N) and O(N·D log) respectively —
    cheap next to the blend); only the per-tile blend is sharded."""
    proj = project_gaussians(means3d, scales, quats, opacities, sh_coeffs,
                             camera, sh_degree, 1.0, active_mask)
    if mean2d_residual is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_residual)

    h, w = camera.height, camera.width
    if config.exact_extra:
        return _rasterize_tile_sharded_exact(proj, h, w, bg, mesh, config,
                                             interpret)
    bins = bin_gaussians(proj, h, w, config.max_dup, config.tile_capacity)
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    t_total = tiles_x * tiles_y
    k_cap = bins.gather.shape[1]

    n_shards = mesh.shape["tile"]
    pad_t = (-t_total) % n_shards
    g = jnp.concatenate(
        [bins.gather, jnp.zeros((pad_t, k_cap), bins.gather.dtype)], 0)
    counts = jnp.concatenate(
        [bins.counts.astype(jnp.int32),
         jnp.zeros((pad_t,), jnp.int32)])[None, :]       # [1, T_pad] (SMEM row)

    from ..ops.pallas_blend import pack_gather_attrs

    # Gather tables hold depth ranks — pack_gather_attrs permutes the rows.
    attrs = pack_gather_attrs(g, proj.mean2d, proj.conic,
                              proj.color, proj.opacity, proj.inv_depth,
                              order=bins.order,
                              rank=bins.rank)           # [T_pad, 10, K] (padded kernels)

    interp = _interpret_default() if interpret is None else interpret
    t_local = (t_total + pad_t) // n_shards

    def local_blend(attrs_shard, counts_shard, bg_rep):
        tile0 = (jax.lax.axis_index("tile") * t_local).astype(
            jnp.int32).reshape(1, 1)
        return _blend_packed(interp, tiles_x, 0, 1, tile0, counts_shard,
                             attrs_shard, bg_rep)

    out = shard_map(
        local_blend, mesh=mesh,
        in_specs=(P("tile"), P(None, "tile"), P()), out_specs=P("tile"),
        check_vma=False,
    )(attrs, counts, bg[None, :])                       # [T_pad, 8, 256]

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
            "radii": proj.radius, "visibility": proj.valid,
            "dup_overflow": bins.dup_overflow,
            "tile_overflow": bins.tile_overflow}


def _rasterize_tile_sharded_exact(proj, h, w, bg, mesh, config, interpret):
    """Exact (virtual-tile) rendering with the virtual-tile axis sharded
    over the mesh's ``tile`` axis.  Binning's shard-segmented window
    allocation (``exact_shards``) places shard boundaries at static
    virtual-tile offsets that never split a real tile's windows, so each
    device carries its blend state locally; the Pallas kernels run under
    ``shard_map`` inside ``_blend_exact``."""
    from ..ops.pallas_blend import _blend_exact, pack_gather_attrs

    n_shards = mesh.shape["tile"]
    extra = -(-config.exact_extra // n_shards) * n_shards
    bins = bin_gaussians(proj, h, w, config.max_dup, config.tile_capacity,
                         exact_extra=extra, exact_shards=n_shards,
                         with_seg_pos=config.grad_reduce == "counts")
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    t_total = tiles_x * tiles_y
    nv = bins.t_of_v.shape[0]
    l_v = nv // n_shards
    tb = next(d for d in (8, 4, 2, 1) if l_v % d == 0)

    attrs = pack_gather_attrs(
        bins.gather, proj.mean2d, proj.conic, proj.color, proj.opacity,
        proj.inv_depth, order=bins.order, rank=bins.rank,
        grad_sort=config.grad_sort, seg_pos=bins.seg_pos,
        pair_major=True)                                   # [T_v, K, 10]

    t_safe = jnp.minimum(bins.t_of_v, t_total - 1)
    is_last = ((bins.t_of_v >= t_total)
               | (jnp.arange(nv, dtype=jnp.int32)
                  == bins.last_v[t_safe])).astype(jnp.int32)
    meta = jnp.stack([t_safe, bins.wt, bins.vcounts, is_last])  # [4, T_v]

    interp = _interpret_default() if interpret is None else interpret
    out = _blend_exact(interp, tiles_x, tb, mesh, "tile", 0, meta,
                       bins.last_v, attrs, bg[None, :])    # [T, 8, P]

    def to_image(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, channels, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * TILE, tiles_x * TILE)
        return img[:, :h, :w]

    return {"render": to_image(out[:, OR:OB + 1, :], 3),
            "depth": to_image(out[:, OI:OI + 1, :], 1),
            "alpha": to_image(out[:, OA:OA + 1, :], 1)[0],
            "radii": proj.radius, "visibility": proj.valid,
            "dup_overflow": bins.dup_overflow,
            "tile_overflow": bins.tile_overflow}
