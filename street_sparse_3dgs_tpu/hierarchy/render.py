"""Render a view-dependent hierarchy cut — the ``render_post`` equivalent.

Mirrors the reference's Python-side interpolation path
(``gaussian_renderer/__init__.py:200-235``, ``interp_python=True``): the
selected node's activated means/scales/SHs/opacities are lerped with its
parent's by the cut weight (quaternion sign-fixed via the dot product), the
skybox tail is appended with weight 1, and everything goes through the same
differentiable rasterizer.

TPU-first difference: no compaction.  The reference gathers the selected rows
into a dense [to_render] buffer (dynamic size); here the blend runs over ALL
hierarchy rows with the cut's ``selected`` mask gating validity — shapes stay
static so post-opt reuses one compiled step regardless of the per-step random
granularity (``train_post.py:66-74``).  Gradients flow to BOTH child and
parent rows through the lerp, exactly as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.camera import CameraParams
from ..core.quaternion import align_sign
from ..models.gaussians import GaussianParams, sh_coeffs
from ..ops.rasterize import RasterConfig, rasterize
from .structure import Cut


def blend_cut(params: GaussianParams, cut: Cut, n_nodes: int,
              skybox_count: int):
    """Lerp every tree row toward its parent by its cut weight.

    Returns activated (means, scales, quats, opacities, shs, active_mask)
    covering [n_nodes + skybox_count] rows (abs-opacity hierarchy
    convention)."""
    total = params.xyz.shape[0]
    w_nodes = cut.weights
    pad = total - n_nodes
    w = jnp.concatenate([w_nodes, jnp.ones((pad,), w_nodes.dtype)])[:, None]
    par = jnp.concatenate(
        [cut.parent, jnp.arange(n_nodes, total, dtype=jnp.int32)])

    xyz = params.xyz
    scales = jnp.exp(params.log_scales)
    opac = jnp.abs(params.opacity_raw[:, 0])
    sh = sh_coeffs(params)
    quats = params.quats

    xyz_b = w * xyz + (1.0 - w) * xyz[par]
    scales_b = w * scales + (1.0 - w) * scales[par]
    opac_b = w[:, 0] * opac + (1.0 - w[:, 0]) * opac[par]
    sh_b = w[:, :, None] * sh + (1.0 - w[:, :, None]) * sh[par]
    parents_q = align_sign(quats[par], quats)
    quats_b = w * quats + (1.0 - w) * parents_q

    active = jnp.concatenate(
        [cut.selected, jnp.ones((pad,), bool)])
    return xyz_b, scales_b, quats_b, opac_b, sh_b, active


def render_cut(
    h_params: GaussianParams,
    cut: Cut,
    n_nodes: int,
    skybox_count: int,
    camera: CameraParams,
    sh_degree: int,
    bg: jnp.ndarray,
    config: RasterConfig = RasterConfig(),
    mean2d_residual: jnp.ndarray | None = None,
):
    """Differentiable render of a hierarchy cut (params passed separately so
    ``jax.grad`` w.r.t. them sees the lerp)."""
    xyz, scales, quats, opac, sh, active = blend_cut(
        h_params, cut, n_nodes, skybox_count)
    return rasterize(xyz, scales, quats, opac, sh, camera, sh_degree, bg,
                     config, active_mask=active,
                     mean2d_residual=mean2d_residual)


def compact_cut_indices(cut: Cut, capacity: int):
    """Jit-traceable compaction of a cut's selected set into a static
    ``capacity``-slot index buffer (ascending node order).

    Returns ``(gi, gp, w, valid, overflow)``: gathered node index, parent
    index and lerp weight per slot, the slot-validity mask, and the count of
    selected nodes that did NOT fit (never silently dropped — the post-opt
    driver grows the capacity and redoes the step, mirroring the static-
    capacity + host-growth policy of densification)."""
    (idx,) = jnp.nonzero(cut.selected, size=capacity, fill_value=0)
    count = jnp.sum(cut.selected.astype(jnp.int32))
    valid = jnp.arange(capacity) < jnp.minimum(count, capacity)
    gi = jnp.where(valid, idx, 0).astype(jnp.int32)
    gp = cut.parent[gi]
    w = jnp.where(valid, cut.weights[gi], 1.0)
    overflow = jnp.maximum(count - capacity, 0)
    return gi, gp, w, valid, overflow


def blend_cut_compact(params: GaussianParams, cut: Cut, n_nodes: int,
                      skybox_count: int, capacity: int):
    """O(cut) differentiable analogue of ``blend_cut``: gather ONLY the
    selected rows (+ the skybox tail) into ``capacity + skybox`` slots and
    lerp there.  Gradients flow back to the full node arrays through the
    gathers' transpose (scatter-add) — the reference's dense ``render_post``
    buffers over ``render_indices`` (``gaussian_renderer/__init__.py:
    203-235``), without the per-step dynamic shapes.

    Returns (means, scales, quats, opacities, shs, active, overflow)."""
    total = params.xyz.shape[0]
    gi, gp, w, valid, overflow = compact_cut_indices(cut, capacity)
    sky = jnp.arange(n_nodes, total, dtype=jnp.int32)
    gi = jnp.concatenate([gi, sky])
    gp = jnp.concatenate([gp, sky])
    w = jnp.concatenate([w, jnp.ones((total - n_nodes,), w.dtype)])[:, None]
    active = jnp.concatenate([valid, jnp.ones((total - n_nodes,), bool)])

    # Gather RAW rows first, activate on the compact buffer — keeps every
    # elementwise activation O(cut), not O(nodes).
    def sh_rows(rows):
        return jnp.concatenate([params.features_dc[rows],
                                params.features_rest[rows]], axis=1)

    # Padding slots gather row 0; zero them so their cotangents cannot
    # leak into real rows through the scatter-add VJP.
    def z(x):
        return jnp.where(active.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0.0)

    xyz_b = z(w * params.xyz[gi] + (1.0 - w) * params.xyz[gp])
    scales_i = jnp.exp(params.log_scales[gi])
    scales_p = jnp.exp(params.log_scales[gp])
    scales_b = z(w * scales_i + (1.0 - w) * scales_p)
    opac_i = jnp.abs(params.opacity_raw[gi, 0])
    opac_p = jnp.abs(params.opacity_raw[gp, 0])
    opac_b = z(w[:, 0] * opac_i + (1.0 - w[:, 0]) * opac_p)
    sh_b = z(w[:, :, None] * sh_rows(gi) + (1.0 - w[:, :, None]) * sh_rows(gp))
    quats_i = params.quats[gi]
    parents_q = align_sign(params.quats[gp], quats_i)
    quats_b = z(w * quats_i + (1.0 - w) * parents_q)
    # Zeroed quats are degenerate for rotation math downstream; park
    # padding slots at identity instead (still constant → zero cotangent).
    quats_b = jnp.where(active[:, None], quats_b,
                        jnp.array([1.0, 0.0, 0.0, 0.0], quats_i.dtype))
    return xyz_b, scales_b, quats_b, opac_b, sh_b, active, overflow


def render_cut_compacted(
    h_params: GaussianParams,
    cut: Cut,
    n_nodes: int,
    skybox_count: int,
    capacity: int,
    camera: CameraParams,
    sh_degree: int,
    bg: jnp.ndarray,
    config: RasterConfig = RasterConfig(),
):
    """Differentiable render over the compacted cut: rasterization cost is
    O(capacity + skybox), not O(nodes).  Adds ``cut_overflow`` to the raster
    outputs (selected nodes beyond capacity — caller must grow + retry)."""
    xyz, scales, quats, opac, sh, active, overflow = blend_cut_compact(
        h_params, cut, n_nodes, skybox_count, capacity)
    out = rasterize(xyz, scales, quats, opac, sh, camera, sh_degree, bg,
                    config, active_mask=active)
    out["cut_overflow"] = overflow
    return out


def compact_cut_params(h_params: GaussianParams, cut: Cut, n_nodes: int,
                       skybox_count: int, pad_to_pow2: bool = True):
    """Host-side compaction for *evaluation* renders: gather only the
    selected nodes (+ skybox tail), blend them with their parents, and
    return dense activated arrays.

    Training keeps the mask form (static shapes); at eval a coarse cut may
    select a tiny fraction of a multi-million-node hierarchy, where the
    reference's dense-buffer approach (``render_post`` on ``to_render``
    entries) wins.  Row count is padded to a power of two so repeated eval
    calls reuse a bounded set of compiled programs."""
    import numpy as np

    sel = np.nonzero(np.asarray(cut.selected))[0]
    total = h_params.xyz.shape[0]
    sky = np.arange(n_nodes, total)
    idx = np.concatenate([sel, sky])
    par = np.concatenate([np.asarray(cut.parent)[sel], sky])
    w = np.concatenate([np.asarray(cut.weights)[sel],
                        np.ones(len(sky), np.float32)])

    n = len(idx)
    n_pad = 1 << max(4, int(np.ceil(np.log2(max(n, 1))))) if pad_to_pow2 \
        else n
    pad = n_pad - n
    idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
    par = np.concatenate([par, np.zeros(pad, par.dtype)])
    w = np.concatenate([w, np.ones(pad, np.float32)])
    active = jnp.asarray(np.arange(n_pad) < n)

    gi = jnp.asarray(idx)
    gp = jnp.asarray(par)
    wj = jnp.asarray(w)[:, None]

    xyz = h_params.xyz
    scales = jnp.exp(h_params.log_scales)
    opac = jnp.abs(h_params.opacity_raw[:, 0])
    sh = sh_coeffs(h_params)
    quats = h_params.quats

    xyz_b = wj * xyz[gi] + (1 - wj) * xyz[gp]
    scales_b = wj * scales[gi] + (1 - wj) * scales[gp]
    opac_b = wj[:, 0] * opac[gi] + (1 - wj[:, 0]) * opac[gp]
    sh_b = wj[:, :, None] * sh[gi] + (1 - wj[:, :, None]) * sh[gp]
    parents_q = align_sign(quats[gp], quats[gi])
    quats_b = wj * quats[gi] + (1 - wj) * parents_q
    return xyz_b, scales_b, quats_b, opac_b, sh_b, active


def render_cut_compact(h_params: GaussianParams, cut: Cut, n_nodes: int,
                       skybox_count: int, camera, sh_degree: int,
                       bg: jnp.ndarray, config: RasterConfig = RasterConfig(),
                       scale_modifier: float = 1.0):
    """Evaluation-path render over the compacted cut (non-differentiable
    boundary: compaction happens on the host)."""
    xyz, scales, quats, opac, sh, active = compact_cut_params(
        h_params, cut, n_nodes, skybox_count)
    return rasterize(xyz, scales, quats, opac, sh, camera, sh_degree, bg,
                     config, scale_modifier=scale_modifier,
                     active_mask=active)
