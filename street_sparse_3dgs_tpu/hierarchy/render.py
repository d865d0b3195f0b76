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
from .structure import Cut, Hierarchy


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
