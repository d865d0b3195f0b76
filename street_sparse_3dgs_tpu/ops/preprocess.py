"""Per-Gaussian screen-space preprocessing (the rasterizer's 'preprocess' stage).

Vectorized JAX over all N Gaussians: world→camera transform, frustum cull,
perspective projection, EWA covariance projection, conic inversion, pixel
radius, SH→RGB.  The interface contract mirrors what the reference's CUDA
rasterizer does internally before binning (SURVEY.md §2.3, contract at
``gaussian_renderer/__init__.py:44-113``).

All outputs are fixed-shape [N, ...] with a validity mask; culled Gaussians get
radius 0 (the reference reports visibility via ``radii > 0`` too:
``gaussian_renderer/__init__.py:120-127``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import sh as shlib
from ..core.camera import CameraParams, ndc_to_pixel
from ..core.covariance import camera_cov3d, conic_and_radius, project_cov3d

# Near-plane distance used for frustum culling (standard 3DGS rasterizer value).
NEAR_CULL = 0.2


class Projected(NamedTuple):
    """Screen-space Gaussian attributes, one row per (possibly culled) input."""

    mean2d: jnp.ndarray     # [N, 2] pixel coordinates
    depth: jnp.ndarray      # [N] camera-space z
    inv_depth: jnp.ndarray  # [N] 1/z (the rasterizer's depth channel payload)
    conic: jnp.ndarray      # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray     # [N] pixel radius (0 => culled/invisible)
    color: jnp.ndarray      # [N, 3] view-dependent RGB
    opacity: jnp.ndarray    # [N] activated opacity
    valid: jnp.ndarray      # [N] bool visibility mask (radius > 0)


def project_gaussians(
    means3d: jnp.ndarray,          # [N, 3]
    scales: jnp.ndarray,           # [N, 3] activated (post-exp) scales
    quats: jnp.ndarray,            # [N, 4] wxyz (normalized inside)
    opacities: jnp.ndarray,        # [N] activated opacities
    sh_coeffs: jnp.ndarray,        # [N, K, 3]
    camera: CameraParams,
    sh_degree: int,
    scale_modifier: float = 1.0,
    active_mask: jnp.ndarray | None = None,  # [N] rows that exist at all
) -> Projected:
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)          # [N, 4]

    # Positions must not ride the MXU's bf16 default (pixel-scale error at
    # street-scene coordinate magnitudes): force true-f32 matmuls.
    hi = jax.lax.Precision.HIGHEST
    p_view = jnp.matmul(hom, camera.viewmatrix.T, precision=hi)   # [N, 4]
    depth = p_view[:, 2]

    p_clip = jnp.matmul(hom, camera.projmatrix.T, precision=hi)   # [N, 4]
    w = p_clip[:, 3]
    w_safe = jnp.where(jnp.abs(w) > 1e-7, w, 1e-7)
    ndc = p_clip[:, :2] / w_safe[:, None]

    size = jnp.stack([jnp.float32(camera.width), jnp.float32(camera.height)])
    mean2d = ndc_to_pixel(ndc, size)

    # Fully elementwise W Σ Wᵀ — batched [N,3,3] matmuls pad onto MXU tiles
    # and cost ~1.3 ms/step at 32k on v5e (see core/covariance.camera_cov3d).
    cov_cam = camera_cov3d(scales, quats, camera.viewmatrix[:3, :3],
                           scale_modifier)
    cov2d = project_cov3d(cov_cam, p_view[:, :3],
                          camera.focal_x, camera.focal_y,
                          camera.tan_fovx, camera.tan_fovy)
    conic, radius, det = conic_and_radius(cov2d)

    valid = (depth > NEAR_CULL) & (det > 0.0)
    if active_mask is not None:
        valid = valid & active_mask
    # Cull Gaussians whose 3σ footprint misses the image entirely.
    in_image = (
        (mean2d[:, 0] + radius >= 0.0)
        & (mean2d[:, 0] - radius <= camera.width)
        & (mean2d[:, 1] + radius >= 0.0)
        & (mean2d[:, 1] - radius <= camera.height)
    )
    valid = valid & in_image & (radius > 0.0)

    color = shlib.sh_to_color(sh_degree, sh_coeffs, means3d, camera.campos)

    radius = jnp.where(valid, radius, 0.0)
    depth_safe = jnp.maximum(depth, 1e-6)
    return Projected(
        mean2d=mean2d,
        depth=jnp.where(valid, depth, jnp.inf),
        inv_depth=jnp.where(valid, 1.0 / depth_safe, 0.0),
        conic=conic,
        radius=radius,
        color=color,
        opacity=jnp.where(valid, opacities, 0.0),
        valid=valid,
    )
