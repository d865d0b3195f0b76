"""3D covariance construction and EWA 2D projection.

The 3D Gaussian covariance is Σ = R S Sᵀ Rᵀ with R from a unit quaternion and
S = diag(scales) (reference: ``utils/general_utils.py:build_scaling_rotation``,
``scene/gaussian_model.py:34-41``).  The screen-space footprint is the standard
EWA splat: Σ' = J W Σ Wᵀ Jᵀ with the affine Jacobian J of the perspective
projection, plus a 0.3-pixel low-pass dilation on the diagonal (standard 3DGS
rasterizer behavior; the reference's CUDA internals are the empty
``submodules/hierarchy-rasterizer``, contract per SURVEY.md §2.3).

Everything is vectorized over N and fuses into a handful of elementwise VPU
ops under jit — there is no matmul large enough to need the MXU here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import to_rotation_matrix

# Screen-space low-pass filter added to the projected covariance diagonal
# (anti-aliasing dilation used by the Inria rasterizer family).
LOW_PASS = 0.3


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """[..., 3] activated scales + [..., 4] quats -> [..., 3, 3] covariance."""
    R = to_rotation_matrix(quats)
    s = scales * scale_modifier
    # M = R @ diag(s); Σ = M Mᵀ
    M = R * s[..., None, :]
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def camera_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, W: jnp.ndarray,
                 scale_modifier: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Camera-space covariance W (R S Sᵀ Rᵀ) Wᵀ as [..., 3, 3], fully
    elementwise.

    Equivalent to ``W @ build_covariance(...) @ W.T`` but never forms a
    batched tiny matmul: XLA lowers [N,3,3] dots (at the HIGHEST precision
    positions need) onto padded MXU tiles — measured ~1.3 ms/step at 32k
    Gaussians on v5e, vs ~0.05 ms as VPU fused multiply-adds.  Exact-f32 by
    construction (no MXU pass at all).

    ``W`` is the [3, 3] world→camera rotation, shared across the batch.
    """
    R = to_rotation_matrix(quats)
    s = scales * scale_modifier
    # Rows of A = W @ (R·diag(s)): A_ij = Σ_k W_ik R_kj s_j.
    a = [[W[i, 0] * R[..., 0, j] * s[..., j]
          + W[i, 1] * R[..., 1, j] * s[..., j]
          + W[i, 2] * R[..., 2, j] * s[..., j]
          for j in range(3)] for i in range(3)]
    dot = lambda i, j: a[i][0] * a[j][0] + a[i][1] * a[j][1] + a[i][2] * a[j][2]
    return jnp.stack(
        [
            jnp.stack([dot(0, 0), dot(0, 1), dot(0, 2)], axis=-1),
            jnp.stack([dot(0, 1), dot(1, 1), dot(1, 2)], axis=-1),
            jnp.stack([dot(0, 2), dot(1, 2), dot(2, 2)], axis=-1),
        ],
        axis=-2,
    )


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper-triangular uniques
    (order: xx, xy, xz, yy, yz, zz; reference ``utils/general_utils.py:strip_lowerdiag``)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def unstrip_symmetric(six: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`strip_symmetric`."""
    xx, xy, xz, yy, yz, zz = (six[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def project_cov3d(cov3d: jnp.ndarray, mean_cam: jnp.ndarray,
                  focal_x: float, focal_y: float,
                  tan_fovx: float, tan_fovy: float) -> jnp.ndarray:
    """EWA projection of camera-space covariances to 2D screen space.

    Args:
      cov3d: [..., 3, 3] covariance already rotated into camera space
        (i.e. W Σ Wᵀ where W is the world→camera rotation), or world covariance
        when combined with `rot_cam` upstream — see :func:`project_gaussians`.
      mean_cam: [..., 3] camera-space means (z > 0 in front).
      focal_*: pixel focal lengths; tan_fov*: half-FOV tangents.

    Returns:
      [..., 3] packed 2D covariance (cxx, cxy, cyy) including the low-pass term.
    """
    tx, ty, tz = mean_cam[..., 0], mean_cam[..., 1], mean_cam[..., 2]
    # Clamp the frustum position used in the Jacobian (standard EWA guard).
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tz_safe = jnp.maximum(tz, 1e-6)
    txz = jnp.clip(tx / tz_safe, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(ty / tz_safe, -lim_y, lim_y) * tz_safe

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [fx/z, 0, -fx x/z²], [0, fy/z, -fy y/z²]
    j00 = focal_x * inv_z
    j02 = -focal_x * txz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyz * inv_z2

    c = cov3d
    # T = J @ Σ  (2x3), then Σ' = T @ Jᵀ (2x2 symmetric)
    t00 = j00 * c[..., 0, 0] + j02 * c[..., 2, 0]
    t01 = j00 * c[..., 0, 1] + j02 * c[..., 2, 1]
    t02 = j00 * c[..., 0, 2] + j02 * c[..., 2, 2]
    t10 = j11 * c[..., 1, 0] + j12 * c[..., 2, 0]
    t11 = j11 * c[..., 1, 1] + j12 * c[..., 2, 1]
    t12 = j11 * c[..., 1, 2] + j12 * c[..., 2, 2]

    cxx = t00 * j00 + t02 * j02 + LOW_PASS
    cxy = t00 * 0.0 + t01 * j11 + t02 * j12
    cyy = t10 * 0.0 + t11 * j11 + t12 * j12 + LOW_PASS
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def conic_and_radius(cov2d: jnp.ndarray):
    """Invert packed 2D covariances and bound their pixel footprint.

    Returns (conic [...,3] = (a,b,c) of the inverse, radius [...] in pixels,
    det [...]).  Radius = ceil(3σ_max) from the eigenvalues, matching the 3σ
    cutoff used for tile coverage in the reference rasterizer family.
    """
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det > 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)
    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    return conic, radius, det
