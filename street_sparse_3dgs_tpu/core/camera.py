"""Camera math: world→view, perspective projection with off-center principal
point, FOV/focal conversion.

Behavioral parity targets: ``utils/graphics_utils.py`` in the reference —
``getWorld2View2`` (R stored transposed + translate/scale of the camera
center), ``getProjectionMatrix(znear, zfar, fovX, fovY, primx, primy)``
with its principal-point-aware frustum, ``fov2focal``/``focal2fov``.

Convention: matrices here act on COLUMN vectors (math convention):
``x_view = W2V @ [x; 1]``, ``x_clip = P @ x_view``.  (The torch reference keeps
them transposed for row-vector ``@``; tests assert equality up to transpose.)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """4x4 world→camera matrix from COLMAP-style (R, t).

    ``R`` is the camera-to-world rotation as stored by the reference's readers
    (they pass ``R.transpose()`` into the matrix); ``t`` is the world→camera
    translation.  ``translate``/``scale`` recentre the camera center
    (reference: ``getWorld2View2``).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                      primx: float = 0.5, primy: float = 0.5) -> np.ndarray:
    """Perspective projection with off-center principal point.

    Matches the reference formula exactly (``utils/graphics_utils.py:51-77``):
    the frustum's left/right (bottom/top) are split ``primx : 1-primx`` so the
    principal point lands at ``primx`` in NDC [0,1].
    """
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)

    top = tan_half_fovy * znear
    bottom = (1.0 - primy) * 2.0 * -top
    top = primy * 2.0 * top
    right = tan_half_fovx * znear
    left = (1.0 - primx) * 2.0 * -right
    right = primx * 2.0 * right

    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P.astype(np.float32)


@jax.tree_util.register_pytree_node_class
class CameraParams(NamedTuple):
    """Per-view parameters consumed by the renderer — the analogue of the
    reference's ``GaussianRasterizationSettings`` geometry fields.

    Registered as a custom pytree: the array fields are leaves, while
    ``height``/``width`` are aux data so they stay **static** under ``jit``
    (they determine output shapes and the tile grid)."""

    viewmatrix: jnp.ndarray      # [4,4] world→camera
    projmatrix: jnp.ndarray      # [4,4] full projection (P @ W2V)
    campos: jnp.ndarray          # [3] camera center in world space
    tan_fovx: jnp.ndarray        # scalar
    tan_fovy: jnp.ndarray        # scalar
    focal_x: jnp.ndarray         # scalar, pixels
    focal_y: jnp.ndarray         # scalar, pixels
    height: int                  # static
    width: int                   # static

    def tree_flatten(self):
        return (tuple(self[:7]), (self.height, self.width))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, primx: float = 0.5, primy: float = 0.5,
                znear: float = 0.01, zfar: float = 100.0,
                translate=np.zeros(3), scale: float = 1.0) -> CameraParams:
    w2v = world_to_view(R, t, translate, scale)
    proj = projection_matrix(znear, zfar, fovx, fovy, primx, primy) @ w2v
    campos = np.linalg.inv(w2v)[:3, 3]
    return CameraParams(
        viewmatrix=jnp.asarray(w2v),
        projmatrix=jnp.asarray(proj),
        campos=jnp.asarray(campos.astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(fovx / 2.0)),
        tan_fovy=jnp.float32(math.tan(fovy / 2.0)),
        focal_x=jnp.float32(width / (2.0 * math.tan(fovx / 2.0))),
        focal_y=jnp.float32(height / (2.0 * math.tan(fovy / 2.0))),
        height=int(height),
        width=int(width),
    )


def ndc_to_pixel(ndc: jnp.ndarray, size: jnp.ndarray | float) -> jnp.ndarray:
    """NDC [-1,1] -> pixel centers, 3DGS convention: ((ndc+1)·S - 1)/2."""
    return ((ndc + 1.0) * size - 1.0) * 0.5
