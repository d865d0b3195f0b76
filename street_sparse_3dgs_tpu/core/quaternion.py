"""Quaternion math (wxyz convention, matching the reference rasterizer).

Reference semantics: ``utils/general_utils.py:build_rotation`` — quaternions are
stored (w, x, y, z), normalized before use.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] rotation matrices. Normalizes first."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def align_sign(q: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Flip ``q`` where dot(q, ref) < 0 so that lerp interpolates the short way.

    Used by the hierarchy parent/child interpolation
    (reference: ``gaussian_renderer/__init__.py:215-218``), except here we flip
    the *child-relative* operand generically.
    """
    dots = jnp.sum(q * ref, axis=-1, keepdims=True)
    return jnp.where(dots < 0.0, -q, q)
