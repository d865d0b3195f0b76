"""Synthetic toy scenes for tests and benchmarks.

The reference's integration fixture is a 1500-image street dataset
(``README.md:7``); for unit/regression tests we synthesize small random
Gaussian clouds plus orbiting cameras, and use the oracle renderer to produce
ground-truth images (so end-to-end training tests have a known-achievable
optimum).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams, make_camera


class ToyScene(NamedTuple):
    means3d: jnp.ndarray      # [N, 3]
    scales: jnp.ndarray       # [N, 3] activated (positive)
    quats: jnp.ndarray        # [N, 4]
    opacities: jnp.ndarray    # [N] activated (0, 1)
    sh_coeffs: jnp.ndarray    # [N, K, 3]
    cameras: list[CameraParams]


def random_gaussians(key, n: int, sh_degree: int = 3, extent: float = 1.0,
                     scale_range=(0.02, 0.12)):
    ks = jax.random.split(key, 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    scales = jax.random.uniform(ks[1], (n, 3), minval=scale_range[0],
                                maxval=scale_range[1])
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    k = (sh_degree + 1) ** 2
    sh = 0.3 * jax.random.normal(ks[4], (n, k, 3))
    # Bias the DC band so mean colors land in a visible range.
    sh = sh.at[:, 0, :].set(jax.random.uniform(ks[4], (n, 3), minval=-1.0,
                                               maxval=1.0))
    return means, scales, quats, opac, sh


def lookat_camera(pos: np.ndarray, target: np.ndarray, width: int, height: int,
                  fovx: float = math.radians(60.0),
                  up=np.array([0.0, 0.0, 1.0])) -> CameraParams:
    """Build a CameraParams looking from ``pos`` to ``target`` (+z forward,
    +y down camera frame, 3DGS convention)."""
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    nr = np.linalg.norm(right)
    if nr < 1e-6:  # forward parallel to up: pick another up
        right = np.cross(fwd, np.array([1.0, 0.0, 0.0]))
        nr = np.linalg.norm(right)
    right = right / nr
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd])           # world→camera rotation rows
    t = -R_wc @ pos
    fovy = 2.0 * math.atan(math.tan(fovx / 2.0) * height / width)
    # make_camera expects the transposed (camera→world) rotation, COLMAP-reader
    # style (reference: scene/dataset_readers.py uses R = qvec2rotmat(q).T).
    return make_camera(R_wc.T, t, fovx, fovy, width, height)


def make_toy_scene(seed: int = 0, n: int = 512, n_cameras: int = 4,
                   width: int = 64, height: int = 64,
                   sh_degree: int = 3, radius: float = 3.0) -> ToyScene:
    key = jax.random.PRNGKey(seed)
    means, scales, quats, opac, sh = random_gaussians(key, n, sh_degree)
    cams = []
    for i in range(n_cameras):
        ang = 2.0 * math.pi * i / max(n_cameras, 1)
        pos = np.array([radius * math.cos(ang), radius * math.sin(ang), 0.8])
        cams.append(lookat_camera(pos, np.zeros(3), width, height))
    return ToyScene(means, scales, quats, opac, sh, cams)
