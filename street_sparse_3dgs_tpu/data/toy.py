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


def make_street_scene(seed: int = 0, n: int = 1_000_000, n_cameras: int = 4,
                      width: int = 1920, height: int = 1088,
                      sh_degree: int = 3, length: float = 120.0,
                      half_width: float = 12.0) -> ToyScene:
    """Street-profile synthetic scene at production scale.

    Mimics the geometry/statistics of a trained street chunk (the reference's
    workload: ~100 m chunks, millions of small splats at ~1.5 MP —
    `preprocess/ss_make_chunk.py:651-654`, `README.md:220`): a ground strip,
    two building facades, scattered street objects, and a sparse far
    background.  Splat sizes are log-uniform (trained scenes are dominated by
    small surface splats with a heavy tail), opacities beta-ish high, and
    cameras sit at vehicle height looking down the road — so per-view
    visibility, tile occupancy, and depth complexity resemble the real
    training regime rather than the dense random cube of ``make_toy_scene``.
    """
    rng = np.random.default_rng(seed)
    n_ground = int(n * 0.40)
    n_facade = int(n * 0.40)
    n_obj = int(n * 0.15)
    n_far = n - n_ground - n_facade - n_obj

    def jitter(k, s):
        return rng.normal(0.0, s, k)

    # Ground strip: z ~ 0, flattened splats.
    g_xy = np.stack([rng.uniform(0.0, length, n_ground),
                     rng.uniform(-half_width, half_width, n_ground)], axis=1)
    ground = np.concatenate([g_xy, np.abs(jitter(n_ground, 0.03))[:, None]],
                            axis=1)
    # Facades: two walls at y = ±half_width, z in [0, 14].
    side = rng.integers(0, 2, n_facade) * 2 - 1
    facade = np.stack([
        rng.uniform(0.0, length, n_facade),
        side * half_width + jitter(n_facade, 0.15),
        rng.uniform(0.0, 14.0, n_facade)], axis=1)
    # Street objects: gaussian clusters (cars, poles, trees).
    n_clusters = max(1, n_obj // 2000)
    centers = np.stack([
        rng.uniform(0.0, length, n_clusters),
        rng.uniform(-half_width * 0.8, half_width * 0.8, n_clusters),
        rng.uniform(0.3, 3.0, n_clusters)], axis=1)
    which = rng.integers(0, n_clusters, n_obj)
    objs = centers[which] + rng.normal(0.0, 0.8, (n_obj, 3)) * \
        np.array([1.5, 0.6, 0.8])
    objs[:, 2] = np.abs(objs[:, 2])
    # Sparse far background past the corridor end (distant context).
    far = np.stack([
        rng.uniform(length, length * 1.6, n_far),
        rng.uniform(-6 * half_width, 6 * half_width, n_far),
        rng.uniform(0.0, 30.0, n_far)], axis=1)

    means = np.concatenate([ground, facade, objs, far]).astype(np.float32)

    # Converged scenes have roughly constant ANGULAR splat size (densify
    # splits anything that projects large from any training view): size =
    # distance-to-the-camera-path × a log-uniform angular size of ~1-8 px
    # (θ ∈ [1e-3, 6e-3] rad at ~1.4k px focal).  Ground/facade splats are
    # flattened along their surface normal (z / y).
    t_ax = np.clip(means[:, 0], 0.0, length)
    d_ax = np.sqrt((means[:, 0] - t_ax) ** 2 + means[:, 1] ** 2
                   + (means[:, 2] - 2.2) ** 2)
    d_ax = np.clip(d_ax, 1.5, 300.0)
    theta = np.exp(rng.uniform(np.log(1e-3), np.log(6e-3), (n, 3)))
    base = (d_ax[:, None] * theta).astype(np.float32)
    base[:n_ground, 2] *= 0.15
    base[n_ground:n_ground + n_facade, 1] *= 0.15
    base[-n_far:] *= 2.0                      # far splats are coarser
    quats = rng.normal(0.0, 1.0, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.beta(4.0, 1.5, n).astype(np.float32) * 0.98 + 0.01
    k = (sh_degree + 1) ** 2
    sh = (0.12 * rng.normal(0.0, 1.0, (n, k, 3))).astype(np.float32)
    sh[:, 0, :] = rng.uniform(-1.2, 1.2, (n, 3))

    cams = []
    for i in range(n_cameras):
        x = 8.0 + (length - 40.0) * i / max(n_cameras - 1, 1)
        pos = np.array([x, rng.uniform(-1.5, 1.5), 2.2])
        target = pos + np.array([20.0, rng.uniform(-4.0, 4.0), -0.8])
        cams.append(lookat_camera(pos, target, width, height,
                                  fovx=math.radians(70.0)))
    return ToyScene(jnp.asarray(means), jnp.asarray(base),
                    jnp.asarray(quats), jnp.asarray(opac), jnp.asarray(sh),
                    cams)


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
