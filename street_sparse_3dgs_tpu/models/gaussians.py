"""The Gaussian scene model as a capacity-padded JAX pytree.

TPU-native re-design of the reference's ``GaussianModel``
(``scene/gaussian_model.py:30-305``): instead of torch ``nn.Parameter``
tensors that are concatenated/pruned in place (with optimizer-state surgery,
``scene/gaussian_model.py:546-648``), the model is a fixed-**capacity** array
pytree with an ``active`` row mask.  Densify/clone/split/prune become pure
functions that scatter into free rows (``models/densify.py``); shapes stay
static so every training step hits the same compiled XLA executable, and the
program only re-jits when the capacity is grown (host-side, on overflow).

Row layout (mirrors the reference's leading-block conventions):
  [0, skybox)                       procedural skybox rows
  [skybox, n_frozen)                scaffold ring rows (chunk training)
  [n_frozen, ...)                   ordinary scene Gaussians + free slots

Parity targets:
  - activations exp/sigmoid/normalize, abs-opacity in hierarchy mode
    (``scene/gaussian_model.py:32-47,411-412``)
  - ``create_from_pcd`` incl. the procedural skybox dome (100k points on a
    partial sphere at 10× scene radius, ``scene/gaussian_model.py:186-201``)
  - scaffold ring selection around chunk bounds (``:225-264``)
  - scale init from mean squared 3-NN distance (``:207-211``) via
    ``core/knn.py`` instead of the simple-knn CUDA extension
  - per-image learned 3×4 exposure affines (``:266-277``)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import sh as shlib
from ..core.knn import mean_sq_dist_to_3nn_auto


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianParams(NamedTuple):
    """Raw (pre-activation) learnable per-Gaussian parameters, one row per
    capacity slot.  K = (sh_degree+1)^2 SH coefficients split into the DC band
    and the rest, like the reference's ``_features_dc``/``_features_rest``."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    log_scales: jnp.ndarray     # [C, 3]
    quats: jnp.ndarray          # [C, 4] wxyz
    opacity_raw: jnp.ndarray    # [C, 1] logit (sigmoid mode) or raw (abs mode)


@dataclasses.dataclass(frozen=True)
class GaussianMeta:
    """Static (hashable) model metadata — passed as a jit static argument."""

    sh_degree: int = 3
    capacity: int = 0
    skybox_points: int = 0       # leading procedural-skybox rows
    scaffold_points: int = 0     # leading frozen rows incl. skybox (chunk mode)
    opacity_activation: str = "sigmoid"   # "sigmoid" | "abs" (hierarchy mode)
    skybox_locked: bool = False

    @property
    def n_frozen(self) -> int:
        """Rows excluded from densification (scaffold incl. skybox if present,
        matching ``densify_and_clone``'s ``scaffold_points`` guard)."""
        return self.scaffold_points if self.scaffold_points > 0 else 0


def activate_scales(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.log_scales)


def activate_opacity(params: GaussianParams, meta: GaussianMeta) -> jnp.ndarray:
    """[C] activated opacity (sigmoid normally; abs in hierarchy post-opt,
    reference ``scene/gaussian_model.py:411-412``)."""
    raw = params.opacity_raw[:, 0]
    if meta.opacity_activation == "abs":
        return jnp.abs(raw)
    return jax.nn.sigmoid(raw)


def sh_coeffs(params: GaussianParams) -> jnp.ndarray:
    """[C, K, 3] full SH coefficient stack (DC band first)."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def n_capacity(params: GaussianParams) -> int:
    return params.xyz.shape[0]


# ---------------------------------------------------------------------------
# Construction


def _skybox_dome(key, n: int, center: np.ndarray, radius: float):
    """Procedural skybox: n points on a partial sphere at 10× scene radius
    with a blue-tinted white color (reference ``scene/gaussian_model.py:
    186-201``: θ~U[0,2π), φ=arccos(1-1.4u) — slightly past the equator)."""
    k1, k2 = jax.random.split(key)
    theta = 2.0 * jnp.pi * jax.random.uniform(k1, (n,))
    phi = jnp.arccos(1.0 - 1.4 * jax.random.uniform(k2, (n,)))
    r = 10.0 * radius
    xyz = jnp.stack([
        r * jnp.cos(theta) * jnp.sin(phi),
        r * jnp.sin(theta) * jnp.sin(phi),
        r * jnp.cos(phi),
    ], axis=-1) + jnp.asarray(center)
    color = jnp.broadcast_to(jnp.asarray([0.7, 0.8, 0.95], jnp.float32), (n, 3))
    return xyz, color


def create_from_pcd(
    key,
    points: np.ndarray,          # [N, 3]
    colors: np.ndarray,          # [N, 3] in [0, 1]
    sh_degree: int = 3,
    skybox_points: int = 0,
    capacity: int | None = None,
    scaffold: GaussianParams | None = None,
    scaffold_skybox_points: int = 0,
    chunk_center: np.ndarray | None = None,
    chunk_extent: np.ndarray | None = None,
    skybox_locked: bool = False,
) -> tuple[GaussianParams, jnp.ndarray, GaussianMeta]:
    """Initialise the model from a point cloud.

    Returns (params, active mask [C], meta).  When ``scaffold`` is given the
    skybox is inherited from it (``skybox_points`` is overridden to 0 —
    reference ``scene/gaussian_model.py:182-184``) and a ring of scaffold rows
    around the chunk bounds is prepended (``:225-264``).
    """
    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    n_pts = pts.shape[0]

    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    center = 0.5 * (lo + hi)
    radius = float(jnp.linalg.norm(hi - center))

    use_skybox = skybox_points > 0 and scaffold is None
    if use_skybox:
        sky_xyz, sky_col = _skybox_dome(key, skybox_points, np.asarray(center),
                                        radius)
        xyz = jnp.concatenate([sky_xyz, pts], axis=0)
        color = jnp.concatenate([sky_col, cols], axis=0)
    else:
        skybox_points = 0
        xyz = pts
        color = cols
    n = xyz.shape[0]

    # Scale init: log sqrt of mean squared 3-NN distance (distCUDA2 contract).
    dist2 = jnp.maximum(mean_sq_dist_to_3nn_auto(xyz), 1e-7)
    if use_skybox:
        # Reference: skybox gaussians 10× bigger, scene ones clamped ≤ 10 m².
        sky = jnp.arange(n) < skybox_points
        dist2 = jnp.where(sky, dist2 * 10.0, jnp.minimum(dist2, 10.0))
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)

    if use_skybox:
        opacity = inverse_sigmoid(0.02 * jnp.ones((n, 1)))
        opacity = opacity.at[:skybox_points].set(0.7)  # raw logit, as reference
    else:
        opacity = inverse_sigmoid(0.01 * jnp.ones((n, 1)))

    k_rest = (sh_degree + 1) ** 2 - 1
    features_dc = shlib.rgb_to_sh(color)[:, None, :]
    features_rest = jnp.zeros((n, k_rest, 3))

    params = GaussianParams(xyz, features_dc, features_rest, log_scales, quats,
                            opacity)

    scaffold_count = 0
    if scaffold is not None:
        ring, scaffold_count = select_scaffold_ring(
            scaffold, scaffold_skybox_points, np.asarray(chunk_center),
            np.asarray(chunk_extent))
        params = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                              ring, params)
        n += scaffold_count
        skybox_points = min(scaffold_skybox_points, scaffold_count)

    if capacity is None:
        capacity = n
    params, active = pad_to_capacity(params, n, capacity)
    meta = GaussianMeta(sh_degree=sh_degree, capacity=capacity,
                        skybox_points=skybox_points,
                        scaffold_points=scaffold_count,
                        skybox_locked=skybox_locked)
    return params, active, meta


def select_scaffold_ring(scaffold: GaussianParams, skybox_points: int,
                         center: np.ndarray, extent: np.ndarray):
    """Scaffold rows kept for a chunk: the skybox head plus points in a square
    ring 0.5–1.5 chunk-extents from the chunk center (reference
    ``scene/gaussian_model.py:249-257``: the |dx|,|dy| max against
    ``0.5·extent[0]``/``1.5·extent[0]``).  Host-side (numpy) — runs once."""
    xyz = np.asarray(scaffold.xyz)
    d = np.abs(xyz - np.asarray(center))
    m = np.maximum(d[:, 0], d[:, 1])
    selec = (m > 0.5 * extent[0]) & (m < 1.5 * extent[0])
    selec[:skybox_points] = True
    idx = np.nonzero(selec)[0]
    ring = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[idx]), scaffold)
    return ring, int(idx.size)


def pad_to_capacity(params: GaussianParams, n_active: int, capacity: int):
    """Pad every leaf to ``capacity`` rows; padding rows are inactive (zero
    opacity, unit quat, tiny scale at the origin — never rendered because the
    ``active`` mask gates validity in ``ops/preprocess.py``)."""
    if capacity < n_active:
        raise ValueError(f"capacity {capacity} < active rows {n_active}")
    pad = capacity - params.xyz.shape[0]

    def pad_leaf(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    padded = GaussianParams(
        xyz=pad_leaf(params.xyz),
        features_dc=pad_leaf(params.features_dc),
        features_rest=pad_leaf(params.features_rest),
        log_scales=pad_leaf(params.log_scales, -10.0),
        quats=pad_leaf(params.quats).at[params.xyz.shape[0]:, 0].set(1.0),
        opacity_raw=pad_leaf(params.opacity_raw, -10.0),
    )
    active = jnp.arange(capacity) < n_active
    return padded, active


def frozen_mask(meta: GaussianMeta, capacity: int) -> jnp.ndarray:
    """[C] rows whose grads the training loops zero: the scaffold block in
    chunk training (``train_single.py:217-223``) or the locked skybox."""
    rows = jnp.arange(capacity)
    n = meta.scaffold_points if meta.scaffold_points > 0 else (
        meta.skybox_points if meta.skybox_locked else 0)
    return rows < n


# ---------------------------------------------------------------------------
# Exposure


def init_exposure(n_images: int) -> jnp.ndarray:
    """[n_images, 3, 4] identity affine color transforms
    (reference ``scene/gaussian_model.py:274-277``)."""
    eye = jnp.eye(3, 4, dtype=jnp.float32)
    return jnp.broadcast_to(eye, (n_images, 3, 4)).copy()


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3×4 affine to a [3,H,W] image (reference
    ``gaussian_renderer/__init__.py:115-118``: ``img_hwc @ E[:3,:3]`` — i.e.
    the *transpose* acts on the channel axis — plus the translation column)."""
    out = jnp.einsum("ji,jhw->ihw", exposure[:, :3], image,
                     precision=jax.lax.Precision.HIGHEST)
    return out + exposure[:, 3, None, None]


# ---------------------------------------------------------------------------
# Big-Gaussian clamp (post-step hygiene in all training loops)


def clamp_big_gaussians(params: GaussianParams, meta: GaussianMeta,
                        extent: float, fraction: float,
                        active: jnp.ndarray) -> GaussianParams:
    """Shrink Gaussians whose max scale exceeds ``fraction·extent`` by ×0.8,
    excluding the frozen leading block (reference ``train_single.py:235-241``
    with fraction 0.02; ``train_coarse.py:141-145`` with 0.1)."""
    scales = jnp.exp(params.log_scales)
    violators = jnp.max(scales, axis=1) > fraction * extent
    n_skip = meta.scaffold_points if meta.scaffold_points > 0 else meta.skybox_points
    violators = violators & (jnp.arange(scales.shape[0]) >= n_skip) & active
    new_log = jnp.where(violators[:, None],
                        params.log_scales + jnp.log(0.8), params.log_scales)
    return params._replace(log_scales=new_log)
