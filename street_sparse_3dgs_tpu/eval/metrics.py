"""Evaluation metrics: PSNR / SSIM / LPIPS / iMAE / iRMSE, plain + masked.

Parity targets:
  - ``render_hierarchy.py:123-159``: PSNR/SSIM/LPIPS(vgg) on alpha-masked
    images, iMAE = Σ|Δinvdepth|/Σmask, iRMSE = sqrt(ΣΔ²/Σmask);
  - ``lpipsPyTorch/``: LPIPS with the fork's mask support (mask resized per
    feature level, spatially weighted mean) — wrapped behind a lazy
    torch-CPU implementation (eval-only; the training path never needs it);
  - ``render_hierarchy_final.py:286-438``: per-semantic-category masked
    metrics from color-coded masks and depth-stratified bands with
    pixel-weighted aggregation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..train import losses

# Depth bands in meters (reference ``render_hierarchy_final.py:30-35``).
DEPTH_RANGES = (("near", 0.0, 5.0), ("medium", 5.0, 20.0),
                ("far", 20.0, float("inf")))


def psnr(img, gt):
    return float(losses.psnr(jnp.asarray(img), jnp.asarray(gt)))


def ssim(img, gt):
    return float(losses.ssim(jnp.asarray(img), jnp.asarray(gt)))


def psnr_masked(img, gt, mask):
    return float(losses.psnr_masked(jnp.asarray(img), jnp.asarray(gt),
                                    jnp.asarray(mask)))


def ssim_masked(img, gt, mask):
    return float(losses.masked_ssim(jnp.asarray(img), jnp.asarray(gt),
                                    jnp.asarray(mask)))


def inverse_depth_errors(pred_invdepth, gt_invdepth, valid_mask):
    """(iMAE, iRMSE) with the reference's normalization: both maps are
    mask-multiplied and the error sums divide by the mask pixel count."""
    m = jnp.asarray(valid_mask, jnp.float32)
    p = jnp.asarray(pred_invdepth) * m
    g = jnp.asarray(gt_invdepth) * m
    denom = jnp.maximum(jnp.sum(m), 1.0)
    imae = jnp.sum(jnp.abs(p - g)) / denom
    irmse = jnp.sqrt(jnp.sum((p - g) ** 2) / denom)
    return float(imae), float(irmse)


def lpips(img, gt, net_type: str = "vgg", mask=None) -> float:
    """LPIPS perceptual distance of two [3,H,W] images in [0,1]; with
    ``mask`` [1,H,W], the per-level distance maps are weighted by the
    downsampled mask (the fork's masked-LPIPS semantics,
    ``lpipsPyTorch/modules/lpips.py:32-60``).

    Delegates to the JAX-native VGG backbone (``lpips_jax``): with a
    converted official checkpoint on disk the numbers are the real
    calibrated LPIPS; otherwise a deterministic random-feature fallback is
    used (relative comparisons only — ``lpips_jax.weights_kind()``)."""
    from . import lpips_jax

    return lpips_jax.lpips(img, gt, mask=mask)


def full_metrics(image, gt, alpha_mask=None, pred_invdepth=None,
                 gt_invdepth=None, with_lpips: bool = True) -> dict:
    """The per-view metric row of ``render_hierarchy.py`` evals."""
    img = np.clip(np.asarray(image), 0, 1)
    g = np.clip(np.asarray(gt), 0, 1)
    if alpha_mask is not None:
        img = img * np.asarray(alpha_mask)
        g = g * np.asarray(alpha_mask)
    out = {"psnr": psnr(img, g), "ssim": ssim(img, g)}
    if with_lpips:
        out["lpips"] = lpips(img, g)
    if pred_invdepth is not None and gt_invdepth is not None:
        valid = (np.asarray(alpha_mask) > 0) if alpha_mask is not None \
            else np.ones_like(np.asarray(pred_invdepth), bool)
        out["imae"], out["irmse"] = inverse_depth_errors(
            pred_invdepth, gt_invdepth, valid)
    return out


def depth_band_masks(gt_invdepth, alpha_mask=None):
    """Masks for near/medium/far bands from a GT inverse-depth map
    (``render_hierarchy_final.py:295-313``): depth = 1/invdepth where
    invdepth > 0."""
    inv = np.asarray(gt_invdepth)
    valid = inv > 1e-6
    depth = np.where(valid, 1.0 / np.maximum(inv, 1e-6), np.inf)
    if alpha_mask is not None:
        valid &= np.asarray(alpha_mask) > 0
    out = {}
    for name, lo, hi in DEPTH_RANGES:
        out[name] = (valid & (depth >= lo) & (depth < hi)).astype(np.float32)
    return out


def category_masks(seg_image, category_colors: dict[str, str]):
    """Per-category masks from a color-coded segmentation image [3,H,W] in
    [0,1]; colors given as '#RRGGBB' (``render_hierarchy_final.py:21-28``)."""
    seg = np.asarray(seg_image)
    out = {}
    for name, hexcolor in category_colors.items():
        rgb = np.array([int(hexcolor[i:i + 2], 16) / 255.0
                        for i in (1, 3, 5)])
        match = (np.abs(seg - rgb[:, None, None]) < (10 / 255.0)).all(axis=0)
        out[name] = match[None].astype(np.float32)
    return out


CATEGORY_GROUPS = {
    "sky": "#87CEEB",
    "ground": "#8B4513",
    "buildings": "#696969",
    "vehicles": "#FF4500",
    "vegetation": "#228B22",
    "lamposts": "#FFD700",
}


def aggregate_pixel_weighted(rows: list[dict], weights: list[float]) -> dict:
    """Pixel-weighted metric aggregation across views
    (``render_hierarchy_final.py:390-438``)."""
    if not rows:
        return {}
    total = sum(weights)
    if total <= 0:
        return {k: float("nan") for k in rows[0]}
    out = {}
    for k in rows[0]:
        out[k] = sum(r[k] * w for r, w in zip(rows, weights)
                     if not np.isnan(r[k])) / total
    return out
