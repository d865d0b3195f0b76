"""Training losses: L1, SSIM (plain + masked), depth terms, PSNR.

Parity targets in the reference:
  - ``utils/loss_utils.py:33-63``: SSIM with an 11×11 σ=1.5 Gaussian window,
    per-channel depthwise convolution, C1=0.01², C2=0.03²;
  - ``utils/loss_utils.py:65-155``: masked SSIM with per-window valid-pixel
    renormalisation;
  - ``train_single.py:121-161``: photometric (1-λ)L1 + λ(1-SSIM), inverse-
    depth L1 with exponentially decayed weight, depth-only hinge loss
    ``clamp(mono − pred, min=0)`` mixed by ``additional_depth_maps_weight``;
  - ``utils/image_utils.py``: psnr / masked psnr.

The SSIM window convolution is expressed as two separable 1-D convolutions
(the reference uses a full 11×11 kernel; separability is exact for a Gaussian
and maps better onto TPU convolution tiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float):
    # numpy on purpose: this is a compile-time constant (an lru-cached traced
    # array would leak tracers across jit scopes).
    x = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / np.sum(g)


def _blur(img: jnp.ndarray, window_size: int = 11,
          sigma: float = 1.5) -> jnp.ndarray:
    """Depthwise Gaussian blur of a [C,H,W] image with SAME (zero) padding —
    matching torch's conv2d(padding=window_size//2) behavior."""
    w = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    c = img.shape[0]
    x = img[:, None]                                     # [C,1,H,W]
    ky = w.reshape(1, 1, window_size, 1)
    kx = w.reshape(1, 1, 1, window_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, ky.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    # HIGHEST: TPU conv default is bf16 MXU passes — the SSIM window sums
    # feed the training loss, keep them true f32 (same class as the MXU
    # dot-precision fixes in ops/).
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn, precision=hi)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn, precision=hi)
    return x[:, 0]                                       # [C,H,W]


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM of two [C,H,W] images (reference ``_ssim``)."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu12
    return (((2.0 * mu12 + _C1) * (2.0 * sigma12 + _C2))
            / ((mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    return jnp.mean(ssim_map(img1, img2, window_size))


def masked_ssim(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray,
                window_size: int = 11) -> jnp.ndarray:
    """SSIM averaged over valid pixels only, with each window's statistics
    renormalised by its valid-pixel fraction (reference
    ``utils/loss_utils.py:65-155``)."""
    m = jnp.broadcast_to(mask, img1.shape).astype(img1.dtype)
    frac = _blur(m, window_size)                         # valid fraction/window
    frac_safe = jnp.maximum(frac, 1e-8)

    def wmean(x):
        return _blur(x * m, window_size) / frac_safe

    mu1, mu2 = wmean(img1), wmean(img2)
    sigma1_sq = wmean(img1 * img1) - mu1 * mu1
    sigma2_sq = wmean(img2 * img2) - mu2 * mu2
    sigma12 = wmean(img1 * img2) - mu1 * mu2
    smap = (((2.0 * mu1 * mu2 + _C1) * (2.0 * sigma12 + _C2))
            / ((mu1 * mu1 + mu2 * mu2 + _C1)
               * (sigma1_sq + sigma2_sq + _C2)))
    valid = m > 0.0
    return jnp.sum(jnp.where(valid, smap, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(img1.dtype)), 1.0)


def photometric(image: jnp.ndarray, gt: jnp.ndarray,
                lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM) (``train_single.py:121-123``)."""
    return ((1.0 - lambda_dssim) * l1(image, gt)
            + lambda_dssim * (1.0 - ssim(image, gt)))


def depth_l1(inv_depth: jnp.ndarray, mono_invdepth: jnp.ndarray,
             depth_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked inverse-depth L1 (``train_single.py:139``; mean over ALL pixels,
    mask simply zeroes invalid ones — reference semantics)."""
    return jnp.mean(jnp.abs((inv_depth - mono_invdepth) * depth_mask))


def depth_hinge(inv_depth: jnp.ndarray,
                mono_invdepth: jnp.ndarray) -> jnp.ndarray:
    """Densification hinge for depth-only cameras: penalise rendering
    *farther* than the LiDAR depth (``train_single.py:152``:
    ``(mono − pred).clamp(min=0).mean()``)."""
    return jnp.mean(jnp.maximum(mono_invdepth - inv_depth, 0.0))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def psnr_masked(img1: jnp.ndarray, img2: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Per-channel masked MSE → PSNR (reference ``utils/image_utils.py``)."""
    m = jnp.broadcast_to(mask, img1.shape)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    mse = jnp.sum(jnp.where(m > 0, (img1 - img2) ** 2, 0.0)) / denom
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
