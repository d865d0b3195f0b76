"""JAX-native LPIPS — ``lpipsPyTorch/modules/{lpips,networks}.py`` analog.

The reference evaluates LPIPS through torch+torchvision with the official
calibration: a frozen VGG16, per-level unit-normalized feature differences,
and learned per-channel 1×1 "lin" weights (``lpips.py:32-60``).  Here the
whole metric is a pure-JAX function (NCHW ``lax.conv``), so it jits onto
the TPU and batches across eval views instead of running torch on the host
CPU.

Weights resolve in priority order:

1. an ``.npz`` bundle (``LPIPS_WEIGHTS`` env var, explicit path argument,
   or ``~/.cache/street_sparse_3dgs_tpu/lpips_vgg.npz``) holding the VGG
   conv stack + lin weights — produce one from the official torch
   checkpoints with :func:`convert_torch_checkpoints` (torch can unpickle
   them; torchvision itself is not needed);
2. a documented fallback: He-initialized conv filters from a fixed PRNG
   seed and uniform lin weights.  Random-feature perceptual distances are
   stable for *relative* comparison but are NOT comparable to published
   LPIPS numbers — ``weights_kind()`` reports which mode is active and the
   eval tables tag the column.

Architecture (VGG16 features, slice points after each relu block used by
LPIPS): conv channels 64,64 | 128,128 | 256,256,256 | 512,512,512 |
512,512,512 with 2×2 max-pool between blocks; taps at relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3 (torch feature indices 4, 9, 16, 23, 30).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Per-block conv output channels; pools between blocks.
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512))
_LIN_CH = (64, 128, 256, 512, 512)

# LPIPS ScalingLayer constants (lpipsPyTorch/modules/networks.py).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_CACHE = Path("~/.cache/street_sparse_3dgs_tpu/lpips_vgg.npz")


def _default_weight_path() -> Path | None:
    env = os.environ.get("LPIPS_WEIGHTS")
    if env:
        return Path(env)
    p = _DEFAULT_CACHE.expanduser()
    return p if p.exists() else None


def _random_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic He-init VGG + uniform lin weights (fallback mode)."""
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {"kind": np.array("random")}
    cin = 3
    i = 0
    for block in _BLOCKS:
        for cout in block:
            std = np.sqrt(2.0 / (cin * 9))
            w[f"conv{i}_w"] = rng.normal(
                0, std, (cout, cin, 3, 3)).astype(np.float32)
            w[f"conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
            i += 1
    for lvl, ch in enumerate(_LIN_CH):
        w[f"lin{lvl}"] = np.full(ch, 1.0 / ch, np.float32)
    return w


@functools.lru_cache(maxsize=2)
def load_weights(path: str | None = None) -> dict:
    """Load (and cache) LPIPS weights; fall back to random features."""
    p = Path(path) if path else _default_weight_path()
    if p is not None and Path(p).exists():
        z = np.load(p)
        w = {k: z[k] for k in z.files}
        w.setdefault("kind", np.array("calibrated"))
        return w
    return _random_weights()


def weights_kind(path: str | None = None) -> str:
    """'calibrated' (real LPIPS weights loaded) or 'random' (fallback)."""
    return str(load_weights(path)["kind"])


def convert_torch_checkpoints(vgg_state_path: str | Path,
                              lin_state_path: str | Path,
                              out_path: str | Path | None = None) -> Path:
    """Convert official checkpoints to the ``.npz`` bundle.

    ``vgg_state_path``: torchvision ``vgg16-*.pth`` state dict
    (``features.N.weight/bias``); ``lin_state_path``: the lpips package's
    ``vgg.pth`` lin layers (``lin{k}.model.1.weight`` [1,C,1,1]).  Only
    torch (for unpickling) is required."""
    import torch

    vgg = torch.load(vgg_state_path, map_location="cpu",
                     weights_only=True)
    lin = torch.load(lin_state_path, map_location="cpu",
                     weights_only=True)
    out: dict[str, np.ndarray] = {"kind": np.array("calibrated")}
    # torchvision features module indices of the 13 conv layers:
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, t in enumerate(tv_idx):
        out[f"conv{i}_w"] = vgg[f"features.{t}.weight"].numpy()
        out[f"conv{i}_b"] = vgg[f"features.{t}.bias"].numpy()
    for lvl in range(5):
        key = (f"lin{lvl}.model.1.weight"
               if f"lin{lvl}.model.1.weight" in lin
               else f"lins.{lvl}.model.1.weight")
        out[f"lin{lvl}"] = np.maximum(
            lin[key].numpy().reshape(-1), 0.0)
    dest = Path(out_path) if out_path else _DEFAULT_CACHE.expanduser()
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez(dest, **out)
    load_weights.cache_clear()
    return dest


def _features(x: jnp.ndarray, w: dict) -> list[jnp.ndarray]:
    """VGG16 forward taps.  ``x``: [B,3,H,W] in [-1,1]."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    i = 0
    for bi, block in enumerate(_BLOCKS):
        for cout in block:
            # HIGH (3-pass bf16): keeps reported LPIPS comparable to the
            # torch f32 reference without HIGHEST's 6-pass cost.
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(w[f"conv{i}_w"]), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGH)
            x = x + jnp.asarray(w[f"conv{i}_b"])[None, :, None, None]
            x = jax.nn.relu(x)
            i += 1
        taps.append(x)
        if bi < len(_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
    return taps


def _distance(a: jnp.ndarray, b: jnp.ndarray, w: dict,
              mask: jnp.ndarray | None) -> jnp.ndarray:
    fa = _features(a, w)
    fb = _features(b, w)
    total = jnp.zeros(a.shape[0], a.dtype)
    for lvl, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa * jax.lax.rsqrt(
            jnp.sum(xa * xa, axis=1, keepdims=True) + 1e-10)
        nb = xb * jax.lax.rsqrt(
            jnp.sum(xb * xb, axis=1, keepdims=True) + 1e-10)
        lin = jnp.asarray(w[f"lin{lvl}"])[None, :, None, None]
        dmap = jnp.sum(lin * (na - nb) ** 2, axis=1, keepdims=True)
        if mask is not None:
            m = jax.image.resize(
                mask, (mask.shape[0], 1) + dmap.shape[-2:], "bilinear")
            total += jnp.sum(dmap * m, axis=(1, 2, 3)) / \
                jnp.clip(jnp.sum(m, axis=(1, 2, 3)), 1.0)
        else:
            total += jnp.mean(dmap, axis=(1, 2, 3))
    return total


@functools.lru_cache(maxsize=4)
def _jitted(masked: bool, path: str | None):
    w = load_weights(path)
    if masked:
        return jax.jit(lambda a, b, m: _distance(a, b, w, m))
    return jax.jit(lambda a, b: _distance(a, b, w, None))


def lpips(img, gt, mask=None, weights_path: str | None = None) -> float:
    """Perceptual distance of two [3,H,W] images in [0,1]; with ``mask``
    [1,H,W] the per-level distance maps are mask-weighted (the fork's
    masked-LPIPS semantics, ``lpipsPyTorch/modules/lpips.py:32-60``)."""
    a = jnp.asarray(np.asarray(img, np.float32))[None] * 2 - 1
    b = jnp.asarray(np.asarray(gt, np.float32))[None] * 2 - 1
    if mask is not None:
        m = jnp.asarray(np.asarray(mask, np.float32))[None]
        return float(_jitted(True, weights_path)(a, b, m)[0])
    return float(_jitted(False, weights_path)(a, b)[0])


def lpips_batch(imgs, gts, weights_path: str | None = None) -> np.ndarray:
    """Batched [B,3,H,W] LPIPS — one jit call for a whole eval sweep."""
    a = jnp.asarray(np.asarray(imgs, np.float32)) * 2 - 1
    b = jnp.asarray(np.asarray(gts, np.float32)) * 2 - 1
    return np.asarray(_jitted(False, weights_path)(a, b))
