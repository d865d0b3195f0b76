"""Depth-Anything(-V2) monocular depth inference in pure JAX.

The reference pipeline shells out to the torch Depth-Anything-V2 repo for
its depth priors (`/root/reference/preprocess/generate_depth.py:27-36`).
This module is a faithful JAX port of the architecture — DINOv2 ViT
backbone + DPT neck/head — so depth priors can be generated on TPU from a
converted torch checkpoint, with no torch at inference time.

* ``convert_torch_state``: maps a torch ``state_dict`` to the JAX param
  pytree.  Two naming schemes are accepted: HuggingFace
  ``DepthAnythingForDepthEstimation`` (``backbone.* / neck.* / head.*``)
  and the original DepthAnything-V2 repo (``pretrained.* /
  depth_head.*``).
* ``infer_config``: recovers the architecture hyper-parameters from the
  state dict alone (hidden size, depth, heads must be given).
* ``dav2_forward``: jit-able inference, NCHW in, [B, H, W] inverse depth
  out.  Numerical parity with the HF torch implementation is asserted in
  ``tests/test_mono_depth_jax.py`` (random tiny checkpoint, atol 1e-4).

Weights themselves cannot be fetched in this zero-egress environment;
``preprocess/mono_depth.py`` uses this path when a checkpoint file is
available (``DEPTH_ANYTHING_CKPT``) and falls back to the external-CLI
wrapper otherwise.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DAV2Config:
    hidden: int = 384            # ViT width (vits=384, vitb=768, vitl=1024)
    layers: int = 12             # transformer depth
    heads: int = 6
    patch: int = 14
    out_indices: tuple = (2, 5, 8, 11)       # blocks whose output feeds DPT
    neck_sizes: tuple = (48, 96, 192, 384)   # reassemble channel widths
    fusion: int = 64             # DPT fusion width (vits=64, vitl=256)
    head_hidden: int = 32
    layernorm_eps: float = 1e-6


# ---------------------------------------------------------------- layers


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, p):
    return x @ p["w"].T + p["b"]


def _conv(x, p, stride=1, pad="SAME"):
    """NCHW conv with torch OIHW weights.  For stride > 1, XLA's "SAME"
    places asymmetric padding at the high edge on even inputs while torch
    pads symmetrically — use torch's explicit symmetric padding."""
    if stride > 1 and pad == "SAME":
        k = p["w"].shape[-1]
        pad = [((k - 1) // 2, (k - 1) // 2)] * 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if p.get("b") is not None:
        y = y + p["b"][None, :, None, None]
    return y


def _conv_transpose(x, p, stride):
    """ConvTranspose2d(kernel=stride, stride=stride): taps never overlap,
    so each input pixel paints one k×k output tile — expressed as an
    einsum (torch weight layout (in, out, kh, kw))."""
    b, c, h, w = x.shape
    o = p["w"].shape[1]
    y = jnp.einsum("bchw,cokl->bohkwl", x, p["w"],
                   precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(b, o, h * stride, w * stride)
    if p.get("b") is not None:
        y = y + p["b"][None, :, None, None]
    return y


def _resize_bilinear_ac(x, out_hw):
    """Bilinear resize with ``align_corners=True`` (torch semantics; JAX's
    ``jax.image.resize`` only implements half-pixel centers)."""
    b, c, h, w = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,), jnp.float32)
        else:
            pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / \
                (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = pos - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, fy = axis_weights(h, oh)
    xlo, xhi, fx = axis_weights(w, ow)
    top = x[:, :, ylo, :] * (1 - fy)[None, None, :, None] + \
        x[:, :, yhi, :] * fy[None, None, :, None]
    out = top[:, :, :, xlo] * (1 - fx)[None, None, None, :] + \
        top[:, :, :, xhi] * fx[None, None, None, :]
    return out


def _resize_bicubic_torch(x, out_hw):
    """[1, H, W, C] → [1, oh, ow, C] bicubic with torch semantics: cubic
    convolution A = −0.75, half-pixel centers (align_corners=False),
    border-replicated taps.  (jax.image.resize's cubic kernel is Keys
    a = −0.5 — close but not bit-matching torch's pos-embed resampling.)"""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    a = -0.75

    def cubic(d):
        d = jnp.abs(d)
        return jnp.where(
            d <= 1.0, ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0,
            jnp.where(d < 2.0, (((d - 5.0) * d + 8.0) * d - 4.0) * a, 0.0))

    def taps(n_in, n_out):
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) \
            - 0.5
        i0 = jnp.floor(src).astype(jnp.int32)
        t = src - i0
        idx = [jnp.clip(i0 + k, 0, n_in - 1) for k in (-1, 0, 1, 2)]
        wts = [cubic(t + 1.0), cubic(t), cubic(1.0 - t), cubic(2.0 - t)]
        return idx, wts

    yi, yw = taps(h, oh)
    xi, xw = taps(w, ow)
    rows = sum(x[:, yi[k]] * yw[k][None, :, None, None] for k in range(4))
    return sum(rows[:, :, xi[k]] * xw[k][None, None, :, None]
               for k in range(4))


def _attention(x, p, heads):
    b, n, d = x.shape
    hd = d // heads

    def split(v):
        return v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    q = split(_linear(x, p["q"]))
    k = split(_linear(x, p["k"]))
    v = split(_linear(x, p["v"]))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        precision=jax.lax.Precision.HIGHEST) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return _linear(out, p["proj"])


def _vit_block(x, p, cfg):
    h = _layer_norm(x, p["norm1_w"], p["norm1_b"], cfg.layernorm_eps)
    x = x + _attention(h, p["attn"], cfg.heads) * p["ls1"]
    h = _layer_norm(x, p["norm2_w"], p["norm2_b"], cfg.layernorm_eps)
    h = _linear(h, p["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p["fc2"])
    return x + h * p["ls2"]


def _residual_unit(x, p):
    h = jax.nn.relu(x)
    h = _conv(h, p["conv1"])
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"])
    return x + h


# ---------------------------------------------------------------- forward


def dav2_forward(params, cfg: DAV2Config, pixels: jnp.ndarray) -> jnp.ndarray:
    """``pixels`` [B, 3, H, W] (ImageNet-normalized, H/W multiples of the
    patch size) → relative inverse depth [B, H, W] (larger = closer)."""
    b, _, h, w = pixels.shape
    ph, pw = h // cfg.patch, w // cfg.patch
    emb = params["embed"]
    x = _conv(pixels, emb["patch"], stride=cfg.patch, pad="VALID")
    x = x.reshape(b, cfg.hidden, ph * pw).transpose(0, 2, 1)   # [B, N, D]
    cls = jnp.broadcast_to(emb["cls"], (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1)
    pos = emb["pos"]                                           # [1, 1+n, D]
    if pos.shape[1] != x.shape[1]:
        # Checkpoint trained at another resolution: bicubic-resample the
        # patch position grid (HF/DINOv2 interpolate_pos_encoding).
        n_ck = pos.shape[1] - 1
        side = int(round(np.sqrt(n_ck)))
        grid = pos[:, 1:].reshape(1, side, side, cfg.hidden)
        grid = _resize_bicubic_torch(grid, (ph, pw))
        pos = jnp.concatenate(
            [pos[:, :1], grid.reshape(1, ph * pw, cfg.hidden)], axis=1)
    x = x + pos

    feats = []
    want = set(cfg.out_indices)
    for i, blk in enumerate(params["blocks"]):
        x = _vit_block(x, blk, cfg)
        if i in want:
            feats.append(x)

    # DPT neck: per-stage layernorm (HF backbone semantics), drop cls,
    # reassemble to pyramid resolutions, 3x3 project, top-down fusion.
    maps = []
    for i, f in enumerate(feats):
        f = _layer_norm(f, params["final_norm_w"], params["final_norm_b"],
                        cfg.layernorm_eps)
        fmap = f[:, 1:].transpose(0, 2, 1).reshape(b, cfg.hidden, ph, pw)
        fmap = _conv(fmap, params["project"][i], pad="VALID")
        if i == 0:
            fmap = _conv_transpose(fmap, params["resize"][0], 4)
        elif i == 1:
            fmap = _conv_transpose(fmap, params["resize"][1], 2)
        elif i == 3:
            fmap = _conv(fmap, params["resize"][3], stride=2)
        maps.append(_conv(fmap, {"w": params["rn"][i], "b": None}))

    fused = None
    for i in (3, 2, 1, 0):
        fl = params["fusion"][i]
        cur = maps[i]
        if fused is None:
            fused = cur
        else:
            fused = fused + _residual_unit(cur, fl["res1"])
        fused = _residual_unit(fused, fl["res2"])
        size = maps[i - 1].shape[2:] if i > 0 else \
            (fused.shape[2] * 2, fused.shape[3] * 2)
        fused = _resize_bilinear_ac(fused, size)
        fused = _conv(fused, fl["proj"], pad="VALID")

    hd = params["head"]
    out = _conv(fused, hd["conv1"])
    out = _resize_bilinear_ac(out, (ph * cfg.patch, pw * cfg.patch))
    out = _conv(out, hd["conv2"])
    out = jax.nn.relu(out)
    out = _conv(out, hd["conv3"], pad="VALID")
    out = jax.nn.relu(out)
    return out[:, 0]


# ----------------------------------------------------------- conversion


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def infer_config(sd: dict, heads: int | None = None) -> DAV2Config:
    """Recover the architecture from a state dict (either naming)."""
    hf = any(k.startswith("backbone.") for k in sd)
    pre = "backbone.encoder.layer." if hf else "pretrained.blocks."
    layer_ids = {int(m.group(1)) for k in sd
                 if (m := re.match(re.escape(pre) + r"(\d+)\.", k))}
    layers = max(layer_ids) + 1
    cls = _to_np(sd["backbone.embeddings.cls_token" if hf
                    else "pretrained.cls_token"])
    hidden = cls.shape[-1]
    proj_key = ("neck.reassemble_stage.layers.{}.projection.weight" if hf
                else "depth_head.projects.{}.weight")
    neck = tuple(_to_np(sd[proj_key.format(i)]).shape[0] for i in range(4))
    fusion_key = ("neck.convs.0.weight" if hf
                  else "depth_head.scratch.layer1_rn.weight")
    fusion = _to_np(sd[fusion_key]).shape[0]
    head_key = "head.conv1.weight" if hf else \
        "depth_head.scratch.output_conv1.weight"
    head_hidden = _to_np(sd[head_key]).shape[0]
    patch_w = _to_np(sd["backbone.embeddings.patch_embeddings.projection"
                        ".weight" if hf else
                        "pretrained.patch_embed.proj.weight"])
    if heads is None:
        heads = {384: 6, 768: 12, 1024: 16}.get(hidden, max(1, hidden // 64))
    # Standard intermediate taps: evenly spaced across depth (matches
    # vits/vitb [2,5,8,11] and vitl [4,11,17,23]).
    step = layers // 4
    out_idx = tuple(step * (i + 1) - 1 for i in range(4))
    return DAV2Config(hidden=hidden, layers=layers, heads=heads,
                      patch=patch_w.shape[-1], out_indices=out_idx,
                      neck_sizes=neck, fusion=fusion,
                      head_hidden=head_hidden)


def convert_torch_state(sd: dict, cfg: DAV2Config | None = None):
    """torch ``state_dict`` → (params, cfg).  Accepts HF
    ``DepthAnythingForDepthEstimation`` naming and the original
    Depth-Anything-V2 repo naming."""
    sd = {k: v for k, v in sd.items()}
    if cfg is None:
        cfg = infer_config(sd)
    hf = any(k.startswith("backbone.") for k in sd)
    g = lambda k: jnp.asarray(_to_np(sd[k]))

    def lin(prefix):
        return {"w": g(prefix + ".weight"), "b": g(prefix + ".bias")}

    def conv(prefix, bias=True):
        return {"w": g(prefix + ".weight"),
                "b": g(prefix + ".bias") if bias else None}

    params: dict[str, Any] = {}
    if hf:
        e = "backbone.embeddings."
        params["embed"] = {
            "cls": g(e + "cls_token")[0],
            "pos": g(e + "position_embeddings"),
            "patch": conv(e + "patch_embeddings.projection"),
        }
        blocks = []
        for i in range(cfg.layers):
            p = f"backbone.encoder.layer.{i}."
            blocks.append({
                "norm1_w": g(p + "norm1.weight"),
                "norm1_b": g(p + "norm1.bias"),
                "attn": {
                    "q": lin(p + "attention.attention.query"),
                    "k": lin(p + "attention.attention.key"),
                    "v": lin(p + "attention.attention.value"),
                    "proj": lin(p + "attention.output.dense"),
                },
                "ls1": g(p + "layer_scale1.lambda1"),
                "norm2_w": g(p + "norm2.weight"),
                "norm2_b": g(p + "norm2.bias"),
                "fc1": lin(p + "mlp.fc1"),
                "fc2": lin(p + "mlp.fc2"),
                "ls2": g(p + "layer_scale2.lambda1"),
            })
        params["blocks"] = blocks
        params["final_norm_w"] = g("backbone.layernorm.weight")
        params["final_norm_b"] = g("backbone.layernorm.bias")
        params["project"] = [
            conv(f"neck.reassemble_stage.layers.{i}.projection")
            for i in range(4)]
        params["resize"] = {
            0: conv("neck.reassemble_stage.layers.0.resize"),
            1: conv("neck.reassemble_stage.layers.1.resize"),
            3: conv("neck.reassemble_stage.layers.3.resize"),
        }
        params["rn"] = [g(f"neck.convs.{i}.weight") for i in range(4)]
        params["fusion"] = [
            {"proj": conv(f"neck.fusion_stage.layers.{j}.projection"),
             "res1": {
                 "conv1": conv(
                     f"neck.fusion_stage.layers.{j}.residual_layer1"
                     ".convolution1"),
                 "conv2": conv(
                     f"neck.fusion_stage.layers.{j}.residual_layer1"
                     ".convolution2")},
             "res2": {
                 "conv1": conv(
                     f"neck.fusion_stage.layers.{j}.residual_layer2"
                     ".convolution1"),
                 "conv2": conv(
                     f"neck.fusion_stage.layers.{j}.residual_layer2"
                     ".convolution2")}}
            # HF fusion_stage.layers run top-down: layers.0 consumes the
            # DEEPEST map — our loop indexes by stage, so reverse.
            for j in (3, 2, 1, 0)]
        params["head"] = {
            "conv1": conv("head.conv1"),
            "conv2": conv("head.conv2"),
            "conv3": conv("head.conv3"),
        }
    else:
        params["embed"] = {
            "cls": g("pretrained.cls_token")[0],
            "pos": g("pretrained.pos_embed"),
            "patch": conv("pretrained.patch_embed.proj"),
        }
        blocks = []
        for i in range(cfg.layers):
            p = f"pretrained.blocks.{i}."
            qkv_w = _to_np(sd[p + "attn.qkv.weight"])
            qkv_b = _to_np(sd[p + "attn.qkv.bias"])
            d = cfg.hidden
            blocks.append({
                "norm1_w": g(p + "norm1.weight"),
                "norm1_b": g(p + "norm1.bias"),
                "attn": {
                    "q": {"w": jnp.asarray(qkv_w[:d]),
                          "b": jnp.asarray(qkv_b[:d])},
                    "k": {"w": jnp.asarray(qkv_w[d:2 * d]),
                          "b": jnp.asarray(qkv_b[d:2 * d])},
                    "v": {"w": jnp.asarray(qkv_w[2 * d:]),
                          "b": jnp.asarray(qkv_b[2 * d:])},
                    "proj": lin(p + "attn.proj"),
                },
                "ls1": g(p + "ls1.gamma"),
                "norm2_w": g(p + "norm2.weight"),
                "norm2_b": g(p + "norm2.bias"),
                "fc1": lin(p + "mlp.fc1"),
                "fc2": lin(p + "mlp.fc2"),
                "ls2": g(p + "ls2.gamma"),
            })
        params["blocks"] = blocks
        params["final_norm_w"] = g("pretrained.norm.weight")
        params["final_norm_b"] = g("pretrained.norm.bias")
        params["project"] = [conv(f"depth_head.projects.{i}")
                             for i in range(4)]
        params["resize"] = {
            0: conv("depth_head.resize_layers.0"),
            1: conv("depth_head.resize_layers.1"),
            3: conv("depth_head.resize_layers.3"),
        }
        params["rn"] = [g(f"depth_head.scratch.layer{i + 1}_rn.weight")
                        for i in range(4)]
        params["fusion"] = [
            {"proj": conv(f"depth_head.scratch.refinenet{i + 1}.out_conv"),
             "res1": {
                 "conv1": conv(f"depth_head.scratch.refinenet{i + 1}"
                               ".resConfUnit1.conv1"),
                 "conv2": conv(f"depth_head.scratch.refinenet{i + 1}"
                               ".resConfUnit1.conv2")},
             "res2": {
                 "conv1": conv(f"depth_head.scratch.refinenet{i + 1}"
                               ".resConfUnit2.conv1"),
                 "conv2": conv(f"depth_head.scratch.refinenet{i + 1}"
                               ".resConfUnit2.conv2")}}
            for i in range(4)]
        params["head"] = {
            "conv1": conv("depth_head.scratch.output_conv1"),
            "conv2": conv("depth_head.scratch.output_conv2.0"),
            "conv3": conv("depth_head.scratch.output_conv2.2"),
        }
    return params, cfg


def load_checkpoint(path):
    """Load a Depth-Anything torch checkpoint (``.pth``/``.pt``/``.bin``,
    unpickled via torch which is only needed here) or a previously
    converted ``.npz``."""
    path = str(path)
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        sd = {k: v for k, v in flat.items()}
        return convert_torch_state(sd)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state(sd)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_image(img_hw3: np.ndarray, target: int = 518):
    """uint8/float HWC RGB → normalized [1, 3, H', W'] with H', W' the
    nearest multiples of 14 after scaling the short side to ``target``
    (the DA-V2 inference transform)."""
    img = np.asarray(img_hw3, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    scale = target / min(h, w)
    nh = max(14, int(round(h * scale / 14)) * 14)
    nw = max(14, int(round(w * scale / 14)) * 14)
    x = jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return jnp.transpose(x, (2, 0, 1))[None], (h, w)


def infer_inverse_depth(params, cfg, img_hw3: np.ndarray,
                        target: int = 518) -> np.ndarray:
    """End-to-end single-image inference back at the input resolution."""
    x, (h, w) = preprocess_image(img_hw3, target)
    d = dav2_forward(params, cfg, x)                       # [1, H', W']
    d = jax.image.resize(d[0], (h, w), "bilinear")
    return np.asarray(d)
