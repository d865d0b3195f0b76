"""Numerical parity of the JAX Depth-Anything port against the canonical
torch implementation (transformers' DepthAnythingForDepthEstimation), the
original-repo naming converter, and the end-to-end 16-bit PNG contract
(reference `preprocess/generate_depth.py:27-36`)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from street_sparse_3dgs_tpu.preprocess import depth_anything_jax as daj


def tiny_torch_model(heads=2, seed=42):
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    bb = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=heads, intermediate_size=64,
                      patch_size=14, image_size=70,
                      out_features=["stage1", "stage2", "stage3", "stage4"],
                      out_indices=[1, 2, 3, 4], reshape_hidden_states=False)
    cfg = DepthAnythingConfig(backbone_config=bb, fusion_hidden_size=16,
                              reassemble_hidden_size=32,
                              neck_hidden_sizes=[8, 12, 16, 16],
                              head_hidden_size=8, patch_size=14,
                              reassemble_factors=[4, 2, 1, 0.5])
    m = DepthAnythingForDepthEstimation(cfg).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for v in m.state_dict().values():
            v.copy_(torch.randn(v.shape, generator=g) * 0.25)
    return m


JCFG = daj.DAV2Config(hidden=32, layers=4, heads=2, patch=14,
                      out_indices=(0, 1, 2, 3), neck_sizes=(8, 12, 16, 16),
                      fusion=16, head_hidden=8)


def test_hf_torch_parity_nonsquare_with_pos_interp():
    """JAX forward == torch forward to float tolerance, at a non-square
    resolution that exercises the bicubic pos-embed resampling, the
    stride-2 reassemble conv's even-size padding, and all fusion
    upsamples."""
    m = tiny_torch_model()
    x = torch.randn(1, 3, 70, 84, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = m(pixel_values=x).predicted_depth.numpy()
    params, _ = daj.convert_torch_state(m.state_dict())
    out = np.asarray(daj.dav2_forward(params, JCFG, np.asarray(x.numpy())))
    scale = np.abs(ref).max()
    assert scale > 1.0                       # non-degenerate activations
    np.testing.assert_allclose(out, ref, atol=1e-4 * scale)


def _to_original_naming(sd, layers=4, hidden=32):
    """HF state dict → the original Depth-Anything-V2 repo naming."""
    out = {}
    out["pretrained.cls_token"] = sd["backbone.embeddings.cls_token"]
    out["pretrained.pos_embed"] = sd["backbone.embeddings.position_embeddings"]
    out["pretrained.patch_embed.proj.weight"] = \
        sd["backbone.embeddings.patch_embeddings.projection.weight"]
    out["pretrained.patch_embed.proj.bias"] = \
        sd["backbone.embeddings.patch_embeddings.projection.bias"]
    for i in range(layers):
        h = f"backbone.encoder.layer.{i}."
        p = f"pretrained.blocks.{i}."
        out[p + "norm1.weight"] = sd[h + "norm1.weight"]
        out[p + "norm1.bias"] = sd[h + "norm1.bias"]
        out[p + "attn.qkv.weight"] = torch.cat(
            [sd[h + f"attention.attention.{k}.weight"]
             for k in ("query", "key", "value")])
        out[p + "attn.qkv.bias"] = torch.cat(
            [sd[h + f"attention.attention.{k}.bias"]
             for k in ("query", "key", "value")])
        out[p + "attn.proj.weight"] = sd[h + "attention.output.dense.weight"]
        out[p + "attn.proj.bias"] = sd[h + "attention.output.dense.bias"]
        out[p + "ls1.gamma"] = sd[h + "layer_scale1.lambda1"]
        out[p + "norm2.weight"] = sd[h + "norm2.weight"]
        out[p + "norm2.bias"] = sd[h + "norm2.bias"]
        out[p + "mlp.fc1.weight"] = sd[h + "mlp.fc1.weight"]
        out[p + "mlp.fc1.bias"] = sd[h + "mlp.fc1.bias"]
        out[p + "mlp.fc2.weight"] = sd[h + "mlp.fc2.weight"]
        out[p + "mlp.fc2.bias"] = sd[h + "mlp.fc2.bias"]
        out[p + "ls2.gamma"] = sd[h + "layer_scale2.lambda1"]
    out["pretrained.norm.weight"] = sd["backbone.layernorm.weight"]
    out["pretrained.norm.bias"] = sd["backbone.layernorm.bias"]
    for i in range(4):
        out[f"depth_head.projects.{i}.weight"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.weight"]
        out[f"depth_head.projects.{i}.bias"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.bias"]
        if i != 2:
            out[f"depth_head.resize_layers.{i}.weight"] = \
                sd[f"neck.reassemble_stage.layers.{i}.resize.weight"]
            out[f"depth_head.resize_layers.{i}.bias"] = \
                sd[f"neck.reassemble_stage.layers.{i}.resize.bias"]
        out[f"depth_head.scratch.layer{i + 1}_rn.weight"] = \
            sd[f"neck.convs.{i}.weight"]
    # HF fusion_stage.layers.0 consumes the DEEPEST map == refinenet4.
    for j, rn in zip(range(4), (4, 3, 2, 1)):
        h = f"neck.fusion_stage.layers.{j}."
        p = f"depth_head.scratch.refinenet{rn}."
        out[p + "out_conv.weight"] = sd[h + "projection.weight"]
        out[p + "out_conv.bias"] = sd[h + "projection.bias"]
        for a, b in (("resConfUnit1", "residual_layer1"),
                     ("resConfUnit2", "residual_layer2")):
            for c in (1, 2):
                out[f"{p}{a}.conv{c}.weight"] = \
                    sd[f"{h}{b}.convolution{c}.weight"]
                out[f"{p}{a}.conv{c}.bias"] = \
                    sd[f"{h}{b}.convolution{c}.bias"]
    out["depth_head.scratch.output_conv1.weight"] = sd["head.conv1.weight"]
    out["depth_head.scratch.output_conv1.bias"] = sd["head.conv1.bias"]
    out["depth_head.scratch.output_conv2.0.weight"] = sd["head.conv2.weight"]
    out["depth_head.scratch.output_conv2.0.bias"] = sd["head.conv2.bias"]
    out["depth_head.scratch.output_conv2.2.weight"] = sd["head.conv3.weight"]
    out["depth_head.scratch.output_conv2.2.bias"] = sd["head.conv3.bias"]
    return out


def test_original_repo_naming_converter_agrees():
    m = tiny_torch_model()
    sd_orig = _to_original_naming(m.state_dict())
    p_hf, _ = daj.convert_torch_state(m.state_dict())
    p_or, _ = daj.convert_torch_state(sd_orig)
    x = np.random.default_rng(0).normal(size=(1, 3, 70, 70)).astype(
        np.float32)
    a = np.asarray(daj.dav2_forward(p_hf, JCFG, x))
    b = np.asarray(daj.dav2_forward(p_or, JCFG, x))
    np.testing.assert_allclose(b, a, atol=1e-5 * (np.abs(a).max() + 1e-9))


def test_generate_depth_jax_png_contract(tmp_path):
    """End-to-end: torch checkpoint file -> converted JAX inference ->
    16-bit inverse-depth PNGs mirroring the image tree (the reference
    generate_depth.py output contract)."""
    from PIL import Image

    from street_sparse_3dgs_tpu.preprocess.mono_depth import generate_depth

    # heads=1 so infer_config's heads heuristic is exact for hidden=32.
    m = tiny_torch_model(heads=1)
    ckpt = tmp_path / "da_tiny.pth"
    torch.save(_to_original_naming(m.state_dict()), ckpt)

    images = tmp_path / "images" / "cam0"
    images.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for name in ("a.png", "b.jpg"):
        Image.fromarray(rng.integers(0, 255, (40, 52, 3), dtype=np.uint8),
                        "RGB").save(images / name)

    out_dir = tmp_path / "depths"
    os.environ["DEPTH_ANYTHING_CKPT"] = str(ckpt)
    os.environ["DEPTH_ANYTHING_TARGET"] = "42"   # tiny inference res
    try:
        n = generate_depth(tmp_path / "images", out_dir)
    finally:
        del os.environ["DEPTH_ANYTHING_CKPT"]
        del os.environ["DEPTH_ANYTHING_TARGET"]
    assert n == 2
    for name in ("a.png", "b.png"):
        arr = np.asarray(Image.open(out_dir / "cam0" / name))
        assert arr.dtype == np.uint16 and arr.shape == (40, 52)
        assert arr.max() == 65535          # per-image normalization
