"""JAX-native LPIPS (eval/lpips_jax.py): metric axioms, mask weighting,
checkpoint conversion against lpipsPyTorch/modules/lpips.py semantics."""

import numpy as np
import pytest

from street_sparse_3dgs_tpu.eval import lpips_jax, metrics


def imgs(seed=0, hw=(64, 64)):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (3, *hw)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_lpips_axioms():
    a, b = imgs()
    assert lpips_jax.lpips(a, a) == pytest.approx(0.0, abs=1e-5)
    d = lpips_jax.lpips(a, b)
    assert d > 1e-4
    assert lpips_jax.lpips(b, a) == pytest.approx(d, rel=1e-3)
    # More distortion -> larger distance.
    c = np.clip(a + 0.45 * np.sign(b - a), 0, 1)
    assert lpips_jax.lpips(a, c) > d


def test_lpips_mask_weighting():
    """Images identical inside the mask, different outside: the masked
    distance must be far below the unmasked one."""
    a, b = imgs(seed=1)
    half = a.copy()
    half[:, :, 32:] = b[:, :, 32:]
    mask = np.zeros((1, 64, 64), np.float32)
    mask[:, :, :32] = 1.0
    masked = lpips_jax.lpips(a, half, mask=mask)
    full = lpips_jax.lpips(a, half)
    assert masked < 0.5 * full


def test_metrics_lpips_delegates():
    a, b = imgs(seed=2)
    assert metrics.lpips(a, b) == pytest.approx(
        lpips_jax.lpips(a, b), rel=1e-4)


def test_batch_matches_single():
    a, b = imgs(seed=3, hw=(32, 32))
    c, d = imgs(seed=4, hw=(32, 32))
    batch = lpips_jax.lpips_batch(np.stack([a, c]), np.stack([b, d]))
    assert batch[0] == pytest.approx(lpips_jax.lpips(a, b), rel=1e-3)
    assert batch[1] == pytest.approx(lpips_jax.lpips(c, d), rel=1e-3)


def test_convert_torch_checkpoints(tmp_path):
    """A synthetic official-format checkpoint converts to the npz bundle,
    flips weights_kind to 'calibrated', and changes the metric."""
    torch = pytest.importorskip("torch")

    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    g = torch.Generator().manual_seed(0)
    vgg = {}
    cin = 3
    for t, c in zip(tv_idx, chans):
        vgg[f"features.{t}.weight"] = torch.randn(
            (c, cin, 3, 3), generator=g) * 0.05
        vgg[f"features.{t}.bias"] = torch.zeros(c)
        cin = c
    lin = {f"lin{k}.model.1.weight":
           torch.rand((1, ch, 1, 1), generator=g)
           for k, ch in enumerate((64, 128, 256, 512, 512))}
    torch.save(vgg, tmp_path / "vgg16.pth")
    torch.save(lin, tmp_path / "lin.pth")

    out = lpips_jax.convert_torch_checkpoints(
        tmp_path / "vgg16.pth", tmp_path / "lin.pth",
        tmp_path / "bundle.npz")
    assert lpips_jax.weights_kind(str(out)) == "calibrated"
    assert lpips_jax.weights_kind() == "random"  # default path unchanged

    a, b = imgs(seed=5, hw=(32, 32))
    d_cal = lpips_jax.lpips(a, b, weights_path=str(out))
    d_rnd = lpips_jax.lpips(a, b)
    assert d_cal > 0 and d_cal != pytest.approx(d_rnd, rel=1e-3)
