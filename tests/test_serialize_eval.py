"""Checkpoint/stage-artifact roundtrips and eval metric sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.eval import metrics
from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
from street_sparse_3dgs_tpu.models.serialize import (load_checkpoint,
                                                     load_scene_ply,
                                                     save_checkpoint,
                                                     save_scene)
from street_sparse_3dgs_tpu.train.step import init_state


@pytest.fixture()
def state_meta():
    key = jax.random.PRNGKey(0)
    scene = make_toy_scene(seed=1, n=100, n_cameras=2)
    params, active, meta = create_from_pcd(
        key, np.asarray(scene.means3d), np.full((100, 3), 0.5), capacity=128)
    return init_state(params, active, n_images=2), meta


def test_checkpoint_roundtrip(tmp_path, state_meta):
    state, meta = state_meta
    state = state._replace(step=jnp.int32(42))
    save_checkpoint(tmp_path / "chkpnt.npz", state, meta, 42)
    state2, meta2, it = load_checkpoint(tmp_path / "chkpnt.npz")
    assert it == 42 and meta2 == meta
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scene_artifacts_roundtrip(tmp_path, state_meta):
    state, meta = state_meta
    out = save_scene(tmp_path, 100, state, meta, ["a.png", "b.png"])
    assert (out / "point_cloud.ply").exists()
    assert (tmp_path / "exposure.json").exists()
    params, skybox = load_scene_ply(out)
    assert skybox == meta.skybox_points
    n_active = int(jnp.sum(state.active))
    assert params.xyz.shape == (n_active, 3)
    np.testing.assert_allclose(np.asarray(params.xyz),
                               np.asarray(state.params.xyz[:n_active]),
                               atol=1e-6)


def test_metrics_basic():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    assert metrics.psnr(img, img) > 60
    assert metrics.ssim(img, img) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(img + 0.1 * rng.normal(size=img.shape), 0, 1) \
        .astype(np.float32)
    assert metrics.psnr(img, noisy) < metrics.psnr(img, img)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, :16] = 1.0
    half_noisy = img.copy()
    half_noisy[:, 16:] = 0.0  # corrupt only the masked-out half
    assert metrics.psnr_masked(img, half_noisy, mask) > 60


def test_inverse_depth_errors():
    pred = np.full((1, 8, 8), 0.5, np.float32)
    gt = np.full((1, 8, 8), 0.3, np.float32)
    mask = np.ones((1, 8, 8), bool)
    imae, irmse = metrics.inverse_depth_errors(pred, gt, mask)
    assert imae == pytest.approx(0.2, abs=1e-6)
    assert irmse == pytest.approx(0.2, abs=1e-6)
    # Half-masked: same values (errors uniform).
    mask[:, :, 4:] = False
    imae2, _ = metrics.inverse_depth_errors(pred, gt, mask)
    assert imae2 == pytest.approx(0.2, abs=1e-6)


def test_depth_bands():
    inv = np.zeros((1, 4, 4), np.float32)
    inv[0, 0] = 1.0 / 2.0     # near (2 m)
    inv[0, 1] = 1.0 / 10.0    # medium
    inv[0, 2] = 1.0 / 50.0    # far
    bands = metrics.depth_band_masks(inv)
    assert bands["near"][0, 0].all() and not bands["near"][0, 1].any()
    assert bands["medium"][0, 1].all()
    assert bands["far"][0, 2].all()
    assert not bands["far"][0, 3].any()  # invalid (invdepth 0) excluded


def test_category_masks():
    seg = np.zeros((3, 4, 4), np.float32)
    sky_rgb = [0x87 / 255, 0xCE / 255, 0xEB / 255]
    for c in range(3):
        seg[c, :2] = sky_rgb[c]
    masks = metrics.category_masks(seg, {"sky": "#87CEEB"})
    assert masks["sky"][0, :2].all() and not masks["sky"][0, 2:].any()


def test_aggregate_pixel_weighted():
    rows = [{"psnr": 10.0}, {"psnr": 20.0}]
    out = metrics.aggregate_pixel_weighted(rows, [1.0, 3.0])
    assert out["psnr"] == pytest.approx(17.5)


def test_packed_bin_roundtrip_and_layout(tmp_path, state_meta):
    """point_cloud.bin fast format: roundtrip plus the exact byte layout of
    the reference writer (scene/gaussian_model.py:473-506)."""
    from street_sparse_3dgs_tpu.models.serialize import (load_packed_bin,
                                                         save_packed_bin)

    state, meta = state_meta
    path = tmp_path / "point_cloud.bin"
    save_packed_bin(path, state.params, np.asarray(state.active))
    got = load_packed_bin(path)
    n = int(jnp.sum(state.active))
    for name in got._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(state.params, name)[:n]))

    raw = path.read_bytes()
    assert int(np.frombuffer(raw, np.int32, 1)[0]) == n
    k = state.params.features_rest.shape[1] + 1
    floats = 3 + 3 * k + 1 + 3 + 4
    assert len(raw) == 4 + 4 * floats * n
    xyz = np.frombuffer(raw, np.float32, 3 * n, offset=4).reshape(n, 3)
    np.testing.assert_array_equal(xyz, np.asarray(state.params.xyz[:n]))
    # First feature row = DC band then rest, torch cat(dim=1) row order.
    f0 = np.frombuffer(raw, np.float32, 3 * k, offset=4 + 12 * n)
    want = np.concatenate([np.asarray(state.params.features_dc[0]),
                           np.asarray(state.params.features_rest[0])]).ravel()
    np.testing.assert_array_equal(f0, want)


def test_packed_bin_rejects_corrupt_file(tmp_path):
    import pytest

    from street_sparse_3dgs_tpu.models.serialize import load_packed_bin

    bad = tmp_path / "point_cloud.bin"
    bad.write_bytes(np.int32(7).tobytes() + np.zeros(100, np.float32).tobytes())
    with pytest.raises(ValueError, match="corrupt"):
        load_packed_bin(bad)


def test_group_cameras_by_center():
    """render_position groups panorama faces by shared (rounded) camera
    center (reference render_position.py:20-45)."""
    from types import SimpleNamespace

    from street_sparse_3dgs_tpu.eval.render_position import (
        group_cameras_by_center)

    def cam(center, yaw):
        c, s_ = np.cos(yaw), np.sin(yaw)
        r_wc = np.array([[c, -s_, 0.0], [s_, c, 0.0], [0.0, 0.0, 1.0]])
        t = -r_wc @ np.asarray(center, np.float64)
        # readers store R as the camera-to-world rotation (R = R_wc.T)
        return SimpleNamespace(R=r_wc.T, T=t)

    infos = [cam([1.0, 2.0, 0.5], yaw) for yaw in (0.0, 1.0, 2.0)] \
        + [cam([5.0, 2.0, 0.5], yaw) for yaw in (0.0, 1.0)] \
        + [cam([1.0, 2.0001, 0.5], 3.0)]     # rounds into group 1
    groups = group_cameras_by_center(infos)
    sizes = sorted(len(v) for v in groups.values())
    assert len(groups) == 2 and sizes == [2, 4]
    for key, members in groups.items():
        for _, center in members:
            np.testing.assert_allclose(np.round(center, 2), key, atol=1e-9)
