"""Data layer: COLMAP bin/text roundtrips, PLY roundtrips, scene loading
from a synthesized COLMAP directory (incl. depth-only cameras and depth
params), resolution policy."""

import json
import numpy as np
import pytest

from street_sparse_3dgs_tpu.config import ModelConfig
from street_sparse_3dgs_tpu.data import colmap
from street_sparse_3dgs_tpu.data.ply import (fetch_point_cloud,
                                             load_gaussian_ply, read_ply,
                                             save_gaussian_ply,
                                             store_point_cloud, write_ply)
from street_sparse_3dgs_tpu.data.scene import (CameraStream,
                                               load_scene_info,
                                               resolve_resolution)
from street_sparse_3dgs_tpu.models.gaussians import GaussianParams


def make_model(n_cams=4, n_pts=50, seed=0, model="PINHOLE"):
    rng = np.random.default_rng(seed)
    cams = {1: colmap.ColmapCamera(1, model, 64, 48,
                                   np.array([60.0, 60.0, 31.5, 23.5])
                                   if model == "PINHOLE"
                                   else np.array([60.0, 31.5, 23.5]))}
    images = {}
    for i in range(1, n_cams + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        images[i] = colmap.ColmapImage(
            i, q, rng.normal(size=3), 1, f"cam{i:03d}.png",
            rng.uniform(0, 64, size=(5, 2)),
            rng.integers(-1, n_pts, size=5).astype(np.int64))
    pts = colmap.ColmapPoints(
        xyz=rng.normal(size=(n_pts, 3)),
        rgb=rng.integers(0, 255, size=(n_pts, 3)).astype(np.uint8),
        error=rng.uniform(0, 1, n_pts), ids=np.arange(n_pts, dtype=np.int64),
        track_image_ids=[np.array([1, 2], np.int32)] * n_pts,
        track_point2d_idxs=[np.array([0, 1], np.int32)] * n_pts)
    return cams, images, pts


def assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb)
    for k in ca:
        assert ca[k].model == cb[k].model
        np.testing.assert_allclose(ca[k].params, cb[k].params)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec, atol=1e-12)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec, atol=1e-12)
        assert ia[k].name == ib[k].name
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    if pa is not None:
        np.testing.assert_allclose(pa.xyz, pb.xyz)
        np.testing.assert_array_equal(pa.rgb, pb.rgb)
        np.testing.assert_array_equal(pa.ids, pb.ids)


def test_colmap_binary_roundtrip(tmp_path):
    model = make_model()
    colmap.write_model(*model, tmp_path, binary=True)
    model2 = colmap.read_model(tmp_path)
    assert_models_equal(model, model2)


def test_colmap_text_roundtrip(tmp_path):
    cams, images, pts = make_model()
    colmap.write_cameras_text(cams, tmp_path / "cameras.txt")
    colmap.write_images_text(images, tmp_path / "images.txt")
    cams2 = colmap.read_cameras_text(tmp_path / "cameras.txt")
    images2 = colmap.read_images_text(tmp_path / "images.txt")
    assert_models_equal((cams, images, None), (cams2, images2, None))


def test_qvec_rotmat_inverse():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


def test_point_cloud_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(20, 3))
    rgb = rng.integers(0, 255, size=(20, 3)).astype(np.uint8)
    store_point_cloud(tmp_path / "p.ply", xyz, rgb)
    xyz2, col2 = fetch_point_cloud(tmp_path / "p.ply")
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_allclose(col2, rgb / 255.0, atol=1e-6)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 30
    p = GaussianParams(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
        log_scales=rng.normal(size=(n, 3)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        opacity_raw=rng.normal(size=(n, 1)).astype(np.float32))
    save_gaussian_ply(tmp_path / "g.ply", p)
    p2 = load_gaussian_ply(tmp_path / "g.ply")
    for a, b in zip(p, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def make_scene_dir(tmp_path, with_depths=True, with_depth_only=True):
    from PIL import Image

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cams, images, pts = make_model()
    colmap.write_model(cams, images, pts, sparse, binary=True)
    (tmp_path / "images").mkdir()
    rng = np.random.default_rng(2)
    for im in images.values():
        arr = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / im.name)
    (sparse / "test.txt").write_text("cam001.png\n")
    if with_depths:
        (tmp_path / "depths").mkdir()
        for im in images.values():
            d = rng.integers(0, 65535, size=(48, 64)).astype(np.uint16)
            Image.fromarray(d).save(tmp_path / "depths" /
                                    (im.name.rsplit(".", 1)[0] + ".png"))
        dp = {im.name.rsplit(".", 1)[0]: {"scale": 1.2, "offset": 0.1}
              for im in images.values()}
        (sparse / "depth_params.json").write_text(json.dumps(dp))
    if with_depth_only:
        dimages = {10 + i: colmap.ColmapImage(
            10 + i, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
            f"cam{i:03d}.png", np.zeros((0, 2)), np.zeros(0, np.int64))
            for i in range(1, 3)}
        colmap.write_images_binary(dimages, sparse / "images_depths.bin")
    return tmp_path


def test_load_scene_info(tmp_path):
    src = make_scene_dir(tmp_path)
    cfg = ModelConfig(eval=True, depths="depths", additional_depth_maps=True)
    info = load_scene_info(src, cfg)
    # 4 images: 1 test (cam001), 3 train + 2 depth-only.
    assert len(info.test_cameras) == 1
    assert len(info.train_cameras) == 5
    assert sum(c.is_depth_only for c in info.train_cameras) == 2
    assert info.points.shape == (50, 3)
    assert info.nerf_radius > 0
    # depth params got the median scale stamped.
    c0 = [c for c in info.train_cameras if not c.is_depth_only][0]
    assert c0.depth_params["med_scale"] == pytest.approx(1.2)


def test_camera_stream_batches(tmp_path):
    src = make_scene_dir(tmp_path)
    cfg = ModelConfig(eval=True, depths="depths", additional_depth_maps=True)
    info = load_scene_info(src, cfg)
    stream = CameraStream(info.train_cameras, resolution=1, seed=0)
    batches = list(iter(stream))
    assert len(batches) == 5
    depth_only = [b for b in batches if getattr(b, "is_depth_only", False)]
    assert len(depth_only) == 2
    photo = [b for b in batches if not getattr(b, "is_depth_only", False)]
    b = photo[0]
    assert b.gt_image.shape == (3, 48, 64)
    assert bool(b.depth_reliable)
    assert float(b.mono_invdepth.max()) > 0.1
    # depth-only batches carry a black image but a real depth map.
    assert float(depth_only[0].gt_image.max()) == 0.0


def test_resolution_policy():
    assert resolve_resolution(3200, 2400, -1) == (1600, 1200)
    assert resolve_resolution(800, 600, -1) == (800, 600)
    assert resolve_resolution(800, 600, 2) == (400, 300)
    assert resolve_resolution(800, 600, 400) == (400, 300)


def test_camera_stream_prefetch_order_and_overlap(tmp_path, monkeypatch):
    """Prefetch (num_workers>0) must yield the exact synchronous order and
    hide per-item load latency behind the consumer (ref train_single.py:61
    uses DataLoader(num_workers=8, prefetch_factor=1))."""
    import time

    from street_sparse_3dgs_tpu.data import scene as scene_mod

    src = make_scene_dir(tmp_path)
    cfg = ModelConfig(eval=True, depths="depths")
    info = load_scene_info(src, cfg)

    sync = CameraStream(info.train_cameras, resolution=1, seed=3,
                        num_workers=0)
    pre = CameraStream(info.train_cameras, resolution=1, seed=3,
                       num_workers=4)
    ids_sync = [int(b.image_index) for b in sync]
    ids_pre = [int(b.image_index) for b in pre]
    assert ids_pre == ids_sync

    # Slow loads: 60 ms each, 8 items.  Synchronous would be >= 480 ms of
    # load time; with 4 workers + a 30 ms consumer the loads must overlap.
    real = scene_mod.load_camera_arrays

    def slow_load(*a, **kw):
        time.sleep(0.06)
        return real(*a, **kw)

    monkeypatch.setattr(scene_mod, "load_camera_arrays", slow_load)
    infos8 = (info.train_cameras * 3)[:8]
    stream = CameraStream(infos8, resolution=1, seed=0, num_workers=4)
    t0 = time.perf_counter()
    n = 0
    for _ in stream:
        time.sleep(0.03)      # stand-in for the device step
        n += 1
    dt = time.perf_counter() - t0
    assert n == 8
    # Serial would be 8*(60+30) = 720 ms; overlapped ~ 8*30 + 2*60 = 360 ms.
    # Threshold sits at serial − 2 load slots so scheduler jitter under a
    # loaded CI host (4-way pytest + background jobs) cannot flake it
    # while a true non-overlapping regression (≥ 720 ms) still fails.
    assert dt < 0.66, f"prefetch failed to overlap loads: {dt:.3f}s"
