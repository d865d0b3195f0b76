"""LAS/LAZ IO (preprocess/laz.py + native/laz_codec.cpp): header parsing,
raw .las roundtrip, LASzip-chunked .laz roundtrip (POINT10/GPSTIME11/RGB12
v2 codecs), multi-chunk files, chunker integration.

Reference parity: preprocess/ss_make_chunk.py:36-235 reads .laz tiles via
laspy (x/y/z + rgb); here the decoder is native C++ and the writer makes
the codec roundtrip-testable without external files."""

import numpy as np
import pytest

from street_sparse_3dgs_tpu.preprocess import laz


def street_cloud(n=5000, seed=0, with_rgb=True):
    """Random-walk point cloud with LiDAR-like local coherence."""
    rng = np.random.default_rng(seed)
    xyz = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)
    xyz[:, 2] = np.abs(xyz[:, 2]) * 0.2
    xyz += np.array([1000.0, -2000.0, 30.0])
    rgb = None
    if with_rgb:
        rgb = (np.clip(np.cumsum(rng.normal(0, 2, (n, 3)), axis=0) + 128,
                       0, 255)).astype(np.uint8)
    return xyz, rgb


def test_las_roundtrip(tmp_path):
    xyz, rgb = street_cloud(500)
    p = laz.write_points(tmp_path / "t.las", xyz, rgb=rgb, scale=0.001)
    r = laz.read_points(p)
    got = np.stack([r["x"], r["y"], r["z"]], axis=1)
    np.testing.assert_allclose(got, xyz, atol=0.0006)
    assert r["point_format"] == 2
    np.testing.assert_array_equal(r["red"], rgb[:, 0].astype(np.uint16) * 257)


def test_laz_roundtrip_rgb(tmp_path):
    xyz, rgb = street_cloud(3000, seed=1)
    p = laz.write_points(tmp_path / "t.laz", xyz, rgb=rgb, scale=0.001)
    las = laz.write_points(tmp_path / "t.las", xyz, rgb=rgb, scale=0.001)
    assert p.stat().st_size < las.stat().st_size * 0.8  # actually compresses
    r = laz.read_points(p)
    want = laz.read_points(las)
    for k in ("x", "y", "z"):
        np.testing.assert_array_equal(r[k], want[k])  # bit-exact vs raw path
    for k in ("red", "green", "blue"):
        np.testing.assert_array_equal(r[k], want[k])


def test_laz_roundtrip_gps_multichunk(tmp_path):
    xyz, rgb = street_cloud(2500, seed=2)
    gps = np.cumsum(np.abs(np.random.default_rng(3).normal(
        1e-4, 1e-5, 2500))) + 300000.0
    inten = (np.arange(2500) % 7000).astype(np.uint16)
    cls = (np.arange(2500) % 5 + 2).astype(np.uint8)
    p = laz.write_points(tmp_path / "t.laz", xyz, rgb=rgb, gps_time=gps,
                         intensity=inten, classification=cls,
                         scale=0.001, chunk_size=1000)  # 3 chunks
    r = laz.read_points(p)
    assert r["point_format"] == 3
    np.testing.assert_allclose(
        np.stack([r["x"], r["y"], r["z"]], 1), xyz, atol=0.0006)
    np.testing.assert_array_equal(r["gps_time"].view(np.uint64),
                                  gps.view(np.uint64))
    np.testing.assert_array_equal(r["intensity"], inten)
    np.testing.assert_array_equal(r["classification"], cls)


def test_laz_point10_only(tmp_path):
    xyz, _ = street_cloud(800, seed=4, with_rgb=False)
    p = laz.write_points(tmp_path / "t.laz", xyz, scale=0.01)
    r = laz.read_points(p)
    assert r["point_format"] == 0
    np.testing.assert_allclose(
        np.stack([r["x"], r["y"], r["z"]], 1), xyz, atol=0.006)


def test_chunker_accepts_laz(tmp_path):
    from street_sparse_3dgs_tpu.preprocess.chunk import load_lidar_tiles

    xyz, rgb = street_cloud(2000, seed=5)
    xyz -= np.array([1000.0, -2000.0, 30.0])  # float32 voxel precision
    laz.write_points(tmp_path / "tile.laz", xyz, rgb=rgb, scale=0.001)
    lo = xyz.min(axis=0) - 1
    hi = xyz.max(axis=0) + 1
    pts, cols = load_lidar_tiles(tmp_path, lo, hi, density=1e12)
    assert len(pts) == 2000
    # Compare on the writer's 1 mm quantization grid (order-insensitive).
    qa = np.round((pts - xyz.min(0)) / 0.001).astype(np.int64)
    qb = np.round((xyz - xyz.min(0)) / 0.001).astype(np.int64)
    ra = np.concatenate([qa, np.round(cols * 255).astype(np.int64)], 1)
    rb = np.concatenate([qb, rgb.astype(np.int64)], 1)
    np.testing.assert_array_equal(ra[np.lexsort(ra.T)], rb[np.lexsort(rb.T)])
