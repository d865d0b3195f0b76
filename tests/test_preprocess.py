"""Preprocessing subsystem: chunker, depth-scale fitting, calibration from
recording JSON, reorientation, matchers, COLMAP database, depth decode."""

import json
import math
import sqlite3

import numpy as np
import pytest

from street_sparse_3dgs_tpu.data import colmap
from street_sparse_3dgs_tpu.preprocess import (calibration, chunk, colmap_db,
                                               depth_decode, depth_scale,
                                               matchers, reorient)


def grid_model(n_cams=24, n_pts=300, spread=120.0, seed=0):
    """Cameras along a street (x axis), points scattered around them."""
    rng = np.random.default_rng(seed)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    images = {}
    pts_xyz = rng.uniform([-10, -10, -2], [spread + 10, 10, 5],
                          size=(n_pts, 3))
    pts = colmap.ColmapPoints(
        xyz=pts_xyz, rgb=rng.integers(0, 255, (n_pts, 3)).astype(np.uint8),
        error=np.zeros(n_pts), ids=np.arange(n_pts, dtype=np.int64))
    for i in range(n_cams):
        x = spread * i / (n_cams - 1)
        center = np.array([x, 0.0, 1.5])
        R = np.eye(3)
        t = -R @ center
        near = np.nonzero(np.linalg.norm(pts_xyz - center, axis=1) < 30)[0]
        images[i + 1] = colmap.ColmapImage(
            i + 1, colmap.rotmat2qvec(R), t, 1, f"img{i:03d}.png",
            rng.uniform(0, 64, (len(near), 2)), near.astype(np.int64))
    return cams, images, pts


def test_chunker(tmp_path):
    cams, images, pts = grid_model()
    sparse = tmp_path / "sparse" / "0"
    colmap.write_model(cams, images, pts, sparse)
    cfg = chunk.ChunkConfig(chunk_size=50.0, min_n_cams=2, seed=0)
    names = chunk.make_chunks(sparse, tmp_path / "chunks", cfg)
    assert len(names) >= 2
    assert (tmp_path / "chunks" / "chunks.txt").exists()
    total_cams = 0
    for name in names:
        cdir = tmp_path / "chunks" / name
        ccams, cimgs, cpts = colmap.read_model(cdir / "sparse" / "0")
        assert len(cimgs) > 2
        total_cams += len(cimgs)
        center = np.array([float(v) for v in
                           (cdir / "center.txt").read_text().split()])
        extent = np.array([float(v) for v in
                           (cdir / "extent.txt").read_text().split()])
        # Every chunk point lies in the (border-extended) chunk box.
        lo = center - extent / 2
        hi = center + extent / 2
        interior = ((cpts.xyz[:, 0] > lo[0] - 1e-6)
                    & (cpts.xyz[:, 0] < hi[0] + 1e-6))
        # border chunks absorb exterior points; at least the interior is there
        assert interior.sum() > 0
        # Per-image matches only reference chunk points.
        ids = set(int(p) for p in cpts.ids)
        for im in cimgs.values():
            assert all(int(p) in ids for p in im.point3D_ids)
        assert (cdir / "chunk.ply").exists()
    # Cameras can appear in several chunks (ring overlap) but the union
    # covers most of them.
    assert total_cams >= len(images)


def test_chunker_lidar_merge(tmp_path):
    cams, images, pts = grid_model(n_cams=8, spread=30.0)
    sparse = tmp_path / "sparse" / "0"
    colmap.write_model(cams, images, pts, sparse)
    lidar_dir = tmp_path / "lidar"
    lidar_dir.mkdir()
    rng = np.random.default_rng(1)
    np.savez(lidar_dir / "tile0.npz",
             xyz=rng.uniform([0, -5, 0], [30, 5, 3],
                             (5000, 3)).astype(np.float32),
             rgb=rng.uniform(0, 1, (5000, 3)).astype(np.float32))
    cfg = chunk.ChunkConfig(chunk_size=200.0, min_n_cams=2,
                            lidar_initialisation=True,
                            lidar_downsample_density=10.0)
    names = chunk.make_chunks(sparse, tmp_path / "chunks", cfg,
                              lidar_dir=lidar_dir)
    assert names
    _, _, cpts = colmap.read_model(tmp_path / "chunks" / names[0]
                                   / "sparse" / "0")
    # LiDAR points merged with fresh ids beyond the originals.
    assert cpts.ids.max() > pts.ids.max()
    assert len(cpts.ids) > len(pts.ids) * 0.5


def test_depth_scale_fit():
    """Synthetic consistency: mono = colmap-inverse-depth affine-transformed;
    the fit must recover the inverse mapping."""
    rng = np.random.default_rng(0)
    n = 300
    cam = colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                              np.array([60.0, 60.0, 32.0, 24.0]))
    # All points strictly in front of an identity camera, z in [2, 20].
    pts_xyz = rng.uniform([-3, -2, 2.0], [3, 2, 20.0], (n, 3))
    xys = np.stack([
        60.0 * pts_xyz[:, 0] / pts_xyz[:, 2] + 32.0,
        60.0 * pts_xyz[:, 1] / pts_xyz[:, 2] + 24.0], axis=-1)
    keep = ((xys[:, 0] >= 0) & (xys[:, 0] < 64)
            & (xys[:, 1] >= 0) & (xys[:, 1] < 48))
    pts_xyz, xys = pts_xyz[keep], xys[keep]
    ids = np.arange(len(pts_xyz), dtype=np.int64)
    im = colmap.ColmapImage(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                            "a.png", xys, ids)
    # Dense mono map: a smooth inverse-depth ramp; set each point's depth
    # from the map value at its pixel so the two modalities agree exactly
    # up to the affine transform.
    true_scale, true_offset = 0.5, 0.02
    yy, xx = np.mgrid[0:48, 0:64]
    inv_dense = 0.05 + 0.4 * (xx / 64.0) + 0.2 * (yy / 48.0)
    mono = ((inv_dense - true_offset) / true_scale).astype(np.float32)
    xi = np.clip(np.round(xys).astype(int), [0, 0], [63, 47])
    pts_xyz[:, 2] = 1.0 / inv_dense[xi[:, 1], xi[:, 0]]
    pts_by_id = {int(i): x for i, x in zip(ids, pts_xyz)}
    out = depth_scale.image_depth_params(im, cam, pts_by_id, mono)
    assert out["scale"] == pytest.approx(true_scale, rel=0.1)
    assert out["offset"] == pytest.approx(true_offset, abs=0.02)


def test_calibration_from_json(tmp_path):
    records = []
    for i in range(40):
        records.append({"ImageId": f"IMG{i:04d}", "RecordedAt": i,
                        "X": 1000.0 + i, "Y": 500.0, "Height": 2.0,
                        "Yaw": 10.0, "VehicleDirection": 5.0})
    blob = {"RecordingProperties": records}
    out = tmp_path / "sparse" / "0"
    info = calibration.generate_colmap_from_calibration(
        blob, out, cube_face_size=512, eval_mode=True)
    cams, images, _ = colmap.read_model(out)
    assert len(cams) == 8                      # 8 side faces
    assert info["n_images"] == info["n_recordings"] * 8
    assert (out / "translation.json").exists()
    assert (out / "test.txt").exists()
    t = json.loads((out / "translation.json").read_text())
    assert abs(t["y_translation"] - 500.0) < 1e-6
    # Camera centers reproduce the (centered) recording positions.
    im = next(iter(images.values()))
    c = -colmap.qvec2rotmat(im.qvec).T @ im.tvec
    rec0 = [r for r in records
            if im.name.split("/")[1].startswith(r["ImageId"])][0]
    np.testing.assert_allclose(
        c, [rec0["X"] - t["x_translation"], rec0["Y"] - t["y_translation"],
            2.0], atol=1e-6)
    # f1 face at yaw 15° looks mostly horizontally (+z cam forward maps to
    # the yaw direction in world).
    # test split is nonempty and a subset of images.
    test_names = (out / "test.txt").read_text().split()
    names = {im.name for im in images.values()}
    assert test_names and all(n in names for n in test_names)


def test_reorient(tmp_path):
    # Cameras on a tilted plane; after auto_reorient centers are z-up planar
    # and median camera-point distance hits the target.
    rng = np.random.default_rng(0)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60, 32, 24]))}
    tilt = reorient.rotation_to_z_up(
        np.array([0.3, 0.0, 0.954]))  # tilt the world
    images = {}
    n_pts = 200
    pts_xyz = rng.uniform([-5, -5, 0], [5, 5, 0.1], (n_pts, 3)) @ tilt
    pts = colmap.ColmapPoints(pts_xyz, np.zeros((n_pts, 3), np.uint8),
                              np.zeros(n_pts),
                              np.arange(n_pts, dtype=np.int64))
    for i in range(12):
        center = np.array([math.cos(i), math.sin(i), 1.0 + 0.01 * i]) @ tilt
        R = np.eye(3)
        t = -R @ center
        pids = rng.integers(0, n_pts, 20).astype(np.int64)
        images[i + 1] = colmap.ColmapImage(
            i + 1, colmap.rotmat2qvec(R), t, 1, f"i{i}.png",
            rng.uniform(0, 64, (20, 2)), pids)
    src = tmp_path / "in"
    dst = tmp_path / "out"
    colmap.write_model(cams, images, pts, src)
    rot, upscale = reorient.auto_reorient(src, dst, target_med_dist=20.0)
    _, images2, pts2 = colmap.read_model(dst)
    med = reorient.median_cam_point_distance(images2, pts2)
    assert med == pytest.approx(20.0, rel=0.05)
    centers = np.stack([-colmap.qvec2rotmat(im.qvec).T @ im.tvec
                        for im in images2.values()])
    # Camera plane is now nearly horizontal.
    normal, _ = reorient.fit_plane(centers)
    assert abs(normal[2]) > 0.99


def test_matchers(tmp_path):
    positions = {f"cam1/{i:04d}.png": np.array([float(i), 0.0])
                 for i in range(30)}
    pairs = matchers.make_matcher_pairs(positions, tmp_path / "pairs.txt",
                                        n_seq=2, n_quad=3, n_gps=3)
    assert pairs
    txt = (tmp_path / "pairs.txt").read_text()
    assert "cam1/0000.png cam1/0001.png" in txt     # sequential
    assert "cam1/0000.png cam1/0008.png" in txt     # 2^3 jump
    # distance matcher
    cams, images, pts = grid_model(n_cams=6, spread=10.0)
    sparse = tmp_path / "s"
    colmap.write_model(cams, images, pts, sparse)
    dpairs = matchers.make_distance_pairs(sparse, tmp_path / "d.txt",
                                          n_neighbors=2)
    assert len(dpairs) >= 5


def test_colmap_db(tmp_path):
    cams, images, _ = grid_model(n_cams=4)
    db = tmp_path / "database.db"
    colmap_db.fill_database(db, cams, images)
    conn = sqlite3.connect(db)
    n_cams = conn.execute("SELECT COUNT(*) FROM cameras").fetchone()[0]
    rows = conn.execute(
        "SELECT image_id, name, prior_qw FROM images ORDER BY image_id"
    ).fetchall()
    conn.close()
    assert n_cams == 1 and len(rows) == 4
    assert rows[0][1] == "img000.png"
    assert rows[0][2] == pytest.approx(images[1].qvec[0])
    assert colmap_db.read_database_images(db)[1] == "img000.png"


def test_depth_decode_roundtrip():
    # Encode a known depth into the Cyclomedia RG format and decode back.
    # Note the format's ceiling: units < 2^14, precision exponent <= 6
    # -> max ~1048 m.  800 m exercises the largest exponent.
    depth_mm = np.array([[1000, 2000, 0], [128000, 50, 800_000]],
                        np.int64)
    # Build encoding: find precision so units < 2^14.
    r = np.zeros_like(depth_mm)
    g = np.zeros_like(depth_mm)
    for idx, mm in np.ndenumerate(depth_mm):
        if mm == 0:
            continue
        prec = 0
        units = mm
        while units >= (1 << 14):
            units >>= 2
            prec += 2
        r[idx] = ((prec >> 1) << 6) | (units >> 8)
        g[idx] = units & 255
    bgr = np.stack([np.where(depth_mm > 0, 1, 0), g, r],
                   axis=-1).astype(np.uint8)
    depth_m, background = depth_decode.decode_depth_rgb(bgr)
    assert background[0, 2]
    np.testing.assert_allclose(depth_m[0, 0], 1.0)
    np.testing.assert_allclose(depth_m[0, 1], 2.0)
    np.testing.assert_allclose(depth_m[1, 0], 128.0)
    # Large depths lose precision by the exponent encoding, small exact.
    assert abs(depth_m[1, 2] - 800.0) / 800.0 < 0.01
    png, scale, offset = depth_decode.to_invdepth_png(depth_m, background)
    inv = png.astype(np.float64) / 65535.0 * scale + offset
    valid = depth_m > 0.1
    # 16-bit quantization bounds the absolute error at scale/65535.
    np.testing.assert_allclose(inv[valid], 1.0 / depth_m[valid],
                               atol=1.1 * scale / 65535.0)


def test_ctm_exporter_native(tmp_path):
    """The C++ CTM writer produces a parseable RAW OpenCTM mesh with the
    user offset applied; the ctypes binding compiles on demand."""
    from street_sparse_3dgs_tpu import native

    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (50, 3)).astype(np.float32) + 100.0
    tris = rng.integers(0, 50, (30, 3)).astype(np.int32)
    out = tmp_path / "mesh.ctm"
    native.save_ctm(out, verts, tris, user_offset=(100.0, 100.0, 100.0))
    v2, t2 = native.load_ctm(out)
    np.testing.assert_allclose(v2, verts - 100.0, atol=1e-4)
    np.testing.assert_array_equal(t2, tris)
    # The compiled library was actually used (unless no compiler, in which
    # case the fallback still produced identical bytes).
    assert out.stat().st_size > 12 * (50 + 30)


def test_simplify_images(tmp_path):
    cams, images, pts = grid_model(n_cams=6, n_pts=100, spread=20.0)
    # One camera without points; one far outlier point.
    images[99] = colmap.ColmapImage(99, np.array([1.0, 0, 0, 0]),
                                    np.zeros(3), 1, "empty.png",
                                    np.zeros((0, 2)), np.zeros(0, np.int64))
    pts.xyz[0] = [1e5, 1e5, 1e5]
    src, dst = tmp_path / "in", tmp_path / "out"
    colmap.write_model(cams, images, pts, src)
    n_img, n_pts = reorient.simplify_images(src, dst)
    assert n_img == 6           # the empty camera dropped
    assert n_pts == 99          # the outlier dropped
    _, im2, p2 = colmap.read_model(dst)
    assert all((im.point3D_ids >= 0).sum() > 0 for im in im2.values())
    assert 0 not in set(int(i) for i in p2.ids)


def test_sfm_workflow_command_sequence(tmp_path, monkeypatch):
    """The sfm calibration driver sequences feature_extractor → custom
    matcher → matches_importer → hierarchical_mapper → undistort → reorient
    (ref generate_colmap.py:83-151,290-352), degrading to command logging
    when COLMAP is absent."""
    from PIL import Image as PILImage

    from street_sparse_3dgs_tpu.preprocess import colmap_runner

    monkeypatch.setattr(colmap_runner, "DRY_RUN", True)
    images = tmp_path / "inputs" / "images"
    (images / "cam0").mkdir(parents=True)
    for i in range(4):
        PILImage.fromarray(
            np.full((8, 8, 3), i * 40, np.uint8)).save(
            images / "cam0" / f"im{i}.png")

    log = colmap_runner.generate_colmap_project(tmp_path, calibration="sfm")

    joined = "\n".join(log)
    order = [joined.index(s) for s in (
        "feature_extractor", "matches_importer", "hierarchical_mapper",
        "image_undistorter", "auto_reorient")]
    assert order == sorted(order)
    fe = next(l for l in log if "feature_extractor" in l)
    assert "--ImageReader.single_camera 1" in fe
    assert "--SiftExtraction.max_num_features 16384" in fe
    assert "OPENCV" in fe
    hm = next(l for l in log if "hierarchical_mapper" in l)
    assert "--Mapper.ba_global_function_tolerance 0.1" in hm
    # The custom matcher ran for real: seq+quad pairs within the folder.
    pairs = (tmp_path / "camera_calibration" / "unrectified" /
             "matching.txt").read_text().splitlines()
    assert "cam0/im0.png cam0/im1.png" in pairs


def test_cal_sfm_project_sequence(tmp_path, monkeypatch):
    """cal_sfm driver: known-pose triangulation commands then undistortion,
    with the mask model riding the same undistorter."""
    from PIL import Image as PILImage

    from street_sparse_3dgs_tpu.preprocess import colmap_runner

    monkeypatch.setattr(colmap_runner, "DRY_RUN", True)
    cams, images, pts = grid_model(n_cams=6)
    model0 = (tmp_path / "camera_calibration" / "unrectified" / "sparse"
              / "0")
    colmap.write_model(cams, images, pts, model0)
    img_dir = tmp_path / "inputs" / "images"
    mask_dir = tmp_path / "inputs" / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    PILImage.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        img_dir / "img000.png")

    log = colmap_runner.generate_colmap_project(
        tmp_path, calibration="cal_sfm")

    joined = "\n".join(log)
    order = [joined.index(s) for s in (
        "feature_extractor", "matches_importer", "point_triangulator",
        "bundle_adjuster", "image_undistorter")]
    assert order == sorted(order)
    # Mask model written with .png names for the second undistorter pass.
    _, mimages, _ = colmap.read_model(model0 / "masks")
    assert all(im.name.endswith(".png") for im in mimages.values())
    assert joined.count("image_undistorter") == 2


def test_make_mask_uint8(tmp_path):
    """Alpha>250 threshold + 3×3 erosion, written as single-channel PNG."""
    from PIL import Image as PILImage

    from street_sparse_3dgs_tpu.preprocess.colmap_runner import \
        make_mask_uint8

    rgba = np.zeros((10, 10, 4), np.uint8)
    rgba[2:8, 2:8, 3] = 255       # 6x6 opaque block -> erodes to 4x4
    (tmp_path / "in").mkdir()
    PILImage.fromarray(rgba).save(tmp_path / "in" / "m.png")
    n = make_mask_uint8(tmp_path / "in", tmp_path / "out")
    assert n == 1
    out = np.asarray(PILImage.open(tmp_path / "out" / "m.png"))
    assert out.ndim == 2
    assert out[3:7, 3:7].min() == 255
    assert out[2, 2] == 0 and out.sum() == 16 * 255


def test_mono_depth_cli_command_and_16bit_output(tmp_path, monkeypatch):
    """generate_depth shells out exactly like the reference
    (generate_depth.py:27-36) when a Depth-Anything checkout exists, and
    its 16-bit writer normalizes to the full uint16 range."""
    import numpy as np

    from street_sparse_3dgs_tpu.preprocess import mono_depth

    cmd = mono_depth.depth_anything_cli_cmd("imgs", "out", encoder="vits")
    assert cmd[2:6] == ["--encoder", "vits", "--pred-only", "--grayscale"]

    da = tmp_path / "da"
    da.mkdir()
    (da / "run.py").write_text("")
    monkeypatch.setenv("DEPTH_ANYTHING_DIR", str(da))
    calls = {}
    monkeypatch.setattr(mono_depth.subprocess, "run",
                        lambda c, check: calls.setdefault("cmd", c))
    mono_depth.generate_depth(tmp_path / "imgs", tmp_path / "out")
    assert calls["cmd"][1].endswith("run.py")

    from PIL import Image
    arr = np.linspace(0.0, 4.0, 64).reshape(8, 8)
    mono_depth._save_16bit(arr, tmp_path / "d.png")
    back = np.asarray(Image.open(tmp_path / "d.png"))
    assert back.dtype == np.uint16
    assert back.min() == 0 and back.max() == 65535
