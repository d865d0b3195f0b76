"""Auxiliary subsystems: virtual depth cameras, experiment snapshots,
compacted hierarchy eval render, multi-host chunk partitioning."""

import json
import numpy as np
import jax.numpy as jnp
import pytest

from street_sparse_3dgs_tpu.data import colmap
from street_sparse_3dgs_tpu.pipeline import experiments
from street_sparse_3dgs_tpu.preprocess import virtual_cams


def test_virtual_cams(tmp_path):
    records = [{"ImageId": f"R{i}", "RecordedAt": i,
                "X": float(i), "Y": 0.0, "Height": 2.0,
                "Yaw": 10.0 * i, "VehicleDirection": 0.0}
               for i in range(5)]
    # Insert a large gap: no interpolation across it.
    records.append({"ImageId": "R99", "RecordedAt": 99, "X": 100.0,
                    "Y": 0.0, "Height": 2.0, "Yaw": 0.0,
                    "VehicleDirection": 0.0})
    out = tmp_path / "sparse"
    out.mkdir()
    (out / "translation.json").write_text(
        json.dumps({"x_translation": 0.0, "y_translation": 0.0}))
    info = virtual_cams.augment_recording_details(
        {"RecordingProperties": records}, out, num_interpolations=2)
    # 4 gaps x 2 interpolations (the jump to R99 skipped).
    assert info["n_virtual_recordings"] == 8
    assert info["n_depth_cameras"] == 8 * 8
    images = colmap.read_images_binary(out / "images_depths.bin")
    assert len(images) == 64
    # Interpolated position between R0 and R1 sits at x = 1/3 and 2/3.
    centers = sorted(
        round(float((-colmap.qvec2rotmat(im.qvec).T @ im.tvec)[0]), 3)
        for im in images.values()
        if im.name.split("/")[1].startswith("R0_"))
    assert centers[0] == pytest.approx(1 / 3, abs=1e-3)
    assert centers[-1] == pytest.approx(2 / 3, abs=1e-3)


def test_yaw_interpolation_wraps():
    a = {"ImageId": "a", "RecordedAt": 0, "X": 0.0, "Y": 0.0,
         "Yaw": 350.0, "VehicleDirection": 0.0}
    b = {"ImageId": "b", "RecordedAt": 1, "X": 1.0, "Y": 0.0,
         "Yaw": 10.0, "VehicleDirection": 0.0}
    out = virtual_cams.interpolate_recordings([a, b], 1)
    assert out[0]["Yaw"] % 360.0 == pytest.approx(0.0, abs=1e-6)


def test_experiment_snapshots(tmp_path):
    out = tmp_path / "output"
    out.mkdir()
    (out / "results.txt").write_text("psnr 30")
    store = tmp_path / "store"
    experiments.save_test(out, store, "run1", note="baseline")
    assert experiments.list_tests(store)[0]["name"] == "run1"
    restored = tmp_path / "restored"
    experiments.load_test(store, "run1", restored)
    assert (restored / "results.txt").read_text() == "psnr 30"
    with pytest.raises(FileExistsError):
        experiments.save_test(out, store, "run1")
    experiments.remove_test(store, "run1")
    assert experiments.list_tests(store) == []


def test_compact_render_matches_masked():
    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.hierarchy.build import build_hierarchy
    from street_sparse_3dgs_tpu.hierarchy.render import (render_cut,
                                                         render_cut_compact)
    from street_sparse_3dgs_tpu.hierarchy.structure import select_cut
    from street_sparse_3dgs_tpu.models.gaussians import (GaussianParams,
                                                         inverse_sigmoid)
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig

    s = make_toy_scene(seed=1, n=120, n_cameras=1, width=64, height=64)
    params = GaussianParams(
        xyz=s.means3d, features_dc=s.sh_coeffs[:, :1],
        features_rest=s.sh_coeffs[:, 1:], log_scales=jnp.log(s.scales),
        quats=s.quats, opacity_raw=inverse_sigmoid(s.opacities)[:, None])
    h = build_hierarchy(params)
    cam = s.cameras[0]
    cfg = RasterConfig(tile_capacity=256)
    for limit in (0.02, 0.2):
        cut = select_cut(h, cam.campos, limit)
        a = render_cut(h.params, cut, h.n_nodes, h.skybox_count, cam, 3,
                       jnp.zeros(3), cfg)
        b = render_cut_compact(h.params, cut, h.n_nodes, h.skybox_count,
                               cam, 3, jnp.zeros(3), cfg)
        np.testing.assert_allclose(np.asarray(b["render"]),
                                   np.asarray(a["render"]), atol=1e-4)


def test_multi_host_partitioning(tmp_path, monkeypatch):
    """Chunks partition round-robin; consolidation waits for all."""
    from street_sparse_3dgs_tpu.pipeline import full_train as ft

    paths = ft.ProjectPaths(tmp_path)
    for name in ("0_0", "1_0", "2_0"):
        (paths.chunks_dir / name).mkdir(parents=True)
    paths.scaffold_dir.mkdir(parents=True)
    # Pretend the scaffold exists so stage 1 is skipped.
    pc = paths.scaffold_dir / "point_cloud" / "iteration_1"
    pc.mkdir(parents=True)
    (pc / "point_cloud.ply").write_text("")

    processed = []
    monkeypatch.setattr(ft, "train_chunk_stage",
                        lambda *a, **k: processed.append(a[1]))
    monkeypatch.setattr(ft, "build_hierarchy_stage", lambda *a, **k: None)

    def fake_post(paths_, name, *a, **k):
        out = paths_.trained_chunks_dir / name
        out.mkdir(parents=True, exist_ok=True)
        (out / "hierarchy.hier_opt.npz").write_text("")

    monkeypatch.setattr(ft, "post_opt_stage", fake_post)
    merged_calls = []
    monkeypatch.setattr(ft, "consolidate_stage",
                        lambda p, names: merged_calls.append(sorted(names)))

    ft.full_train(tmp_path, host_id=0, num_hosts=2, skip_if_exists=True)
    assert processed == ["0_0", "2_0"]
    assert merged_calls == []          # host 1's chunk not ready yet
    ft.full_train(tmp_path, host_id=1, num_hosts=2, skip_if_exists=True)
    assert processed == ["0_0", "2_0", "1_0"]
    assert merged_calls == [["0_0", "1_0", "2_0"]]


def test_inputs_organization(tmp_path):
    from street_sparse_3dgs_tpu.preprocess import inputs

    raw = tmp_path / "raw"
    raw.mkdir()
    for img in ("A_f1", "A_r1", "B_f1", "B_u1"):
        (raw / f"{img}.jpg").write_bytes(b"x")
    n = inputs.create_inputs(raw, tmp_path / "inputs")
    assert n == 3  # u1 not in the default 8-side set? f1,r1 in; u1 excluded
    assert (tmp_path / "inputs/images/cam1/A.jpg").exists()
    assert (tmp_path / "inputs/images/cam3/A.jpg").exists()  # r1 -> cam3
    # copy to chunks
    chunks = tmp_path / "chunks"
    for c in ("0_0", "1_0"):
        (chunks / c / "sparse" / "0").mkdir(parents=True)
    f = tmp_path / "test.txt"
    f.write_text("x")
    assert inputs.copy_file_to_chunks(f, chunks) == 2
    assert (chunks / "0_0/sparse/0/test.txt").exists()


def test_depth_pipeline_local_steps(tmp_path):
    from street_sparse_3dgs_tpu.preprocess import depth_pipeline
    from street_sparse_3dgs_tpu import native

    # vis2mesh json from a tiny model
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    images = {1: colmap.ColmapImage(1, np.array([1.0, 0, 0, 0]),
                                    np.array([1.0, 2, 3]), 1, "a.png",
                                    np.zeros((0, 2)), np.zeros(0, np.int64))}
    colmap.write_model(cams, images, None, tmp_path / "sparse")
    blob = depth_pipeline.colmap_to_vis2mesh_json(tmp_path / "sparse",
                                                  tmp_path / "v2m.json")
    assert blob["imgs"][0]["K"][0][0] == 60.0
    np.testing.assert_allclose(blob["imgs"][0]["C"], [-1.0, -2.0, -3.0])

    # mesh -> CTM tiles roundtrip
    rng = np.random.default_rng(0)
    verts = np.concatenate([
        rng.uniform(0, 50, (30, 3)),            # tile (0,0)
        rng.uniform([150, 0, 0], [199, 50, 50], (30, 3))])  # tile (1,0)
    tris = np.concatenate([
        rng.integers(0, 30, (20, 3)),
        30 + rng.integers(0, 30, (20, 3))]).astype(np.int32)
    tiles = depth_pipeline.mesh_to_ctm_tiles(verts, tris, tmp_path / "ctm",
                                             tile_size=100.0)
    assert len(tiles) == 2
    v, t = native.load_ctm(tiles[0])
    assert v.shape[1] == 3 and t.shape[1] == 3


def test_profiling_trace_and_summary(tmp_path):
    """profiling.trace_fn captures a device trace and summarize_trace
    aggregates per-op rows (SURVEY §5.1 tooling)."""
    import jax
    import jax.numpy as jnp

    from street_sparse_3dgs_tpu import profiling

    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    x = jnp.ones((256, 256))
    tdir = profiling.trace_fn(f, x, trace_dir=str(tmp_path / "tr"), iters=2)
    rows = profiling.summarize_trace(tdir, iters=2, device_only=False)
    assert rows and all("ms" in r for r in rows)
    profiling.print_summary(rows, top=3)


def test_black_mask_blackens_outside_dilated_mask(tmp_path):
    import numpy as np
    from PIL import Image

    from street_sparse_3dgs_tpu.preprocess.inputs import black_mask

    rect = tmp_path / "camera_calibration" / "rectified"
    (rect / "images" / "cam1").mkdir(parents=True)
    (rect / "masks" / "cam1").mkdir(parents=True)
    img = np.full((32, 32, 3), 200, np.uint8)
    Image.fromarray(img).save(rect / "images" / "cam1" / "a.png")
    mask = np.zeros((32, 32), np.uint8)
    mask[10:20, 10:20] = 255
    Image.fromarray(mask).save(rect / "masks" / "cam1" / "a.png")

    assert black_mask(tmp_path) == 1
    out = np.asarray(Image.open(rect / "images" / "cam1" / "a.png"))
    assert (out[0, 0] == 0).all()            # far outside: blackened
    assert (out[15, 15] == 200).all()        # inside mask: kept
    assert (out[8, 15] == 200).all()         # within 5x5 dilation: kept
    assert (out[5, 15] == 0).all()           # beyond dilation: blackened


def test_consolidation_single_merger(tmp_path, monkeypatch):
    """Two hosts finishing simultaneously must not both run the Stage-5
    merge (reference single-merger semantics, scripts/full_train.py:259-282):
    the claim file is taken atomically, the output lands via os.replace, and
    a later re-run loads the existing artifact instead of re-merging."""
    import threading
    import time

    from street_sparse_3dgs_tpu.hierarchy.build import build_hierarchy
    from street_sparse_3dgs_tpu.hierarchy.io import save_hierarchy
    from street_sparse_3dgs_tpu.pipeline import full_train as ft

    from test_hierarchy import toy_params

    paths = ft.ProjectPaths(tmp_path)
    names = ["c0", "c1"]
    for i, name in enumerate(names):
        p, _ = toy_params(n=30, seed=i)
        h = build_hierarchy(p._replace(xyz=p.xyz + 3.0 * i))
        d = paths.trained_chunks_dir / name
        d.mkdir(parents=True)
        save_hierarchy(d / "hierarchy.hier_opt.npz", h)
    paths.output_dir.mkdir(exist_ok=True)

    real_merge = ft.merge_hierarchies
    merges = []

    def counting_merge(hs):
        merges.append(threading.get_ident())
        time.sleep(0.3)          # widen the race window
        return real_merge(hs)

    monkeypatch.setattr(ft, "merge_hierarchies", counting_merge)

    barrier = threading.Barrier(2)
    results = [None, None]

    def run(i):
        barrier.wait()
        results[i] = ft.consolidate_stage(paths, names)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(merges) == 1, f"merge ran {len(merges)} times"
    assert (paths.output_dir / "merged.hier.npz").exists()
    # No partial/temp files left behind.
    assert not list(paths.output_dir.glob(".merged.*"))
    # Exactly one thread produced the merge; the loser returned None
    # (it raced mid-merge) or the loaded artifact (it raced after).
    assert any(r is not None for r in results)
    # Idempotent re-run: loads, never re-merges.
    again = ft.consolidate_stage(paths, names)
    assert again is not None
    assert len(merges) == 1
