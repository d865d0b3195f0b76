"""End-to-end pipeline integration: a synthetic 2-chunk street-like project
through all 5 stages (coarse → per-chunk train → hierarchy → post-opt →
consolidation) plus the τ-sweep evaluation — the in-miniature version of
BASELINE configs[4]."""

import math
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from street_sparse_3dgs_tpu.config import (ModelConfig, OptimizationConfig,
                                           PipelineConfig)
from street_sparse_3dgs_tpu.data import colmap
from street_sparse_3dgs_tpu.data.toy import lookat_camera, random_gaussians
from street_sparse_3dgs_tpu.eval.render_hier import render_hierarchy_eval
from street_sparse_3dgs_tpu.hierarchy.io import load_hierarchy
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.pipeline.full_train import (ProjectPaths,
                                                        full_train)

W, H = 128, 96


def make_project(tmp_path, n=400, n_views=16, width=None, height=None,
                 held_out=1, *, with_depths=False, depth_cams=0,
                 with_masks=False, lidar=False, with_gt_cloud=False,
                 sfm_keep=1.0, sfm_noise=0.01):
    """Synthesize a 2-chunk project: a plane of Gaussians along x, cameras
    orbiting above.  GT images are rendered by the ORACLE at 2× resolution
    and average-pooled (the ``test_convergence.py`` de-circularization) —
    the production projection/binning/blend path never sees its own output
    as a target, so its regressions cannot cancel out of the PSNR.
    Scale knobs (defaults = the slow-test fixture) let
    ``tools/pipeline_quality_tpu.py`` run a larger flavor.

    Fork-feature knobs (VERDICT r4 item 3 — the reference's raison d'être
    composing in ONE project):
      with_depths    — oracle-true 16-bit inverse-depth PNGs for every view
                       (rectified/depths) + depth_params.json in each
                       sparse model (decayed depth-L1 supervision;
                       ``/root/reference/train_single.py:135-144``);
      depth_cams     — that many depth-only VIRTUAL cameras between the
                       photo views, written to images_depths.bin
                       (``scene/dataset_readers.py:137-205``);
      with_masks     — every TRAIN view gets a "moving object": a random
                       color block burned into the GT image at a
                       view-dependent place, with the matching alpha mask
                       (rectified/masks) excluding it — held-out views
                       stay clean, so training WITHOUT masks learns the
                       corruption and scores worse;
      lidar          — augment each chunk's init points with a dense
                       accurate "LiDAR" sample of the scene
                       (``preprocess/ss_make_chunk.py:592-630``);
      with_gt_cloud  — write chunks/<name>/chunk.ply (accurate GT points)
                       for the gt_point_cloud_constraints pruning
                       (``scene/gaussian_model.py:853-962``);
      sfm_keep/sfm_noise — degrade the SfM init (fraction kept / jitter σ)
                       so the LiDAR arm has signal to recover."""
    from PIL import Image

    width = width or W
    height = height or H
    key = jax.random.PRNGKey(7)
    means, scales, quats, opac, sh = random_gaussians(key, n, sh_degree=3,
                                                      extent=2.0)
    # Flatten to a street-like slab along x.
    means = means.at[:, 2].multiply(0.2)
    # Nearly-diffuse GT: full-strength random degree-3 SH cannot be
    # recovered from 7 training views, so a strongly view-dependent GT
    # caps HELD-OUT PSNR at ~14 dB regardless of pipeline quality (train
    # views fit 5 dB higher).  A mild view dependence keeps the SH path
    # exercised while making the held-out floor meaningful.
    sh = sh.at[:, 1:, :].multiply(0.1)

    cam_infos = []
    cameras = {1: colmap.ColmapCamera(
        1, "PINHOLE", width, height, np.array(
            [width / (2 * math.tan(0.5)), height / (2 * math.tan(0.4)),
             width / 2, height / 2]))}
    images = {}
    proj = ProjectPaths(tmp_path)
    img_dir = proj.images_dir
    img_dir.mkdir(parents=True)
    depth_dir = proj.depths_dir
    mask_dir = proj.masks_dir
    if with_depths:
        depth_dir.mkdir(parents=True)
    if with_masks:
        mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    depth_params = {}

    def render_view(cam_pos, w, h, supersample=2):
        cam_hi = lookat_camera(cam_pos, np.zeros(3), w * supersample,
                               h * supersample)
        out = rasterize(means, scales, quats, opac, sh, cam_hi, 3,
                        jnp.zeros(3), RasterConfig(method="oracle"))
        hi = jnp.clip(out["render"], 0, 1)
        img = np.array(hi.reshape(3, h, supersample, w, supersample)
                       .mean(axis=(2, 4)))
        inv = np.asarray(out["depth"][0].reshape(h, supersample, w,
                                                 supersample)
                         .mean(axis=(1, 3)))
        return img, inv

    def save_depth(stem, inv):
        dmax = max(float(inv.max()), 1e-6)
        raw = np.clip(inv / dmax * 65535.0, 0, 65535).astype(np.uint16)
        Image.fromarray(raw).save(depth_dir / f"{stem}.png")
        depth_params[stem] = {"scale": dmax, "offset": 0.0}

    # 16 views, one held out: with only 7 training views the toy slab is
    # under-constrained and held-out PSNR saturates ~6 dB below train
    # (floaters) no matter the iteration budget.
    for i in range(n_views):
        ang = 2 * math.pi * i / n_views
        pos = np.array([2.2 * math.cos(ang), 2.2 * math.sin(ang), 1.4])
        cam = lookat_camera(pos, np.zeros(3), width, height)
        img, inv = render_view(pos, width, height)
        name = f"view{i:03d}.png"
        if with_masks and i >= held_out:
            # "Moving object" corruption on TRAIN views only: a random
            # color block at a view-dependent position + its alpha mask.
            bw, bh = width // 4, height // 4
            x0 = int((width - bw) * ((i * 7) % 11) / 10)
            y0 = int((height - bh) * ((i * 5) % 7) / 6)
            img[:, y0:y0 + bh, x0:x0 + bw] = \
                rng.uniform(0, 1, size=(3, 1, 1))
            m = np.full((height, width), 255, np.uint8)
            m[y0:y0 + bh, x0:x0 + bw] = 0
            # scene loader convention: mask file = "<image name>.png".
            Image.fromarray(m).save(mask_dir / f"{name}.png")
        Image.fromarray(
            (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        ).save(img_dir / name)
        if with_depths:
            save_depth(f"view{i:03d}", inv)
        # Recover colmap extrinsics from the camera: viewmatrix = w2c.
        w2c = np.asarray(cam.viewmatrix)
        qvec = colmap.rotmat2qvec(w2c[:3, :3])
        images[i + 1] = colmap.ColmapImage(
            i + 1, qvec, w2c[:3, 3], 1, name, np.zeros((0, 2)),
            np.zeros(0, np.int64))
        cam_infos.append(cam)

    # Depth-only virtual cameras (temporal-gap LiDAR views): offset ring,
    # lower orbit — extra parallax the photo ring lacks.
    dimages = {}
    for j in range(depth_cams):
        ang = 2 * math.pi * (j + 0.5) / max(depth_cams, 1)
        pos = np.array([2.0 * math.cos(ang), 2.0 * math.sin(ang), 0.9])
        cam = lookat_camera(pos, np.zeros(3), width, height)
        _, inv = render_view(pos, width, height)
        name = f"depth{j:03d}.png"
        if with_depths:
            save_depth(f"depth{j:03d}", inv)
        w2c = np.asarray(cam.viewmatrix)
        qvec = colmap.rotmat2qvec(w2c[:3, :3])
        dimages[1000 + j] = colmap.ColmapImage(
            1000 + j, qvec, w2c[:3, 3], 1, name, np.zeros((0, 2)),
            np.zeros(0, np.int64))

    # SfM init: optionally degraded (subset + jitter) so LiDAR has signal.
    keep = rng.random(n) < sfm_keep
    n_sfm = int(keep.sum())
    sfm_xyz = (np.asarray(means, np.float64)[keep]
               + sfm_noise * rng.normal(size=(n_sfm, 3)))
    sfm_rgb = np.clip((np.asarray(sh[:, 0])[keep] * 0.28 + 0.5) * 255, 0,
                      255).astype(np.uint8)
    pts = colmap.ColmapPoints(
        xyz=sfm_xyz, rgb=sfm_rgb, error=np.zeros(n_sfm),
        ids=np.arange(n_sfm, dtype=np.int64))

    # Dense accurate points: the LiDAR chunk-init augmentation and the GT
    # constraint cloud (both sampled from the true scene).
    lidar_xyz = (np.asarray(means, np.float64)
                 + 0.005 * rng.normal(size=(n, 3)))
    lidar_rgb = np.clip((np.asarray(sh[:, 0]) * 0.28 + 0.5) * 255, 0,
                        255).astype(np.uint8)

    aligned = proj.colmap_dir / "sparse" / "0"
    colmap.write_model(cameras, images, pts, aligned)
    held = "".join(f"view{i:03d}.png\n" for i in range(held_out))
    (aligned / "test.txt").write_text(held)
    import json as _json
    if with_depths:
        (aligned / "depth_params.json").write_text(_json.dumps(depth_params))
    if dimages:
        colmap.write_images_binary(dimages, aligned / "images_depths.bin")

    # Two chunks split at x = 0, all cameras in both (toy scale).
    for ci, (lo, hi) in enumerate(((-10, 0), (0, 10))):
        cdir = proj.chunks_dir / f"{ci}_0"
        sparse = cdir / "sparse" / "0"
        m = (pts.xyz[:, 0] >= lo) & (pts.xyz[:, 0] < hi)
        cxyz, crgb = pts.xyz[m], pts.rgb[m]
        if lidar:
            lm = (lidar_xyz[:, 0] >= lo) & (lidar_xyz[:, 0] < hi)
            cxyz = np.concatenate([cxyz, lidar_xyz[lm]])
            crgb = np.concatenate([crgb, lidar_rgb[lm]])
        cpts = colmap.ColmapPoints(
            xyz=cxyz, rgb=crgb, error=np.zeros(len(cxyz)),
            ids=np.arange(len(cxyz), dtype=np.int64))
        colmap.write_model(cameras, images, cpts, sparse)
        (sparse / "test.txt").write_text(held)
        if with_depths:
            (sparse / "depth_params.json").write_text(
                _json.dumps(depth_params))
        if dimages:
            colmap.write_images_binary(dimages,
                                       sparse / "images_depths.bin")
        if with_gt_cloud:
            from street_sparse_3dgs_tpu.data.ply import store_point_cloud

            gm = (lidar_xyz[:, 0] >= lo) & (lidar_xyz[:, 0] < hi)
            store_point_cloud(cdir / "chunk.ply", lidar_xyz[gm],
                              lidar_rgb[gm])
        cx = (lo + hi) / 2 if abs(lo) < 5 and abs(hi) < 5 else np.clip(
            (lo + hi) / 2, -2, 2)
        (cdir / "center.txt").write_text(f"{cx} 0.0 0.0\n")
        (cdir / "extent.txt").write_text("2.0 2.0 2.0\n")
    return proj


# Anchored to the MEASURED CPU value of this exact fixture (held-out tau0
# 19.71, train 19.87 — deterministic seeds, round-5 calibration run; the
# on-TPU pallas pipeline measures 18.46 on its own larger flavor,
# BASELINE.md).  0.8 dB of margin: a 1 dB regression fires, library-drift
# noise (CPU runs are seed-deterministic) does not.  VERDICT r4 item 7 —
# the old floor (18.0) sat 1.7 dB under the anchor and could never fire
# before quality was already badly broken.
PSNR_FLOOR_TAU0 = 18.9
PSNR_ANCHOR_TAU0 = 19.71


@pytest.mark.slow
def test_full_train_pipeline(tmp_path):
    proj = make_project(tmp_path)
    opt = OptimizationConfig(
        iterations=800, densification_interval=100, densify_from_iter=200,
        densify_until_iter=600, opacity_reset_interval=10_000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=2e-4)
    pipe = PipelineConfig(tile_capacity=512)
    model = ModelConfig(eval=True, resolution=1)

    merged = full_train(proj.project_dir, model, opt, pipe,
                        skip_if_exists=True, coarse_iterations=200,
                        chunk_iterations=800, post_iterations=300,
                        skybox_num=500)
    assert merged is not None
    # Artifacts all exist.
    assert (proj.scaffold_dir / "point_cloud").exists()
    for name in ("0_0", "1_0"):
        assert (proj.trained_chunks_dir / name
                / "hierarchy.hier_opt.npz").exists()
    assert (proj.output_dir / "merged.hier.npz").exists()

    # Evaluate the merged hierarchy on the held-out view.
    h = load_hierarchy(proj.output_dir / "merged.hier.npz")
    assert h.skybox_count > 0
    results = render_hierarchy_eval(
        h, str(proj.colmap_dir), ModelConfig(
            eval=True, resolution=1, images=str(proj.images_dir)),
        pipe, taus=(0.0, 6.0), with_lpips=True)
    # LPIPS provenance is self-describing (VERDICT r3 #7): in this
    # zero-egress environment the fallback random features must be labeled.
    assert results[0.0]["lpips_weights"] == "random"
    assert np.isfinite(results[0.0]["lpips"])
    # QUALITY floor with teeth (VERDICT round-2 #5): the GT is oracle-
    # rendered at 2× (never the production path's own output), the view is
    # HELD OUT of training, and the metric is computed after the full
    # scaffold → chunk → hierarchy → post-opt → merge chain.  A regression
    # anywhere in that chain drops the τ=0 PSNR below the floor.
    print("pipeline tau sweep:",
          {t: round(r["psnr"], 2) for t, r in results.items()})
    assert results[0.0]["psnr"] >= PSNR_FLOOR_TAU0, results
    for tau, row in results.items():
        assert np.isfinite(row["psnr"]) and row["psnr"] > 5.0, (tau, row)
        assert 0.0 <= row["ssim"] <= 1.0

    # Idempotence: a second run skips everything.
    merged2 = full_train(proj.project_dir, model, opt, pipe,
                         skip_if_exists=True, skybox_num=500)
    assert merged2 is not None


def test_fork_features_project_loads(tmp_path):
    """The all-features project (depths + depth-only cams + masks + LiDAR +
    GT cloud) synthesizes and loads: every fork input reaches the scene
    layer (VERDICT r4 item 3 — the features composing in one project)."""
    from street_sparse_3dgs_tpu.data.scene import load_scene_info

    proj = make_project(tmp_path, n=120, n_views=6, depth_cams=3,
                        with_depths=True, with_masks=True, lidar=True,
                        with_gt_cloud=True, sfm_keep=0.3, sfm_noise=0.05)
    chunk = proj.chunks_dir / "0_0"
    cfg = ModelConfig(eval=True, source_path=str(chunk),
                      images=str(proj.images_dir),
                      depths=str(proj.depths_dir),
                      alpha_masks=str(proj.masks_dir),
                      additional_depth_maps=True,
                      gt_point_cloud_constraints=True)
    info = load_scene_info(str(chunk), cfg)
    donly = [c for c in info.train_cameras if c.is_depth_only]
    photo = [c for c in info.train_cameras if not c.is_depth_only]
    assert len(donly) == 3 and len(photo) == 5
    assert (chunk / "chunk.ply").exists()

    # LiDAR augmentation: the chunk init cloud is denser than the degraded
    # SfM subset alone.
    proj2 = make_project(tmp_path / "b", n=120, n_views=6,
                        sfm_keep=0.3, sfm_noise=0.05)
    info2 = load_scene_info(str(proj2.chunks_dir / "0_0"), ModelConfig())
    assert info.points.shape[0] > 1.5 * info2.points.shape[0]

    from street_sparse_3dgs_tpu.data.scene import load_camera_arrays

    # A corrupted train view: mask excludes the burned block.
    a = load_camera_arrays(photo[2], resolution=1)
    assert a["alpha_mask"].min() == 0.0 and a["alpha_mask"].max() == 1.0
    # Depth present, decoded, reliable.
    assert a["depth_reliable"] and a["mono_invdepth"].max() > 0
    # A depth-only camera: black image, real depth.
    d = load_camera_arrays(donly[0], resolution=1)
    assert d["is_depth_only"] and d["gt_image"].max() == 0.0
    assert d["depth_reliable"] and d["mono_invdepth"].max() > 0


@pytest.mark.slow
def test_fork_features_ab_improves_quality(tmp_path):
    """VERDICT r4 item 3: the fork's signature features (LiDAR chunk init,
    decayed mono-depth L1, depth-only virtual cameras, alpha masks over
    per-view corruption, GT-cloud pruning) COMPOSING in one 5-stage run
    must measurably beat the same scene without them — photometrically AND
    on the depth metrics.  CPU-measured anchors (deterministic seeds,
    tiled path): OFF 16.00 dB / iMAE 0.506, ON 19.18 dB / iMAE 0.401
    (BASELINE.md round 5); margins sit well inside the +3.2 dB / −0.105
    measured gaps."""
    from street_sparse_3dgs_tpu.data.scene import load_scene_info

    opt = OptimizationConfig(
        iterations=800, densification_interval=100, densify_from_iter=200,
        densify_until_iter=600, opacity_reset_interval=10_000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=2e-4)
    pipe = PipelineConfig(tile_capacity=512)

    res = {}
    for arm in ("off", "on"):
        d = tmp_path / arm
        d.mkdir(parents=True)
        proj = make_project(d, n=400, n_views=16, with_depths=True,
                            depth_cams=6, with_masks=True,
                            lidar=(arm == "on"), with_gt_cloud=True,
                            sfm_keep=0.3, sfm_noise=0.05)
        if arm == "on":
            mc = ModelConfig(eval=True, resolution=1,
                             additional_depth_maps=True,
                             gt_point_cloud_constraints=True,
                             constraint_treshold=0.15)
        else:
            mc = ModelConfig(eval=True, resolution=1, depths="no_depths",
                             alpha_masks="no_masks")
        merged = full_train(proj.project_dir, mc, opt, pipe,
                            skip_if_exists=True, coarse_iterations=200,
                            chunk_iterations=800, post_iterations=300,
                            skybox_num=500)
        assert merged is not None
        h = load_hierarchy(proj.output_dir / "merged.hier.npz")
        emc = ModelConfig(eval=True, resolution=1,
                          images=str(proj.images_dir),
                          depths=str(proj.depths_dir))
        res[arm] = render_hierarchy_eval(h, str(proj.colmap_dir), emc, pipe,
                                         taus=(0.0,), with_lpips=False)[0.0]
        print(f"fork-features arm {arm}:",
              {k: round(v, 4) for k, v in res[arm].items()
               if isinstance(v, float)})

    on, off = res["on"], res["off"]
    assert on["psnr"] >= 17.5, res
    assert on["psnr"] >= off["psnr"] + 1.0, res
    assert on["imae"] <= off["imae"] - 0.03, res
    assert on["irmse"] <= off["irmse"] - 0.03, res
