"""Fork-features end-to-end A/B on the real TPU (VERDICT r4 item 3).

The reference fork's reason to exist is LiDAR chunk init + mono-depth
supervision + depth-only virtual cameras + alpha masks + GT-cloud pruning
COMPOSING in one training run.  This drives the all-features synthetic
project (``tests/test_pipeline.py::make_project`` fork knobs) through the
full 5-stage pipeline twice:

  arm ON  — LiDAR-augmented chunk init, depth L1 (decayed) on every view,
            depth-only virtual cameras, alpha masks over the per-view
            "moving object" corruption, GT-cloud constraint pruning;
  arm OFF — same scene and corrupted images, SfM-only init, none of the
            features enabled (what vanilla hierarchical 3DGS would see).

Both arms evaluate against the CLEAN held-out view WITH oracle-true depth
(iMAE/iRMSE), so the table answers: do the fork's features measurably help
photometric AND depth quality?  Results land in ``<dir>/<arm>/results.json``
and ``--report`` prints the A/B table for BASELINE.md.

Each arm is resumable across the ~590 s TPU foreground windows
(``skip_if_exists``):

    python -u tools/fork_features_tpu.py --arm on     # repeat until done
    python -u tools/fork_features_tpu.py --arm off
    python -u tools/fork_features_tpu.py --report
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def build_project(root: Path, arm: str, scale: float = 1.0):
    from test_pipeline import make_project

    d = root / arm
    if (d / "camera_calibration").exists():
        from street_sparse_3dgs_tpu.pipeline.full_train import ProjectPaths

        print(f"reusing {arm} project", d, flush=True)
        return ProjectPaths(d)
    d.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    proj = make_project(
        d, n=int(400 * scale), n_views=16,
        with_depths=True, depth_cams=6, with_masks=True,
        lidar=(arm == "on"), with_gt_cloud=True,
        # Degraded SfM: the LiDAR augmentation has signal to recover.
        sfm_keep=0.3, sfm_noise=0.05)
    print(f"{arm} project built in {time.time() - t0:.0f}s", flush=True)
    return proj


def arm_model_cfg(arm: str, proj):
    from street_sparse_3dgs_tpu.config import ModelConfig

    if arm == "on":
        return ModelConfig(eval=True, resolution=1,
                           additional_depth_maps=True,
                           gt_point_cloud_constraints=True,
                           constraint_treshold=0.15)
    # OFF: point depth/mask dirs at non-existent names so the auto-enable
    # in full_train._model_cfg_for stays off (files on disk are shared).
    return ModelConfig(eval=True, resolution=1, depths="no_depths",
                       alpha_masks="no_masks")


def run_arm(root: Path, arm: str, scale: float, cpu: bool = False) -> None:
    import numpy as np

    from street_sparse_3dgs_tpu.config import (OptimizationConfig,
                                               PipelineConfig, ModelConfig)
    from street_sparse_3dgs_tpu.eval.render_hier import render_hierarchy_eval
    from street_sparse_3dgs_tpu.hierarchy.io import load_hierarchy
    from street_sparse_3dgs_tpu.pipeline.full_train import full_train

    proj = build_project(root, arm, scale)
    opt = OptimizationConfig(
        iterations=800, densification_interval=100, densify_from_iter=200,
        densify_until_iter=600, opacity_reset_interval=10_000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=2e-4)
    pipe = PipelineConfig(raster_method="pallas", tile_capacity=384,
                          max_dup=64, exact_extra=128, grad_sort="bf16")
    if cpu:
        # CPU plumbing validation: interpret-mode pallas is too slow.
        pipe = PipelineConfig(raster_method="tiled", tile_capacity=512)
    t0 = time.time()
    merged = full_train(proj.project_dir, arm_model_cfg(arm, proj), opt,
                        pipe, skip_if_exists=True, coarse_iterations=200,
                        chunk_iterations=800, post_iterations=300,
                        skybox_num=500)
    print(f"full_train returned in {time.time() - t0:.0f}s", flush=True)
    if merged is None:
        print("arm not finished yet — rerun this command", flush=True)
        return

    # Eval with depth GT in BOTH arms (clean held-out view, oracle depth).
    mc = ModelConfig(eval=True, resolution=1, images=str(proj.images_dir),
                    depths=str(proj.depths_dir))
    h = load_hierarchy(proj.output_dir / "merged.hier.npz")
    res = {}
    for split, on_train in (("test", False), ("train", True)):
        r = render_hierarchy_eval(h, str(proj.colmap_dir), mc, pipe,
                                  taus=(0.0,), with_lpips=False,
                                  on_train=on_train)
        res[split] = {k: v for k, v in r[0.0].items()
                      if isinstance(v, float)}
    n_leaves = int(np.sum(np.asarray(h.is_leaf))) if hasattr(h, "is_leaf") \
        else -1
    res["n_nodes"] = int(h.n_nodes)
    (root / arm / "results.json").write_text(json.dumps(res, indent=2))
    print(json.dumps(res, indent=2), flush=True)


def report(root: Path) -> None:
    rows = {}
    for arm in ("off", "on"):
        p = root / arm / "results.json"
        if not p.exists():
            print(f"arm {arm}: no results yet")
            continue
        rows[arm] = json.loads(p.read_text())
    if len(rows) == 2:
        keys = ("psnr", "ssim", "imae", "irmse")
        print(f"{'metric':10s} {'OFF':>10s} {'ON':>10s}   (held-out tau0)")
        for k in keys:
            a = rows["off"]["test"].get(k)
            b = rows["on"]["test"].get(k)
            if a is None or b is None:
                continue
            print(f"{k:10s} {a:10.4f} {b:10.4f}")
        print(f"{'train psnr':10s} {rows['off']['train']['psnr']:10.4f} "
              f"{rows['on']['train']['psnr']:10.4f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/fork_features_tpu")
    ap.add_argument("--arm", choices=["on", "off"])
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    root = Path(args.dir)
    if args.report:
        report(root)
        return
    if not args.arm:
        raise SystemExit("pass --arm on|off or --report")
    print("backend:", jax.default_backend(), flush=True)
    run_arm(root, args.arm, args.scale, cpu=args.cpu)


if __name__ == "__main__":
    main()
