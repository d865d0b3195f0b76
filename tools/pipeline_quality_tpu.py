"""End-to-end 5-stage pipeline quality ON THE REAL TPU (pallas kernels).

VERDICT r3 item 2: the only full-pipeline held-out numbers were round-1
CPU results predating every round-2/3/4 kernel fix.  This drives the same
synthetic 2-chunk project as ``tests/test_pipeline.py`` (oracle-rendered
2x-supersampled GT, held-out view, skybox on) through coarse -> per-chunk
-> hierarchy -> post-opt -> merge on the TPU with
``raster_method="pallas"`` (optionally exact virtual-tile mode), then
prints the per-chunk and merged tau-sweep train/held-out PSNR table for
BASELINE.md.

The project directory PERSISTS between invocations and ``full_train`` uses
``skip_if_exists`` — rerun the command until it prints the final table
(each foreground TPU window is limited to ~590 s; stages resume).

    python -u tools/pipeline_quality_tpu.py [--dir /tmp/pipe_quality_tpu]
        [--exact] [--iters-scale 1.0]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/pipe_quality_tpu")
    ap.add_argument("--exact", action="store_true",
                    help="exact virtual-tile mode (exact_extra=128)")
    ap.add_argument("--grad-sort", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the project dir first")
    ap.add_argument("--large", action="store_true",
                    help="larger flavor: 1200 gaussians, 24 views (2 held "
                         "out), 192x144, exact production raster config")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from street_sparse_3dgs_tpu.config import (ModelConfig,
                                               OptimizationConfig,
                                               PipelineConfig)
    from street_sparse_3dgs_tpu.eval.render_hier import render_hierarchy_eval
    from street_sparse_3dgs_tpu.hierarchy.io import load_hierarchy
    from street_sparse_3dgs_tpu.pipeline.full_train import (ProjectPaths,
                                                            full_train)
    from test_pipeline import make_project

    tmp = Path(args.dir)
    if args.fresh:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    if (tmp / "camera_calibration").exists():
        proj = ProjectPaths(tmp)
        print("reusing project", tmp, flush=True)
    else:
        tmp.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        if args.large:
            proj = make_project(tmp, n=1200, n_views=24, width=192,
                                height=144, held_out=2)
        else:
            proj = make_project(tmp)
        print(f"project built in {time.time() - t0:.0f}s", flush=True)

    opt = OptimizationConfig(
        iterations=800, densification_interval=100, densify_from_iter=200,
        densify_until_iter=600, opacity_reset_interval=10_000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=2e-4)
    if args.large:
        pipe = PipelineConfig(
            raster_method="pallas", tile_capacity=128, max_dup=64,
            exact_extra=512, grad_sort=args.grad_sort,
            grad_reduce="counts")
    else:
        pipe = PipelineConfig(
            raster_method="pallas", tile_capacity=384, max_dup=64,
            exact_extra=128 if args.exact else 0, grad_sort=args.grad_sort)
    model = ModelConfig(eval=True, resolution=1)

    t0 = time.time()
    merged = full_train(proj.project_dir, model, opt, pipe,
                        skip_if_exists=True, coarse_iterations=200,
                        chunk_iterations=800, post_iterations=300,
                        skybox_num=500)
    print(f"full_train returned in {time.time() - t0:.0f}s", flush=True)
    assert merged is not None

    mc = ModelConfig(eval=True, resolution=1, images=str(proj.images_dir))

    per_chunk = () if args.large else ("0_0", "1_0")   # tunnel-time budget
    for name in per_chunk:
        for hier in ("hierarchy.hier.npz", "hierarchy.hier_opt.npz"):
            p = proj.trained_chunks_dir / name / hier
            if not p.exists():
                continue
            h = load_hierarchy(p)
            r_test = render_hierarchy_eval(
                h, str(proj.chunks_dir / name), mc, pipe, taus=(0.0,),
                with_lpips=False)
            r_train = render_hierarchy_eval(
                h, str(proj.chunks_dir / name), mc, pipe, taus=(0.0,),
                with_lpips=False, on_train=True)
            print(f"{name}/{hier}: held-out tau0 "
                  f"{r_test[0.0]['psnr']:.2f}  train tau0 "
                  f"{r_train[0.0]['psnr']:.2f}", flush=True)

    h = load_hierarchy(proj.output_dir / "merged.hier.npz")
    taus = (0.0, 3.0, 6.0, 15.0)
    t0 = time.time()
    r_test = render_hierarchy_eval(h, str(proj.colmap_dir), mc, pipe,
                                   taus=taus, with_lpips=True)
    print(f"held-out sweep in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    r_train = render_hierarchy_eval(h, str(proj.colmap_dir), mc, pipe,
                                    taus=(0.0,), with_lpips=False,
                                    on_train=True)
    print(f"merged train tau0 PSNR {r_train[0.0]['psnr']:.2f} "
          f"({time.time() - t0:.0f}s)", flush=True)
    for t in taus:
        r = r_test[t]
        print(f"merged held-out tau{t:g}: PSNR {r['psnr']:.2f} "
              f"SSIM {r['ssim']:.3f} LPIPS {r['lpips']:.3f} "
              f"({r.get('lpips_weights', '?')})", flush=True)


if __name__ == "__main__":
    main()
