"""Per-stage quality diagnostic for the 5-stage toy pipeline (CPU).

Prints train-view and held-out PSNR after each stage so a quality gap can
be attributed: chunk training, hierarchy build (lossless at tau=0?),
post-opt, merge.  Run:  python -u tools/pipeline_quality.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from street_sparse_3dgs_tpu.config import (ModelConfig, OptimizationConfig,
                                           PipelineConfig)
from street_sparse_3dgs_tpu.eval.render_hier import render_hierarchy_eval
from street_sparse_3dgs_tpu.hierarchy.io import load_hierarchy
from street_sparse_3dgs_tpu.pipeline.full_train import (ProjectPaths,
                                                        full_train)

from test_pipeline import make_project  # noqa: E402


def main(tmp="/tmp/pipe_quality"):
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    Path(tmp).mkdir(parents=True)
    proj = make_project(Path(tmp))
    opt = OptimizationConfig(
        iterations=800, densification_interval=100, densify_from_iter=200,
        densify_until_iter=600, opacity_reset_interval=10_000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=2e-4)
    pipe = PipelineConfig(tile_capacity=512)
    model = ModelConfig(eval=True, resolution=1)

    full_train(proj.project_dir, model, opt, pipe, skip_if_exists=True,
               coarse_iterations=200, chunk_iterations=800,
               post_iterations=300, skybox_num=500)

    mc = ModelConfig(eval=True, resolution=1, images=str(proj.images_dir))

    for name in ("0_0", "1_0"):
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
    r_test = render_hierarchy_eval(h, str(proj.colmap_dir), mc, pipe,
                                   taus=(0.0,), with_lpips=False)
    r_train = render_hierarchy_eval(h, str(proj.colmap_dir), mc, pipe,
                                    taus=(0.0,), with_lpips=False,
                                    on_train=True)
    print(f"merged: held-out tau0 {r_test[0.0]['psnr']:.2f}  "
          f"train tau0 {r_train[0.0]['psnr']:.2f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipe_quality")
