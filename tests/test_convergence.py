"""Convergence regression with teeth (VERDICT round-1 item #8).

A medium toy run (96², 1.5k iterations, densification on, fixed seed) must
reach a LOCKED PSNR floor.  Unlike ``test_pipeline.py`` (which renders its GT
with the production rasterizer and therefore only proves plumbing), the
ground truth here is rendered by the ORACLE at 2× resolution and
average-pooled down — the production path never sees its own output as a
target, so a quality regression in projection/binning/blending shows up as a
PSNR drop rather than cancelling out.

Reference quality anchor: the fork's toy-dataset runs converge to
PSNR >~ 21 on held-in views within the first 1.5k single-chunk iterations
(BASELINE.md); the locked floor below sits under the measured value by a
safety margin so only real regressions trip it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_sparse_3dgs_tpu.config import (ModelConfig, OptimizationConfig,
                                           PipelineConfig)
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.models.gaussians import (
    activate_opacity, activate_scales, create_from_pcd, sh_coeffs)
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.train import losses
from street_sparse_3dgs_tpu.train.loop import train_loop
from street_sparse_3dgs_tpu.train.step import CameraBatch, init_state

RES = 96
# Anchored to the measured 24.95 @ 1.5k iters (tile_capacity 600; CPU runs
# are seed-deterministic, so 1.45 dB of margin absorbs library drift while
# a >=1.5 dB quality regression fires — VERDICT r4 item 7; the old 20.0
# floor needed a 5 dB collapse).  The on-TPU pallas-exact anchor for the
# same flow is 25.8-26.9 (run-to-run sigma ~1.5 dB, tools/convergence_tpu).
PSNR_FLOOR = 23.5


def oracle_gt_2x(scene, cam_hi):
    """GT at 2× via the oracle blend, average-pooled to RES."""
    out = rasterize(scene.means3d, scene.scales, scene.quats,
                    scene.opacities, scene.sh_coeffs, cam_hi, 3,
                    jnp.zeros(3), RasterConfig(method="oracle"))
    img = jnp.clip(out["render"], 0.0, 1.0)
    c, h, w = img.shape
    return img.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


@pytest.mark.slow
def test_convergence_psnr_floor():
    from street_sparse_3dgs_tpu.data.toy import lookat_camera

    scene = make_toy_scene(seed=11, n=400, n_cameras=6,
                           width=RES, height=RES)
    # 2× cameras colocated with the training cameras.
    import math
    cams_hi = []
    for i in range(6):
        ang = 2.0 * math.pi * i / 6
        pos = np.array([3.0 * math.cos(ang), 3.0 * math.sin(ang), 0.8])
        cams_hi.append(lookat_camera(pos, np.zeros(3), RES * 2, RES * 2))
    gts = [oracle_gt_2x(scene, ch) for ch in cams_hi]

    key = jax.random.PRNGKey(0)
    pts = np.asarray(scene.means3d) + 0.03 * np.asarray(
        jax.random.normal(key, scene.means3d.shape))
    cols = np.clip(np.asarray(scene.sh_coeffs[:, 0, :]) * 0.28 + 0.5, 0, 1)
    params, active, meta = create_from_pcd(
        key, pts, cols, sh_degree=3, capacity=2048)

    batches = [CameraBatch(
        camera=cam, gt_image=gt,
        alpha_mask=jnp.ones((1, RES, RES)),
        mono_invdepth=jnp.zeros((1, RES, RES)),
        depth_mask=jnp.zeros((1, RES, RES)),
        depth_reliable=jnp.array(False),
        image_index=jnp.int32(i))
        for i, (cam, gt) in enumerate(zip(scene.cameras, gts))]

    opt = OptimizationConfig(
        iterations=1500, densification_interval=100, densify_from_iter=300,
        densify_until_iter=1200, opacity_reset_interval=10_000,
        densify_grad_threshold=2e-4)
    pipe = PipelineConfig(tile_capacity=1024)
    state = init_state(params, active, n_images=len(gts))
    state, meta, stats = train_loop(
        state, meta, batches, opt, pipe, ModelConfig(),
        cameras_extent=3.0, spatial_lr_scale=1.0, clamp_fraction=1.0,
        rng_seed=5)

    cfg = RasterConfig(method="tiled", tile_capacity=600)
    vals = []
    for cam, gt in zip(scene.cameras, gts):
        out = rasterize(state.params.xyz, activate_scales(state.params),
                        state.params.quats,
                        activate_opacity(state.params, meta),
                        sh_coeffs(state.params), cam, 3, jnp.zeros(3),
                        cfg, active_mask=state.active)
        vals.append(float(losses.psnr(jnp.clip(out["render"], 0, 1), gt)))
    mean_psnr = float(np.mean(vals))
    print(f"convergence PSNR {mean_psnr:.2f} (floor {PSNR_FLOOR})")
    assert mean_psnr >= PSNR_FLOOR, (
        f"quality regression: PSNR {mean_psnr:.2f} < floor {PSNR_FLOOR}")
