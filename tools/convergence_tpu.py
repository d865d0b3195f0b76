"""On-chip convergence comparison: train the toy scene through a chosen
raster method and report held-in PSNR (VERDICT round-2 item #3 root-cause
harness — the Pallas path must not train worse than the tiled path).

Run on the REAL TPU (foreground):  python -u tools/convergence_tpu.py pallas
                                   python -u tools/convergence_tpu.py tiled
Configs are IDENTICAL across methods (same binning caps, same seeds); the
only difference is the blend implementation, so a PSNR gap isolates blend
numerics.  Eval renders use the same method as training.
"""
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from street_sparse_3dgs_tpu.config import (ModelConfig, OptimizationConfig,
                                           PipelineConfig)
from street_sparse_3dgs_tpu.data.toy import lookat_camera, make_toy_scene
from street_sparse_3dgs_tpu.models.gaussians import (
    activate_opacity, activate_scales, create_from_pcd, sh_coeffs)
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.train import losses
from street_sparse_3dgs_tpu.train.loop import train_loop
from street_sparse_3dgs_tpu.train.step import CameraBatch, init_state

RES = 96


def oracle_gt_2x(scene, cam_hi):
    out = rasterize(scene.means3d, scene.scales, scene.quats,
                    scene.opacities, scene.sh_coeffs, cam_hi, 3,
                    jnp.zeros(3), RasterConfig(method="oracle"))
    img = jnp.clip(out["render"], 0.0, 1.0)
    c, h, w = img.shape
    return img.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def main(method: str, iters: int = 1500, seed: int = 5) -> None:
    scene = make_toy_scene(seed=11, n=400, n_cameras=6, width=RES, height=RES)
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
        iterations=iters, densification_interval=100, densify_from_iter=300,
        densify_until_iter=1200, opacity_reset_interval=10_000,
        densify_grad_threshold=2e-4)
    if method == "pallas-exact":
        # Round-4 production path: exact virtual-tile windows + counts-based
        # backward segmentation + bf16-packed gradient sort.
        pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                              exact_extra=1024, grad_reduce="counts",
                              grad_sort="bf16")
    else:
        pipe = PipelineConfig(tile_capacity=1024, raster_method=method)
    state = init_state(params, active, n_images=len(gts))
    t0 = time.time()
    state, meta, stats = train_loop(
        state, meta, batches, opt, pipe, ModelConfig(),
        cameras_extent=3.0, spatial_lr_scale=1.0, clamp_fraction=1.0,
        rng_seed=seed)
    wall = time.time() - t0

    if method == "pallas-exact":
        cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=64,
                           exact_extra=1024)
    else:
        cfg = RasterConfig(method=method, tile_capacity=1024, max_dup=64)
    vals = []
    for cam, gt in zip(scene.cameras, gts):
        out = rasterize(state.params.xyz, activate_scales(state.params),
                        state.params.quats,
                        activate_opacity(state.params, meta),
                        sh_coeffs(state.params), cam, 3, jnp.zeros(3),
                        cfg, active_mask=state.active)
        vals.append(float(losses.psnr(jnp.clip(out["render"], 0, 1), gt)))
    print(f"method={method} iters={iters} seed={seed} wall={wall:.0f}s "
          f"PSNR={np.mean(vals):.2f} (per-view {['%.1f' % v for v in vals]}) "
          f"n_active={int(jnp.sum(state.active))}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pallas",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1500,
         int(sys.argv[3]) if len(sys.argv) > 3 else 5)
