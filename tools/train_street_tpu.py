"""Street-scale TRAINING demo on the real TPU (VERDICT r4 item 5).

Round 4 benched the rasterizer at 1M gaussians / street resolution, but
nothing ever *trained* at that scale.  This tool runs a sustained,
RESUMABLE training run on the synthetic street scene: GT images rendered
once by the TILED path (a different compute path than the pallas trainee),
init from a ~100k subsample of the scene points, densification growing the
model toward 1M+ rows through the EXACT virtual-tile path with the
counts-mode backward and the SELF-SIZED emission/window knobs
(``exact_extra=-1`` → ops/autosize.py) — exercising capacity growth,
budget growth, and the corrupted-gradient guard under real drift.

Each invocation trains until ``--wall`` seconds (fits the ~590 s TPU
foreground window), checkpoints, and appends progress to ``log.jsonl``:

    python -u tools/train_street_tpu.py            # repeat until --iters
    python -u tools/train_street_tpu.py --status   # summarize the log
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

W, H = 960, 544


def build_gt(root: Path, n: int, views: int, seed: int = 0):
    """Render GT images once + init points.

    GT rides the EXACT pallas path with AUTOSIZED knobs (tile_overflow
    asserted 0 — no dropped contributions; the tiled path would need
    K > 4k here and compiles minutes per view at this scale).  The
    trainee uses the same kernel family, so this run demonstrates
    street-scale training MECHANICS (densify growth, budget growth,
    guard); quality de-circularization is covered by the oracle-GT
    convergence flows (tools/convergence_tpu.py)."""
    import jax
    import jax.numpy as jnp

    from street_sparse_3dgs_tpu.data.toy import make_street_scene
    from street_sparse_3dgs_tpu.ops.autosize import autosize_raster
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    scene = make_street_scene(seed=seed, n=n, n_cameras=views, width=W,
                              height=H)
    knobs = autosize_raster(scene.means3d, scene.scales, scene.quats,
                            scene.opacities, scene.sh_coeffs,
                            list(scene.cameras), 3, H, W, 128, max_dup=0)
    print("gt autosize:", knobs, flush=True)
    cfg = RasterConfig(method="pallas", tile_capacity=128,
                       max_dup=knobs.max_dup,
                       dup_overscan=knobs.dup_overscan,
                       dup_tails=knobs.dup_tails,
                       exact_extra=knobs.exact_extra)
    gts, cams = [], []
    render = jax.jit(lambda m, cam: rasterize(
        m, scene.scales, scene.quats, scene.opacities, scene.sh_coeffs,
        cam, 3, jnp.zeros(3), cfg))
    for i, cam in enumerate(scene.cameras):
        t0 = time.time()
        out = render(scene.means3d, cam)
        img = np.asarray(jnp.clip(out["render"], 0, 1), np.float16)
        assert int(out["tile_overflow"]) == 0
        print(f"gt view {i}: {time.time() - t0:.0f}s "
              f"dup_of={int(out['dup_overflow'])}", flush=True)
        gts.append(img)
        cams.append(cam)
    rng = np.random.default_rng(1)
    sel = rng.choice(n, size=100_000, replace=False)
    pts = np.asarray(scene.means3d)[sel] + 0.02 * rng.normal(size=(100_000, 3))
    cols = np.clip(np.asarray(scene.sh_coeffs[sel, 0]) * 0.28 + 0.5, 0, 1)
    np.savez_compressed(
        root / "gt.npz", gts=np.stack(gts), pts=pts, cols=cols,
        viewmats=np.stack([np.asarray(c.viewmatrix) for c in cams]))
    return scene.cameras, gts, pts, cols


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/train_street_tpu")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--wall", type=float, default=540.0,
                    help="whole-invocation budget (s): the loop starts a "
                         "new slice only if the last slice's wall + the "
                         "checkpoint write still fit")
    # Slice ≥ 2× densification_interval: the loop's cadence counter is
    # local to a slice, so densify fires at local iters 100 and 200.
    ap.add_argument("--slice", type=int, default=200)
    ap.add_argument("--status", action="store_true")
    args = ap.parse_args()
    root = Path(args.dir)
    root.mkdir(parents=True, exist_ok=True)
    log = root / "log.jsonl"

    if args.status:
        for ln in log.read_text().splitlines()[-10:]:
            print(ln)
        return

    t_start = time.time()      # whole-invocation budget (GT build included)
    import jax
    jax.config.update("jax_compilation_cache_dir", str(root / "jax_cache"))
    import jax.numpy as jnp

    from street_sparse_3dgs_tpu.config import (ModelConfig,
                                               OptimizationConfig,
                                               PipelineConfig)
    from street_sparse_3dgs_tpu.data.toy import make_street_scene
    from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
    from street_sparse_3dgs_tpu.models.serialize import (load_checkpoint,
                                                         save_checkpoint)
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
    from street_sparse_3dgs_tpu.train.loop import train_loop
    from street_sparse_3dgs_tpu.train.step import CameraBatch, init_state

    # Cameras regenerate deterministically (the scene RNG consumes the
    # same stream only at the same n); GT loads from disk.
    if not (root / "gt.npz").exists():
        build_gt(root, args.n, args.views)
    scene = make_street_scene(seed=0, n=args.n, n_cameras=args.views,
                              width=W, height=H)
    z = np.load(root / "gt.npz")
    gts, pts, cols = z["gts"], z["pts"], z["cols"]

    batches = [CameraBatch(
        camera=cam, gt_image=jnp.asarray(gts[i], jnp.float32),
        alpha_mask=jnp.ones((1, H, W), jnp.float32),
        mono_invdepth=jnp.zeros((1, H, W), jnp.float32),
        depth_mask=jnp.zeros((1, H, W), jnp.float32),
        depth_reliable=jnp.asarray(False),
        image_index=jnp.int32(i)) for i, cam in enumerate(scene.cameras)]

    ckpt = root / "ckpt.npz"
    if ckpt.exists():
        state, meta, start_it = load_checkpoint(ckpt)
        print(f"resumed at iter {start_it}, capacity {meta.capacity}, "
              f"active {int(jnp.sum(state.active))}", flush=True)
    else:
        key = jax.random.PRNGKey(0)
        params, active, meta = create_from_pcd(
            key, pts, cols, sh_degree=3, capacity=262_144)
        state = init_state(params, active, n_images=args.views)
        start_it = 0

    # densify_from_iter = 0: train_loop's cadence counter is LOCAL to each
    # slice, so the global warmup is expressed via densify_enabled below.
    opt = OptimizationConfig(
        iterations=args.iters, densification_interval=100,
        densify_from_iter=0, densify_until_iter=10**9,
        opacity_reset_interval=10**9, position_lr_init=1.6e-5,
        position_lr_final=1.6e-7, densify_grad_threshold=2e-5,
        percent_dense=0.0001)
    densify_until = int(args.iters * 0.85)
    pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                          exact_extra=-1, grad_reduce="counts",
                          grad_sort="bf16")
    model_cfg = ModelConfig()

    it = start_it
    extent = 60.0
    last_slice = 120.0        # first-slice estimate (compile-heavy)
    while it < args.iters and (time.time() - t_start + 1.3 * last_slice
                               + 45.0 < args.wall):
        n_slice = min(args.slice, args.iters - it)
        t0 = time.time()
        state, meta, stats = train_loop(
            state, meta, batches, opt, pipe, model_cfg,
            cameras_extent=extent, spatial_lr_scale=extent,
            iterations=n_slice,
            densify_enabled=(100 <= it < densify_until),
            rng_seed=it)
        # train_loop counts its own iterations; carry the global position
        # (state.step keeps the true optimizer step count).
        pipe = stats["final_pipe"]          # autosized/grown knobs persist
        it += n_slice
        wall = time.time() - t0
        last_slice = wall
        rec = dict(it=it, wall_per_iter=round(wall / n_slice, 3),
                   n_active=int(jnp.sum(state.active)),
                   capacity=int(meta.capacity),
                   exact_extra=int(pipe.exact_extra),
                   growths=stats["exact_growths"],
                   cap_growths=stats["overflows"],
                   skipped=stats["skipped_updates"],
                   tile_of=stats["tile_overflow"],
                   dup_of=stats["dup_overflow"],
                   loss=round(float(np.mean(stats["losses"][-10:])), 5))
        with log.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    save_checkpoint(ckpt, state, meta, it)
    print(f"checkpointed at iter {it} "
          f"({time.time() - t_start:.0f}s this window)", flush=True)

    if it >= args.iters:
        # Final train PSNR over the first 4 views through the exact path.
        from street_sparse_3dgs_tpu.models.gaussians import (
            activate_opacity, activate_scales, sh_coeffs)
        from street_sparse_3dgs_tpu.train.step import raster_config

        if pipe.exact_extra < 0:
            # Re-invocation after completion: no slice ran, so the -1
            # sentinel was never resolved — autosize for the render.
            from street_sparse_3dgs_tpu.train.loop import autosize_pipeline

            pipe = autosize_pipeline(pipe, state, meta, batches)

        cfg = raster_config(pipe)
        psnrs = []
        for b in batches[:4]:
            out = rasterize(state.params.xyz, activate_scales(state.params),
                            state.params.quats,
                            activate_opacity(state.params, meta),
                            sh_coeffs(state.params), b.camera, 3,
                            jnp.zeros(3), cfg, active_mask=state.active)
            img = np.clip(np.asarray(out["render"]), 0, 1)
            mse = float(np.mean((img - np.asarray(b.gt_image)) ** 2))
            psnrs.append(-10 * np.log10(mse))
        print(f"FINAL: iters={it} n_active={int(jnp.sum(state.active))} "
              f"train PSNR (4 views) = "
              f"{np.mean(psnrs):.2f} {['%.1f' % p for p in psnrs]}",
              flush=True)


if __name__ == "__main__":
    main()
