"""Street-scale rasterizer benchmark (production-profile scene).

VERDICT r3 item 1: the 512²/32k toy bench says little about the sort/gather
scaling at the reference's real workload (millions of gaussians at ~1.5 MP,
`/root/reference/README.md:220`).  This tool measures the fwd+bwd
differentiable render at a street-profile scene (``make_street_scene``) and
prints scene statistics, a one-line JSON summary, and (with ``--profile``)
the per-op device-time breakdown.

Run ON the TPU (foreground; the axon tunnel env does not survive
backgrounding):

    python tools/bench_street.py --n 1000000 --width 1920 --height 1088 \
        --max-dup 16 --tile-capacity 384 --iters 8 --profile
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--cameras", type=int, default=1)
    ap.add_argument("--max-dup", type=int, default=16)
    ap.add_argument("--tile-capacity", type=int, default=384)
    ap.add_argument("--vis-capacity", type=int, default=0,
                    help="visible-compaction cap (0 = off)")
    ap.add_argument("--exact-extra", type=int, default=0,
                    help="exact virtual-tile window budget (0 = off)")
    ap.add_argument("--tile-batch", type=int, default=0)
    ap.add_argument("--dup-overscan", type=int, default=0)
    ap.add_argument("--two-level", action="store_true",
                    help="two-level pair emission: the street production "
                         "tail ladder (use with --max-dup 2)")
    ap.add_argument("--method", default="pallas")
    ap.add_argument("--grad-sort", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--grad-reduce", default="sort", choices=["sort", "counts"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--stats-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default="",
                    help="also append the result line to this file "
                         "(BENCH_street.json — the committed street-scale "
                         "evidence artifact, VERDICT r4 item 6)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from street_sparse_3dgs_tpu.data.toy import make_street_scene
    from street_sparse_3dgs_tpu.ops.binning import bin_gaussians, num_tiles
    from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    t0 = time.time()
    scene = make_street_scene(seed=0, n=args.n, n_cameras=max(args.cameras, 1),
                              width=args.width, height=args.height)
    print(f"scene built in {time.time() - t0:.1f}s", file=sys.stderr)
    h, w = args.height, args.width
    cfg = RasterConfig(method=args.method, max_dup=args.max_dup,
                       tile_capacity=args.tile_capacity,
                       vis_capacity=args.vis_capacity or None,
                       grad_sort=args.grad_sort,
                       exact_extra=args.exact_extra,
                       tile_batch=args.tile_batch,
                       grad_reduce=args.grad_reduce,
                       dup_overscan=args.dup_overscan,
                       dup_tails=((262144, 6), (16384, 24), (4096, 224))
                       if args.two_level else ())

    # --- scene statistics at camera 0 (jitted separately; small outputs) ---
    @jax.jit
    def stats(means, scales, quats, opac, sh):
        proj = project_gaussians(means, scales, quats, opac, sh,
                                 scene.cameras[0], 3)
        kw = dict(vis_capacity=cfg.vis_capacity,
                  exact_extra=cfg.exact_extra,
                  dup_overscan=cfg.dup_overscan)
        if cfg.dup_tails:
            kw["dup_tails"] = cfg.dup_tails
        bins = bin_gaussians(proj, h, w, cfg.max_dup, cfg.tile_capacity,
                             **kw)
        c = bins.counts
        return dict(n_visible=jnp.sum(proj.valid), pairs=jnp.sum(c),
                    dup_overflow=bins.dup_overflow,
                    tile_overflow=bins.tile_overflow,
                    occ_mean=jnp.mean(c.astype(jnp.float32)),
                    occ_p50=jnp.percentile(c.astype(jnp.float32), 50),
                    occ_p90=jnp.percentile(c.astype(jnp.float32), 90),
                    occ_max=jnp.max(c))

    s = jax.device_get(stats(scene.means3d, scene.scales, scene.quats,
                             scene.opacities, scene.sh_coeffs))
    tx, ty = num_tiles(h, w)
    print(f"tiles {tx}x{ty}={tx * ty}  visible {int(s['n_visible'])}/{args.n}"
          f"  pairs {int(s['pairs'])}  occ mean/p50/p90/max "
          f"{s['occ_mean']:.0f}/{s['occ_p50']:.0f}/{s['occ_p90']:.0f}/"
          f"{int(s['occ_max'])}  dup_of {int(s['dup_overflow'])} "
          f"tile_of {int(s['tile_overflow'])}", file=sys.stderr)
    if args.stats_only:
        return

    bg = jnp.zeros((3,), jnp.float32)
    gt = jnp.zeros((3, h, w), jnp.float32)
    cam = scene.cameras[0]

    def loss_fn(means3d, scales, quats, opacities, sh_coeffs, camera):
        out = rasterize(means3d, scales, quats, opacities, sh_coeffs,
                        camera, 3, bg, cfg)
        return jnp.mean(jnp.abs(out["render"] - gt)) + 0.1 * jnp.mean(
            out["depth"])

    fargs = (scene.means3d, scene.scales, scene.quats, scene.opacities,
             scene.sh_coeffs)
    # --cameras > 1: round-robin a different view per scan step (the
    # training access pattern; stresses budget/tail robustness across
    # occupancy profiles instead of re-rendering one view).
    cam_idx = [i % len(scene.cameras) for i in range(args.iters)]
    cams = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[scene.cameras[i] for i in cam_idx])

    @jax.jit
    def scan_grads(fargs, eps):
        grad = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

        def body(acc, xs):
            e, camera = xs
            g = grad(fargs[0] + e, *fargs[1:], camera)
            return jax.tree.map(jnp.add, acc, g), None

        acc, _ = jax.lax.scan(
            body, jax.tree.map(jnp.zeros_like, fargs), (eps, cams))
        return acc

    eps = jnp.asarray(np.random.default_rng(0).uniform(
        1e-6, 2e-6, (args.iters, 1, 1)), jnp.float32)

    t0 = time.time()
    for _ in range(args.warmup):
        jax.block_until_ready(scan_grads(fargs, eps))
    print(f"compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(scan_grads(fargs, eps))
        best = min(best, time.perf_counter() - t0)

    step_ms = best / args.iters * 1e3
    rays_s = h * w * args.iters / best
    line = json.dumps({
        "metric": "street_fwd_bwd_rays_per_s",
        "value": round(rays_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_s / 15e6, 3),
        "step_ms": round(step_ms, 2),
        "config": {"n": args.n, "res": f"{args.width}x{args.height}",
                   "cameras": args.cameras,
                   "max_dup": args.max_dup, "K": args.tile_capacity,
                   "vis_cap": args.vis_capacity, "method": args.method,
                   "grad_sort": args.grad_sort,
                   "exact_extra": args.exact_extra,
                   "grad_reduce": args.grad_reduce,
                   "two_level": bool(args.two_level),
                   "dup_overscan": args.dup_overscan},
        "pairs": int(s["pairs"]), "visible": int(s["n_visible"]),
    })
    print(line)
    if args.json:
        with open(args.json, "a") as f:
            f.write(line + "\n")

    if args.profile:
        from street_sparse_3dgs_tpu.profiling import (print_summary,
                                                      summarize_trace,
                                                      trace_fn)
        tdir = trace_fn(lambda: jax.block_until_ready(scan_grads(fargs, eps)),
                        iters=1, warmup=0)
        rows = summarize_trace(tdir, iters=args.iters)
        print_summary(rows, top=28)


if __name__ == "__main__":
    main()
