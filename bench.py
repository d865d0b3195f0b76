"""Benchmark: differentiable-rasterizer fwd+bwd throughput in rays/s.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is rays/s/chip through the full
differentiable render (forward + backward).  ``vs_baseline`` normalizes
against the reference CUDA pipeline's implied training throughput on an RTX
A6000: ~30k iterations in ~55 min at ~1.5 MP (README.md:220 toy-dataset
timing → ≈ 14e6 rays/s fwd+bwd incl. optimizer overhead); we use 15e6 as a
slightly generous round figure.

Note: this dense random toy scene over-saturates the static per-tile
capacity (the exact ellipse culling keeps ~565 pairs/tile mean vs the
K=384 cap, counted overflow) — the config is kept fixed for cross-round
comparability.  Measured effect of the cap (BASELINE.md round 3): max
image diff vs the overflow-free config (K=2304, max_dup=64) is 0.0027
< 1/255 — both this blend and the reference's CUDA loop terminate at
T < 1e-4, so pairs past a pixel's termination point contribute nothing
in either system; the overflow-free config costs 6× for that sub-LSB
difference.

Measurement: ITERS grad steps run inside ONE jitted ``lax.scan``.  Each
step perturbs means3d by a DIFFERENT non-zero epsilon (~1e-6, passed in
from the host as scan xs, so it is runtime data — XLA can neither
constant-fold the add nor hoist the loop-invariant pipeline out of the
scan; a traced *zero* does NOT work, the algebraic simplifier folds
x+0→x and then hoists everything).  The number therefore reflects
steady-state device throughput with the axon tunnel's per-dispatch
round-trip latency (~2-4 ms, absent on a real deployment where dispatch
overlaps compute) amortized rather than billed once per step.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

BASELINE_RAYS_S = 15e6

H, W = 512, 512
N_GAUSS = 32768
WARMUP = 3
ITERS = 20


def _watchdog() -> None:
    """Fail fast (non-zero exit, no fake metric) if the TPU tunnel hangs —
    first compiles can take minutes, an unreachable backend hangs forever."""
    budget = int(os.environ.get("BENCH_TIMEOUT_S", "2400"))

    def _bail(signum, frame):
        print(f"bench.py: no result within {budget}s "
              "(TPU backend unreachable?)", file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(budget)


def main() -> None:
    _watchdog()
    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    scene = make_toy_scene(seed=0, n=N_GAUSS, n_cameras=1, width=W, height=H)
    cam = scene.cameras[0]
    cfg = RasterConfig(method="pallas", max_dup=32, tile_capacity=384)
    bg = jnp.zeros((3,), jnp.float32)
    gt = jnp.zeros((3, H, W), jnp.float32)

    def loss_fn(means3d, scales, quats, opacities, sh_coeffs):
        out = rasterize(means3d, scales, quats, opacities, sh_coeffs, cam,
                        3, bg, cfg)
        return jnp.mean(jnp.abs(out["render"] - gt)) + 0.1 * jnp.mean(
            out["depth"])

    args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs)

    @jax.jit
    def scan_grads(args, eps):
        grad = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

        def body(acc, e):
            g = grad(args[0] + e, *args[1:])
            return jax.tree.map(jnp.add, acc, g), None

        acc, _ = jax.lax.scan(body, jax.tree.map(jnp.zeros_like, args), eps)
        return acc

    # Distinct non-zero per-step perturbations, built on the HOST and fed as
    # runtime data: ~1e-6 in world units (visually nil) but defeats both
    # constant folding and loop-invariant code motion.
    import numpy as _np
    eps = jnp.asarray(
        _np.random.default_rng(0).uniform(1e-6, 2e-6, (ITERS, 1, 1)),
        jnp.float32)

    for _ in range(WARMUP):
        g = scan_grads(args, eps)
        jax.block_until_ready(g)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        g = scan_grads(args, eps)
        jax.block_until_ready(g)
        best = min(best, time.perf_counter() - t0)

    rays_s = H * W * ITERS / best
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_rays_per_s",
        "value": round(rays_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_s / BASELINE_RAYS_S, 4),
    }))


if __name__ == "__main__":
    main()
