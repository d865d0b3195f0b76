"""On-chip parity + perf sweep for the rasterizer (run on the REAL TPU).

CPU interpret-mode tests CANNOT catch two classes of real-TPU bugs (both
bitten in round 2):
  - XLA's DEFAULT matmul precision on TPU is single-pass bf16 on the MXU
    (interpret mode computes true f32);
  - Mosaic-compiled control flow exercises different numeric paths than
    per-op interpretation.

Run:  python -u scratch/tpu_parity.py            (~5 min incl. compiles)
Pass: pallas-vs-oracle image max diff < 6e-3 (boundary flips only) and
      grad max diffs within ~2x of tiled-vs-oracle; bench >= 15 Mrays/s.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

def parity():
    s = make_toy_scene(seed=0, n=1024, n_cameras=1, width=128, height=96)
    bg = jnp.array([0.3, 0.5, 0.7])

    def run(cfg):
        def loss(m, sc):
            out = rasterize(m, sc, s.quats, s.opacities, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return (jnp.mean(out["render"] ** 2)
                    + 0.05 * jnp.mean(out["depth"])), out["render"]
        (l, img), g = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True))(s.means3d, s.scales)
        return np.asarray(img), [np.asarray(x) for x in g]

    imgO, gO = run(RasterConfig(method="oracle"))
    imgT, gT = run(RasterConfig(method="tiled", max_dup=64,
                                tile_capacity=512))
    imgP, gP = run(RasterConfig(method="pallas", max_dup=64,
                                tile_capacity=512))
    # Exact (virtual-tile) production path: multi-window state carry +
    # counts-based backward segmentation + two-level emission.
    imgE, gE = run(RasterConfig(method="pallas", max_dup=2, dup_overscan=16,
                                dup_tails=((2048, 6), (512, 24), (128, 96)),
                                tile_capacity=128, exact_extra=128,
                                grad_reduce="counts"))
    print("img  tiled-oracle max", np.abs(imgT - imgO).max(),
          "| pallas-oracle max", np.abs(imgP - imgO).max(),
          "| exact-pallas max", np.abs(imgE - imgP).max())
    for i, nm in enumerate(["dmeans", "dscales"]):
        print(f"{nm}: tiled-oracle {np.abs(gT[i]-gO[i]).max():.3e} "
              f"| pallas-oracle {np.abs(gP[i]-gO[i]).max():.3e} "
              f"| exact-pallas {np.abs(gE[i]-gP[i]).max():.3e}")

def bench():
    H, W, N = 512, 512, 32768
    s = make_toy_scene(seed=0, n=N, n_cameras=1, width=W, height=H)
    cfg = RasterConfig(method="pallas", max_dup=32, tile_capacity=384)
    gt = jnp.zeros((3, H, W)); bg = jnp.zeros(3)

    def loss_fn(*a):
        out = rasterize(*a, s.cameras[0], 3, bg, cfg)
        return (jnp.mean(jnp.abs(out["render"] - gt))
                + 0.1 * jnp.mean(out["depth"]))

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = (s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs)
    t0 = time.time()
    g = grad_fn(*args); jax.block_until_ready(g)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    for _ in range(4):
        g = grad_fn(*args)
    jax.block_until_ready(g)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            g = grad_fn(*args)
        jax.block_until_ready(g)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"fwd+bwd best {best*1e3:.2f} ms -> {H*W/best/1e6:.2f} Mrays/s")

if __name__ == "__main__":
    parity()
    bench()
