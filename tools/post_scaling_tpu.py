"""Post-opt step cost vs hierarchy size: mask form is O(nodes), the
compacted form is O(cut) (VERDICT round-2 #6 "done" measurement).

Builds synthetic balanced hierarchies of growing node count with a FIXED
~2k-node cut at the render limit, and times one post-opt grad step through
each path on the real TPU.  Run:  python -u tools/post_scaling_tpu.py
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

from street_sparse_3dgs_tpu.config import OptimizationConfig, PipelineConfig
from street_sparse_3dgs_tpu.data.toy import lookat_camera
from street_sparse_3dgs_tpu.hierarchy.structure import Hierarchy, select_cut
from street_sparse_3dgs_tpu.models.gaussians import GaussianParams
from street_sparse_3dgs_tpu.train.post import init_post_state, make_post_step
from street_sparse_3dgs_tpu.train.step import CameraBatch


def synth_hierarchy(n_leaves: int, seed: int = 0) -> Hierarchy:
    """Balanced binary tree over random leaves in a unit-ish box: leaves
    first (builder convention), each internal level follows, root last."""
    rng = np.random.default_rng(seed)
    counts = []
    c = n_leaves
    while c > 1:
        counts.append(c)
        c = (c + 1) // 2
    counts.append(1)
    n_nodes = sum(counts)
    parent = np.full(n_nodes, -1, np.int32)
    child_start = np.zeros(n_nodes, np.int32)
    child_count = np.zeros(n_nodes, np.int32)
    level_start = np.cumsum([0] + counts[:-1])
    for li in range(len(counts) - 1):
        s, n = level_start[li], counts[li]
        ps = level_start[li + 1]
        for_child = np.arange(n)
        parent[s:s + n] = ps + for_child // 2
    for li in range(1, len(counts)):
        s, n = level_start[li], counts[li]
        cs, cn = level_start[li - 1], counts[li - 1]
        ids = np.arange(n)
        child_start[s:s + n] = cs + ids * 2
        child_count[s:s + n] = np.minimum(2, cn - ids * 2)

    xyz = np.zeros((n_nodes, 3), np.float32)
    xyz[:n_leaves] = rng.uniform(-1, 1, (n_leaves, 3))
    half = np.zeros((n_nodes, 3), np.float32)
    half[:n_leaves] = 0.01
    for li in range(1, len(counts)):
        s, n = level_start[li], counts[li]
        for i in range(n):
            c0 = child_start[s + i]
            cc = child_count[s + i]
            ch = slice(c0, c0 + cc)
            lo = (xyz[ch] - half[ch]).min(0)
            hi = (xyz[ch] + half[ch]).max(0)
            xyz[s + i] = (lo + hi) / 2
            half[s + i] = (hi - lo) / 2
    size = 2.0 * np.linalg.norm(half, axis=1).astype(np.float32) + 1e-3

    k = 16  # sh_degree 3
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(rng.normal(0, 0.2, (n_nodes, 1, 3)),
                                jnp.float32),
        features_rest=jnp.zeros((n_nodes, k - 1, 3), jnp.float32),
        log_scales=jnp.full((n_nodes, 3), math.log(0.02), jnp.float32),
        quats=jnp.tile(jnp.asarray([1., 0., 0., 0.], jnp.float32),
                       (n_nodes, 1)),
        opacity_raw=jnp.full((n_nodes, 1), 0.7, jnp.float32),
    )
    return Hierarchy(params=params, parent=jnp.asarray(parent),
                     child_start=jnp.asarray(child_start),
                     child_count=jnp.asarray(child_count),
                     box_center=jnp.asarray(xyz), box_half=jnp.asarray(half),
                     size=jnp.asarray(size),
                     anchors=jnp.zeros((n_nodes,), bool), skybox_count=0)


def time_step(step, state, batch, limit, iters=5):
    s, aux = step(state, batch, limit, jnp.eye(3, 4))
    jax.block_until_ready(s.params.xyz)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        cur = state
        for _ in range(iters):
            cur, aux = step(cur, batch, limit, jnp.eye(3, 4))
        jax.block_until_ready(cur.params.xyz)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, int(aux["n_selected"]), int(aux.get("cut_overflow", 0))


def main():
    res = 256
    cam = lookat_camera(np.array([3.0, 0.0, 1.0]), np.zeros(3), res, res)
    batch = CameraBatch(camera=cam,
                        gt_image=jnp.zeros((3, res, res)),
                        alpha_mask=jnp.ones((1, res, res)),
                        mono_invdepth=jnp.zeros((1, res, res)),
                        depth_mask=jnp.zeros((1, res, res)),
                        depth_reliable=jnp.array(False),
                        image_index=jnp.int32(0))
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=512, max_dup=16)

    for n_leaves in (32_768, 131_072, 524_288):
        h = synth_hierarchy(n_leaves)
        # A limit that lands the cut on an interior level (~2k nodes).
        topo = h._replace(params=None)
        lo, hi = 1e-5, 10.0
        for _ in range(40):
            mid = math.sqrt(lo * hi)
            n_sel = int(jnp.sum(select_cut(topo, cam.campos, mid).selected))
            if n_sel > 2048:
                lo = mid
            else:
                hi = mid
        limit = hi
        n_sel = int(jnp.sum(select_cut(topo, cam.campos, limit).selected))

        mask_step = make_post_step(h, opt, pipe, skybox_locked=False,
                                   use_trained_exp=False)
        t_mask, _, _ = time_step(mask_step, init_post_state(h), batch,
                                 jnp.float32(limit))
        comp_step = make_post_step(h, opt, pipe, skybox_locked=False,
                                   use_trained_exp=False,
                                   compact_capacity=4096)
        t_comp, _, ovf = time_step(comp_step, init_post_state(h), batch,
                                   jnp.float32(limit))
        print(f"nodes {h.n_nodes:>9,} cut {n_sel:>5}: mask {t_mask:8.1f} ms"
              f"  compact {t_comp:6.1f} ms  (x{t_mask / t_comp:.1f},"
              f" ovf {ovf})", flush=True)


if __name__ == "__main__":
    main()
