"""Validate the roofline's kernel floor (VERDICT r4 item 8).

Measures, at the street production config, the exact-mode forward blend
kernel against a STUB variant whose per-block body keeps all the window
mechanics (meta reads, pixel coords, cross-window scratch carry, per-block
cond, all 10 channel loads, output/state write gating) but replaces the
blend math (~38 slot-ops incl. 2×exp + two 2-pass triangular MXU cumsums)
with a 10-load lane reduction.  The stub's runtime bounds the "per-window
mechanics + memory" share of the kernel; the difference is the VPU math the
roofline's ~17 ms hand-counted floor models.

Run ON the TPU (foreground):  python tools/kernel_floor_tpu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from street_sparse_3dgs_tpu.data.toy import make_street_scene
from street_sparse_3dgs_tpu.ops import pallas_blend as pb
from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians

H, W = 1088, 1920
KCAP = 128
EXTRA = 9216
TAILS = ((262144, 6), (16384, 24), (4096, 224))


def _make_stub_kernel(tiles_x: int, tb: int, level: int):
    """Window mechanics with progressively less work:
    level 2 — all 10 channel loads, one [P,KB] FMA+reduce per channel;
    level 1 — all 10 channel loads, ONE [P,KB] FMA+reduce total;
    level 0 — no channel loads (pure mechanics + one [P,KB] reduce)."""
    def kernel(meta_ref, attrs_ref, bg_ref, out_ref, state_ref):
        k_cap = attrs_ref.shape[2]
        n_blocks = k_cap // KB
        for sub in range(tb):
            vt = pl.program_id(0) * tb + sub
            t = meta_ref[pb.MT_T, vt]
            w = meta_ref[pb.MT_W, vt]
            count = meta_ref[pb.MT_CNT, vt]
            if level >= 0:
                px, py = pb._coords_of_tile(tiles_x, t)
            first = w == 0
            acc = jnp.where(first, jnp.zeros((pb.P, 1), jnp.float32),
                            state_ref[:, 0:1])

            def body(kb, acc):
                all_done = kb * KB >= count

                def live(_):
                    sl = pl.ds(kb * KB, KB)
                    if level == 2:
                        s = px * 0.0
                        for c in range(pb.N_CH):
                            ch = attrs_ref[sub, c, sl][None, :].astype(
                                jnp.float32)
                            s = s + jnp.sum(px * ch, axis=1, keepdims=True)
                        return acc + s
                    if level == 1:
                        tot = attrs_ref[sub, 0, sl][None, :].astype(
                            jnp.float32)
                        for c in range(1, pb.N_CH):
                            tot = tot + attrs_ref[sub, c, sl][None, :]
                        return acc + jnp.sum(px * tot, axis=1,
                                             keepdims=True)
                    if level == 0:
                        return acc + jnp.sum(
                            px + jnp.zeros((1, KB), jnp.float32), axis=1,
                            keepdims=True)
                    # level -1: no coords, no reduce — carry select + cond
                    # + writes only.
                    return acc + 1.0

                if level <= -2:
                    return live(None)     # level -2: no cond either
                return jax.lax.cond(all_done, lambda _: acc, live, None)

            if n_blocks == 1:
                acc = body(0, acc)
            else:
                acc = jax.lax.fori_loop(0, n_blocks, body, acc)

            is_last = meta_ref[pb.MT_LAST, vt]

            @pl.when(is_last == 0)
            def _():
                state_ref[...] = jnp.concatenate([acc] * 8, axis=1)

            @pl.when(is_last > 0)
            def _():
                out = jnp.concatenate(
                    [acc + bg_ref[0, 0]] * 8, axis=1)
                out_ref[sub] = out.T

    return kernel


KB = 128


def _make_stub_kernel_t(tiles_x: int, tb: int, level: int):
    """TRANSPOSED orientation probe: pixels on LANES ([1, P] carries — 2
    vregs instead of the [P, 1] columns' 32), work shape [KB, P], state
    scratch [8, P] row-native, output written without the final .T.
    level 0 = coords + 1 bcast-FMA + sublane reduce; -1 = carry+writes
    only; 2 = 10 channel loads ([KB,1]) + 10 FMA+sublane-reduces."""
    def kernel(meta_ref, attrs_ref, bg_ref, out_ref, state_ref):
        k_cap = attrs_ref.shape[2]
        n_blocks = k_cap // KB
        for sub in range(tb):
            vt = pl.program_id(0) * tb + sub
            t = meta_ref[pb.MT_T, vt]
            w = meta_ref[pb.MT_W, vt]
            count = meta_ref[pb.MT_CNT, vt]
            if level >= 0:
                ox = ((t % tiles_x) * 16).astype(jnp.float32)
                oy = ((t // tiles_x) * 16).astype(jnp.float32)
                idx = jax.lax.broadcasted_iota(jnp.int32, (1, pb.P), 1)
                px = ox + (idx % 16).astype(jnp.float32)     # [1, P]
                py = oy + (idx // 16).astype(jnp.float32)
            first = w == 0
            acc = jnp.where(first, jnp.zeros((1, pb.P), jnp.float32),
                            state_ref[0:1, :])

            def body(kb, acc):
                all_done = kb * KB >= count

                def live(_):
                    sl = pl.ds(kb * KB, KB)
                    if level == 2:
                        s = px * 0.0
                        for c in range(pb.N_CH):
                            ch = attrs_ref[sub, sl, c:c + 1].astype(
                                jnp.float32)                  # [KB, 1]
                            s = s + jnp.sum(ch * px, axis=0,
                                            keepdims=True)    # [1, P]
                        return acc + s
                    if level == 0:
                        work = (jnp.zeros((KB, 1), jnp.float32)
                                + px)                         # [KB, P]
                        return acc + jnp.sum(work, axis=0, keepdims=True)
                    return acc + 1.0

                return jax.lax.cond(all_done, lambda _: acc, live, None)

            if n_blocks == 1:
                acc = body(0, acc)
            else:
                acc = jax.lax.fori_loop(0, n_blocks, body, acc)

            is_last = meta_ref[pb.MT_LAST, vt]

            @pl.when(is_last == 0)
            def _():
                state_ref[...] = jnp.concatenate([acc] * 8, axis=0)

            @pl.when(is_last > 0)
            def _():
                out_ref[sub] = jnp.concatenate(
                    [acc + bg_ref[0, 0]] * 8, axis=0)         # [8, P]

    return kernel


def main():
    scene = make_street_scene(seed=0, n=1_000_000, n_cameras=1,
                              width=W, height=H)
    cam = scene.cameras[0]

    @jax.jit
    def prepare(means, scales, quats, opac, sh):
        proj = project_gaussians(means, scales, quats, opac, sh, cam, 3)
        bins = bin_gaussians(proj, H, W, 2, KCAP, dup_tails=TAILS,
                             dup_overscan=32, exact_extra=EXTRA,
                             with_seg_pos=True)
        attrs = pb.pack_gather_attrs(
            bins.gather, proj.mean2d, proj.conic, proj.color, proj.opacity,
            proj.inv_depth, order=bins.order, rank=bins.rank,
            seg_pos=bins.seg_pos, pair_major=True)
        return bins, attrs

    bins, attrs = prepare(scene.means3d, scene.scales, scene.quats,
                          scene.opacities, scene.sh_coeffs)
    from street_sparse_3dgs_tpu.ops.binning import num_tiles

    tiles_x, tiles_y = num_tiles(H, W)   # static ints (jit round-trip
    #                                      turns the NamedTuple's into arrays)
    t_total = tiles_x * tiles_y
    nv = bins.t_of_v.shape[0]
    tb = 8
    pad = -nv % tb
    t_safe = jnp.minimum(bins.t_of_v, t_total - 1)
    is_last = ((bins.t_of_v >= t_total)
               | (jnp.arange(nv, dtype=jnp.int32)
                  == bins.last_v[t_safe])).astype(jnp.int32)
    meta = jnp.stack([t_safe, bins.wt, bins.vcounts, is_last])
    if pad:
        meta = jnp.concatenate(
            [meta, jnp.zeros((4, pad), jnp.int32).at[pb.MT_LAST].set(1)],
            axis=1)
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((pad,) + attrs.shape[1:], attrs.dtype)])
    nvp = nv + pad
    bg = jnp.zeros((1, 3), jnp.float32)
    meta, attrs = jax.device_get((meta, attrs))
    meta, attrs = jnp.asarray(meta), jnp.asarray(attrs)
    # Channel-major copy for the historical row-orientation stubs.
    attrs_cm = jnp.swapaxes(attrs, 1, 2)

    def run_real(attrs):
        return pb._blend_exact(False, tiles_x, tb, None, None, 0, meta,
                               bins.last_v, attrs, bg)

    def run_stub(attrs, level=2):
        meta_spec = pl.BlockSpec((4, nvp), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        bg_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            _make_stub_kernel(tiles_x, tb, level), grid=(nvp // tb,),
            in_specs=[meta_spec,
                      pl.BlockSpec((tb, pb.N_CH, KCAP),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      bg_spec],
            out_specs=pl.BlockSpec((tb, pb.N_OUT, pb.P),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nvp, pb.N_OUT, pb.P),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((pb.P, 8), jnp.float32)],
        )(meta, attrs, bg)

    def bench(fn, name):
        @jax.jit
        def many(a):
            def body(acc, e):
                r = fn(a + e)
                return acc + jnp.sum(r[:, :1, :1]), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.asarray(np.linspace(1e-7, 2e-7, 8), jnp.float32))
            return acc
        jax.device_get(many(attrs))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(many(attrs))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / 8 * 1e3:.2f} ms")
        return best / 8 * 1e3

    real = bench(run_real, "exact fwd kernel (real)           ")
    stub2 = bench(lambda a: run_stub(jnp.swapaxes(a, 1, 2), 2),
                  "stub L2 (loads + 10 FMA+reduce)   ")
    stub1 = bench(lambda a: run_stub(jnp.swapaxes(a, 1, 2), 1),
                  "stub L1 (loads + 1 FMA+reduce)    ")
    stub0 = bench(lambda a: run_stub(jnp.swapaxes(a, 1, 2), 0),
                  "stub L0 (mechanics, no loads)     ")
    bench(lambda a: run_stub(jnp.swapaxes(a, 1, 2), -1),
          "stub L-1 (no coords/reduce)       ")
    bench(lambda a: run_stub(jnp.swapaxes(a, 1, 2), -2),
          "stub L-2 (no cond either)         ")
    print(f"mechanics floor {stub0:.2f} ms ({100 * stub0 / real:.0f}% of "
          f"real); loads add {stub1 - stub0:.2f}; per-[P,KB]-op cost "
          f"~{(stub2 - stub1) / 18:.3f} ms; math share {real - stub2:.2f}")

    def run_stub_t(attrs, level):
        meta_spec = pl.BlockSpec((4, nvp), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        bg_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            _make_stub_kernel_t(tiles_x, tb, level), grid=(nvp // tb,),
            in_specs=[meta_spec,
                      pl.BlockSpec((tb, KCAP, pb.N_CH),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      bg_spec],
            out_specs=pl.BlockSpec((tb, pb.N_OUT, pb.P),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nvp, pb.N_OUT, pb.P),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, pb.P), jnp.float32)],
        )(meta, attrs, bg)

    # NOTE: the row-orientation stubs (_make_stub_kernel*) consume the OLD
    # channel-major [tb, 10, K] layout; with pair-major attrs they still
    # run (shapes permuted in the spec) but their channel loads read
    # garbage — fine for a mechanics timing probe, not for values.
    bench(lambda a: run_stub_t(a, 2), "stub-T L2 (transposed, 10 ld+FMA) ")
    bench(lambda a: run_stub_t(a, 0), "stub-T L0 (transposed mechanics)  ")
    bench(lambda a: run_stub_t(a, -1), "stub-T L-1 (carry+writes only)    ")

    # Per-program vs per-window: sweep tile_batch on the L0 stub.
    for tb_try in (16, 32):
        if nvp % tb_try:
            continue
        def run_stub_tb(attrs, tb_=tb_try):
            meta_spec = pl.BlockSpec((4, nvp), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM)
            bg_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
            return pl.pallas_call(
                _make_stub_kernel(tiles_x, tb_, 0), grid=(nvp // tb_,),
                in_specs=[meta_spec,
                          pl.BlockSpec((tb_, pb.N_CH, KCAP),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          bg_spec],
                out_specs=pl.BlockSpec((tb_, pb.N_OUT, pb.P),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nvp, pb.N_OUT, pb.P),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM((pb.P, 8), jnp.float32)],
            )(meta, attrs, bg)
        bench(run_stub_tb, f"stub L0 tb={tb_try:2d}                    ")


if __name__ == "__main__":
    main()
