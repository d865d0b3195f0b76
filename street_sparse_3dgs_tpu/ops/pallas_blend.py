"""Fused Pallas TPU kernels for per-tile alpha blending (fwd + bwd).

This replaces the XLA-composed blend (``ops/blend.py``) on the hot path: one
kernel program per 16×16 tile streams the tile's depth-sorted Gaussians
through VMEM in 128-wide blocks, keeping the per-pixel transmittance state on
chip — no [tiles, 256, K] intermediates ever touch HBM, and blocks past every
pixel's termination point are skipped (the capacity padding the static-shape
binning needs becomes almost free).

Matches the reference rasterizer's blend semantics exactly (same rules as
``ops/oracle.py``): alpha = min(0.99, opac·exp(power)), skip when power > 0
or alpha < 1/255, stop at the first Gaussian pushing transmittance below
1e-4 (per-pixel contributor count, the CUDA ``n_contrib`` trick), remaining
transmittance times background, inverse-depth channel with the same weights.

The backward kernel re-traverses the blocks in reverse, reconstructing the
running transmittance from the forward pass's saved final log-T via
``T_before = T_after / (1-α)`` (the CUDA backward recurrence), and emits
per-(tile, slot) gradients; the scatter-add back to per-Gaussian rows is the
(automatic) VJP of the XLA gather that feeds the kernel.

TPU layout notes:
  - Gaussian attributes are packed channel-major as [T, 16, K] so each
    channel loads as a K-on-lanes vector (blocks satisfy the (8,128) tiling
    rule; broadcasting against the [256 pixels, 128 gaussians] work shape is
    free);
  - per-pixel state/outputs pack into [T, 8, 256];
  - tile origins derive from ``pl.program_id`` with the tile-grid width
    closed over statically (no tiny side inputs);
  - in-kernel cumulative sums ride the MXU as [128,128] triangular-ones
    matmuls rather than a lane scan.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE
from .oracle import ALPHA_MAX, ALPHA_MIN, T_EPS

P = TILE * TILE          # 256 pixels per tile
KB = 128                 # gaussian block width (lanes)
LOG_EPS = math.log(T_EPS)

# Attribute channel indices in the packed [T, 10, K] input.  Slot validity
# is NOT a channel: it is exactly ``slot index < per-tile count``, and the
# counts already sit in SMEM for the block-skip — so the payload carries
# only real attributes (no mask plane, no sublane zero-padding; Mosaic
# accepts a 10-sublane block because it equals the array dimension).
MX, MY, CA, CB, CC, CR, CG, CB_, OP, ID = range(10)
N_CH = 10
# Output/state rows in the packed [T, 8, P] output.
OR, OG, OB, OI, OA, OT, ON = range(7)
N_OUT = 8


def _tri(strict_greater: bool) -> jnp.ndarray:
    """[KB,KB] triangular-ones so that x @ M is an inclusive cumsum
    (strict_greater=False) or a suffix sum (True) along the lane axis."""
    row = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    return ((row > col) if strict_greater else (row <= col)).astype(
        jnp.float32)


def _dot_hl2(x, y):
    """``x @ y`` with BOTH operands hi/lo bf16-split (4 native MXU passes,
    all cross terms kept — error is f32-accumulation rounding only).  Used
    to move reductions off the VPU, which is the blend kernels' bottleneck
    (BASELINE.md roofline: ~45% of the 1.2 TFLOP/s ceiling)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return ((d(xh, yh) + d(xh, yl)) + (d(xl, yh) + d(xl, yl)))


def _tri_dot(x, tri):
    """``x @ tri`` at near-f32 accuracy in TWO native MXU passes.

    Mosaic in-kernel dots support only DEFAULT (single-pass bf16 — a ~1%
    transmittance error, fatal) or HIGHEST (six passes, ~1.4 ms/kernel at
    512²/32k).  The hi/lo bf16 split costs two passes with error
    ≤ 2^-18·Σ|x| (lo carries the f32 residual of the bf16 rounding; the
    triangular 0/1 matrix is exact in bf16), ~3e-5 absolute on the worst
    log-transmittance sums — two orders below anything the blend math can
    observe through exp()."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tb = tri.astype(jnp.bfloat16)
    return (jnp.dot(hi, tb, preferred_element_type=jnp.float32)
            + jnp.dot(lo, tb, preferred_element_type=jnp.float32))


def _pixel_coords(tiles_x: int, t_mod: int, tile0_ref, g):
    """Tile-absolute pixel coordinates as [P,1] columns for grid-slot ``g``
    (tiles_x closed over statically).  ``tile0_ref`` holds the shard's
    first global tile id — nonzero under tile-sharded rendering
    (``parallel/tiles.py``), where each device blends a contiguous slab of
    the framebuffer's tiles.  ``t_mod > 0`` wraps the tile id (multi-view
    batches concatenate each view's padded tile range along the grid axis —
    ``parallel/tp.py``)."""
    t = g + tile0_ref[0, 0]
    if t_mod:
        t = t % t_mod
    ox = ((t % tiles_x) * TILE).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = ox + (idx % TILE).astype(jnp.float32)
    py = oy + (idx // TILE).astype(jnp.float32)
    return px, py


def _alpha_block(attrs_ref, sl, px, py, nvalid, sub=0):
    """[P, KB] alpha (+aux terms) for one gaussian block vs the pixels.
    Attributes may be stored bf16 (``attr_dtype`` mode) — all math here is
    f32 regardless; only the at-rest payload precision changes.

    ``nvalid`` = per-tile count minus the block's base slot: lanes at or
    past it are capacity padding (garbage rows) and are masked out — the
    payload carries no mask plane.

    ``expp`` is exp(min(power, 0)): identical to exp(power) on every slot
    that can contribute (ok requires power ≤ 0), overflow-safe on the rest,
    and reused by the backward for ∂α/∂opacity (one transcendental per
    element instead of two)."""
    ch = lambda c: attrs_ref[sub, c, sl][None, :].astype(jnp.float32)
    dx = px - ch(MX)                                   # [P, KB]
    dy = py - ch(MY)
    a, b, c = ch(CA), ch(CB), ch(CC)
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    raw = ch(OP) * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & (lane < nvalid)
    return jnp.where(ok, alpha, 0.0), ok, raw, expp, dx, dy, a, b, c


def _make_fwd_kernel(tiles_x: int, t_mod: int, tb: int, per_tile_bg: bool):
    """``tb`` tiles per grid program: at street scale (8k+ tiles, sparse
    occupancy) per-program fixed overhead dominates the ~1-2 live blocks a
    tile actually blends, so batching amortizes it ~tb×."""
    def kernel(tile0_ref, counts_ref, attrs_ref, bg_ref, out_ref):
        k_cap = attrs_ref.shape[2]
        n_blocks = k_cap // KB
        tri = _tri(False)
        for sub in range(tb):
            _fwd_one_tile(tiles_x, t_mod, per_tile_bg, sub, n_blocks, tri,
                          tile0_ref, counts_ref, attrs_ref, bg_ref, out_ref)

    return kernel


def _fwd_one_tile(tiles_x, t_mod, per_tile_bg, sub, n_blocks, tri,
                  tile0_ref, counts_ref, attrs_ref, bg_ref, out_ref):
        g = pl.program_id(0) * (attrs_ref.shape[0]) + sub
        px, py = _pixel_coords(tiles_x, t_mod, tile0_ref, g)
        count = counts_ref[0, g]

        def body(kb, carry):
            tlog, ncontrib, rgb, ivd, acc, alive = carry
            # Skip blocks past the tile's binned count (all slots masked —
            # exact no-ops) and blocks past every pixel's termination.  The
            # occupancy distribution is bimodal (BASELINE.md: p50 303 /
            # p90 2002 pre-cap at the bench scene), so sparse tiles skip
            # most of the K-capacity padding; the backward kernel gets the
            # same effect from its ``ncontrib <= base`` gate.
            all_done = jnp.all(alive < 0.5) | (kb * KB >= count)

            def live(_):
                sl = pl.ds(kb * KB, KB)
                alpha, *_ = _alpha_block(attrs_ref, sl, px, py,
                                         count - kb * KB, sub)
                log_om = jnp.log1p(-alpha)             # [P, KB]
                cum = _tri_dot(log_om, tri)
                # ``cum`` is an inclusive prefix of non-positive terms, so
                # tlog+cum is non-increasing along the lane axis and ``fail``
                # is monotone within the block: once a slot fails, all later
                # slots fail.  "no fail at any position ≤ k" is therefore
                # just ~fail[k] — no cumulative-count matmul needed.
                fail = (tlog + cum) < LOG_EPS
                # Termination must PERSIST across gaussian blocks: ``alive``
                # carries it (the CUDA rasterizer's per-thread break, the
                # oracle's global cumsum(fail)==0).  Gating on
                # ``tlog >= LOG_EPS`` alone is wrong — tlog accumulates only
                # *included* slots, so after a mid-block termination it
                # still sits above the threshold and the pixel would resume
                # contributing in the next block: a tiny forward deviation,
                # but fatal to the backward, which reconstructs
                # transmittance assuming the included slots are exactly the
                # first ``ncontrib``.
                include = (~fail) & (alive > 0.5)
                t_excl = jnp.exp(tlog + cum - log_om)
                w = jnp.where(include, alpha * t_excl, 0.0)

                # Color accumulation as three exact VPU lane-reductions —
                # a [P,KB]×[KB,3] MXU dot pads the 3-channel output to a
                # full tile and (since DEFAULT bf16 is too coarse here)
                # would need 6 HIGHEST passes.
                ch_ = lambda c: attrs_ref[sub, c, sl][None, :].astype(
                    jnp.float32)
                rgb_n = rgb + jnp.concatenate(
                    [jnp.sum(w * ch_(c), axis=1, keepdims=True)
                     for c in (CR, CG, CB_)], axis=1)      # [P, 3]
                ivd_n = ivd + jnp.sum(
                    w * attrs_ref[sub, ID, sl][None, :].astype(jnp.float32),
                    axis=1, keepdims=True)
                # A fail anywhere in the block kills the pixel for all
                # later blocks (fail is suffix-monotone within a block).
                alive_n = jnp.where(fail[:, -1:], 0.0, alive)
                return (tlog + jnp.sum(jnp.where(include, log_om, 0.0),
                                       axis=1, keepdims=True),
                        ncontrib + jnp.sum(include.astype(jnp.float32),
                                           axis=1, keepdims=True),
                        rgb_n, ivd_n,
                        acc + jnp.sum(w, axis=1, keepdims=True), alive_n)

            return jax.lax.cond(all_done, lambda _: carry, live, None)

        z = jnp.zeros((P, 1), jnp.float32)
        z3 = jnp.zeros((P, 3), jnp.float32)
        tlog, nc, rgb, ivd, acc, _ = jax.lax.fori_loop(
            0, n_blocks, body, (z, z, z3, z, z, jnp.ones((P, 1), jnp.float32)))

        bgr = sub if per_tile_bg else 0
        t_final = jnp.exp(tlog)
        rgb = rgb + jnp.concatenate(
            [t_final * bg_ref[bgr, 0], t_final * bg_ref[bgr, 1],
             t_final * bg_ref[bgr, 2]], axis=1)
        pad = jnp.zeros((P, 1), jnp.float32)
        out = jnp.concatenate([rgb, ivd, acc, tlog, nc, pad],
                              axis=1)                  # [P, 8]
        out_ref[sub] = out.T


def _make_bwd_kernel(tiles_x: int, t_mod: int, tb: int, per_tile_bg: bool):
    def kernel(tile0_ref, counts_ref, attrs_ref, bg_ref, saved_ref, g_ref,
               d_ref):
        k_cap = attrs_ref.shape[2]
        n_blocks = k_cap // KB
        tri_suf = _tri(True)
        for sub in range(tb):
            _bwd_one_tile(tiles_x, t_mod, per_tile_bg, sub, n_blocks,
                          tri_suf, tile0_ref, counts_ref, attrs_ref, bg_ref,
                          saved_ref, g_ref, d_ref)

    return kernel


def _bwd_one_tile(tiles_x, t_mod, per_tile_bg, sub, n_blocks, tri_suf,
                  tile0_ref, counts_ref, attrs_ref, bg_ref, saved_ref,
                  g_ref, d_ref):
        g = pl.program_id(0) * (attrs_ref.shape[0]) + sub
        px, py = _pixel_coords(tiles_x, t_mod, tile0_ref, g)
        count = counts_ref[0, g]
        bgr = sub if per_tile_bg else 0

        row = lambda ref, i: ref[sub, i, :][:, None]   # [P, 1]
        g_r, g_g, g_b = row(g_ref, OR), row(g_ref, OG), row(g_ref, OB)
        g_ivd, g_acc = row(g_ref, OI), row(g_ref, OA)
        tlog_final = row(saved_ref, OT)
        ncontrib = row(saved_ref, ON)
        # Background: C += T_final·bg ⇒ dL/dα_k −= (g·bg)·T_final/(1-α_k).
        g_tfinal = ((g_r * bg_ref[bgr, 0] + g_g * bg_ref[bgr, 1]
                     + g_b * bg_ref[bgr, 2]) * jnp.exp(tlog_final))

        def body(i, carry):
            kb = n_blocks - 1 - i
            tlog_after, suffix = carry
            base = kb * KB
            block_dead = jnp.all(ncontrib <= base)

            def live(_):
                sl = pl.ds(base, KB)
                alpha, ok, raw, expp, dx, dy, a, b, c = _alpha_block(
                    attrs_ref, sl, px, py, count - base, sub)
                kidx = (base + jax.lax.broadcasted_iota(
                    jnp.int32, (P, KB), 1)).astype(jnp.float32)
                include = kidx < ncontrib
                alpha_i = jnp.where(include, alpha, 0.0)
                log_om = jnp.log1p(-alpha_i)
                suf_in = _tri_dot(log_om, tri_suf)
                t_excl = jnp.exp(tlog_after - (suf_in + log_om))
                w = alpha_i * t_excl

                ch = lambda cidx: attrs_ref[sub, cidx, sl][None, :].astype(
                    jnp.float32)
                # 3-term contraction as broadcast FMAs: a K=3 MXU dot pads
                # the contraction to a full systolic pass (6 at HIGHEST);
                # the VPU does it exactly for ~3 fused multiply-adds.
                pg = (g_r * ch(CR) + g_g * ch(CG) + g_b * ch(CB_)
                      + g_ivd * ch(ID) + g_acc)        # [P, KB]
                wpg = w * pg
                suf_after = _tri_dot(wpg, tri_suf) + suffix
                one_m = jnp.maximum(1.0 - alpha_i, 1e-4)
                g_alpha = jnp.where(
                    include & ok,
                    t_excl * pg - (suf_after + g_tfinal) / one_m, 0.0)
                g_alpha = jnp.where(raw < ALPHA_MAX, g_alpha, 0.0)
                g_power = alpha_i * g_alpha

                def col(x):
                    return jnp.sum(x, axis=0)[None, :]  # [1, KB]

                d_mx = col(g_power * (a * dx + b * dy))
                d_my = col(g_power * (c * dy + b * dx))
                d_ca = col(g_power * (-0.5 * dx * dx))
                d_cb = col(g_power * (-dx * dy))
                d_cc = col(g_power * (-0.5 * dy * dy))
                # [3, KB] via exact VPU sublane reductions (see fwd color
                # note: a 3-row MXU dot wastes a padded HIGHEST pass).
                d_rgb = jnp.concatenate(
                    [jnp.sum(gc * w, axis=0)[None, :]
                     for gc in (g_r, g_g, g_b)], axis=0)  # [3, KB]
                # ∂α/∂opac = exp(power) on the unclamped branch (power ≤ 0
                # wherever g_alpha ≠ 0, so the fwd's expp is exact here).
                d_op = col(expp * g_alpha)
                d_id = col(w * g_ivd)
                block = jnp.concatenate(
                    [d_mx, d_my, d_ca, d_cb, d_cc, d_rgb, d_op, d_id],
                    axis=0)                            # [10, KB]
                d_ref[sub, :, sl] = block.astype(d_ref.dtype)

                return (tlog_after - jnp.sum(log_om, axis=1, keepdims=True),
                        suffix + jnp.sum(wpg, axis=1, keepdims=True))

            def dead(_):
                sl = pl.ds(base, KB)
                d_ref[sub, :, sl] = jnp.zeros((N_CH, KB), d_ref.dtype)
                return carry

            return jax.lax.cond(block_dead, dead, live, None)

        jax.lax.fori_loop(0, n_blocks, body,
                          (tlog_final, jnp.zeros((P, 1), jnp.float32)))


# ---------- exact (virtual-tile) kernels ----------
#
# Tiles whose binned count exceeds K wrap onto ceil(count/K) CONSECUTIVE
# K-wide "virtual tiles" (`ops/binning.py` exact mode), removing the
# per-tile capacity truncation that is visibly lossy at street scale
# (BASELINE.md round-4 K-ladder).  The kernels process virtual tiles in
# order, carrying per-pixel blend state across a tile's windows in VMEM
# scratch — Pallas TPU scratch persists across grid steps (the matmul
# accumulator pattern), and the grid is sequential, so window w reads the
# state window w-1 wrote.  The backward runs the grid REVERSED (static
# index maps) and carries (transmittance-after, gradient suffix) the other
# way.  Matches the reference rasterizer's uncapped per-tile ranges
# (submodule hierarchy-rasterizer; `ops/oracle.py` is the semantics oracle).

# Rows of the [4, T_v] SMEM meta array.
MT_T, MT_W, MT_CNT, MT_LAST = range(4)
# Scratch state ROWS ([8, 256]) carried across a tile's windows (fwd).
#
# TRANSPOSED orientation (round-5): the exact kernels put PIXELS ON LANES —
# work shape [KB, P], per-pixel carries [1, P], state scratch [8, P] with
# native row access, attrs PAIR-major [T_v, K, 10] so channel loads are
# [KB, 1] sublane slices.  Rationale (measured, tools/kernel_floor_tpu.py):
# in the row orientation every [P, 1] per-pixel column op occupies 32
# nearly-empty (8,128) vregs, so the per-WINDOW mechanics (carry selects,
# coords, state/out writes) cost 16.0 ms of the 32.6 ms street fwd kernel
# — the same mechanics transposed cost 4.8 ms.  The [KB, P] block math has
# the same vreg count as [P, KB]; the triangular cumsums become LEFT
# matmuls (tri @ x) on the MXU; lane reductions become sublane reductions;
# the outputs assemble as [8, P] rows with NO final transpose; the
# backward's saved/g rows read natively ([1, P]).
ST_TLOG, ST_NC, ST_R, ST_G, ST_B, ST_IVD, ST_ACC, ST_ALIVE = range(8)


def _tri_left(inclusive: bool) -> jnp.ndarray:
    """[KB,KB] M for LEFT multiplication: (M @ x)[k] = Σ_j M[k,j]·x[j] —
    inclusive prefix (j ≤ k) or strict suffix (j > k) along sublanes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    return ((col <= row) if inclusive else (col > row)).astype(jnp.float32)


def _tri_dot_left(tri, x):
    """``tri @ x`` at near-f32 accuracy in two MXU passes (hi/lo bf16
    split of x; the 0/1 matrix is exact in bf16) — the left-mult twin of
    ``_tri_dot``."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tb_ = tri.astype(jnp.bfloat16)
    return (jnp.dot(tb_, hi, preferred_element_type=jnp.float32)
            + jnp.dot(tb_, lo, preferred_element_type=jnp.float32))


def _dot_hl2_c0(a, b):
    """``aᵀ @ b`` contracting axis 0 of both, hi/lo bf16-split on both
    operands (4 MXU passes, all cross terms — f32-accumulation rounding
    only)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    d = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32)
    return (d(ah, bh) + d(ah, bl)) + (d(al, bh) + d(al, bl))


def _alpha_block_t(attrs_ref, sl, px, py, nvalid, sub=0):
    """Transposed twin of ``_alpha_block``: attrs PAIR-major [tb, K, 10],
    channel loads are [KB, 1] sublane slices, pixels ride lanes — returns
    [KB, P] alpha (+aux terms)."""
    ch = lambda c: attrs_ref[sub, sl, c:c + 1].astype(jnp.float32)  # [KB,1]
    dx = px - ch(MX)                                   # [KB, P]
    dy = py - ch(MY)
    a, b, c = ch(CA), ch(CB), ch(CC)
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    raw = ch(OP) * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    slot = jax.lax.broadcasted_iota(jnp.int32, (KB, 1), 0)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & (slot < nvalid)
    return jnp.where(ok, alpha, 0.0), ok, raw, expp, dx, dy, a, b, c


def _coords_of_tile(tiles_x: int, t):
    """[P,1] pixel coordinates of (possibly traced) tile id ``t``."""
    ox = ((t % tiles_x) * TILE).astype(jnp.float32)
    oy = ((t // tiles_x) * TILE).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = ox + (idx % TILE).astype(jnp.float32)
    py = oy + (idx // TILE).astype(jnp.float32)
    return px, py


def _make_fwd_kernel_exact(tiles_x: int, tb: int, t_mod: int = 0):
    def kernel(meta_ref, attrs_ref, bg_ref, out_ref, state_ref):
        k_cap = attrs_ref.shape[1]                       # pair-major [tb,K,C]
        n_blocks = k_cap // KB
        tri = _tri_left(True)
        for sub in range(tb):
            vt = pl.program_id(0) * tb + sub
            t = meta_ref[MT_T, vt]
            w = meta_ref[MT_W, vt]
            count = meta_ref[MT_CNT, vt]
            # Multi-view batches (parallel/tp.py): tile ids are GLOBAL
            # (view · t_mod + local) so the backward can broadcast each
            # view's finals; pixel coords wrap to the local id.
            tl = t % t_mod if t_mod else t
            ox = ((tl % tiles_x) * TILE).astype(jnp.float32)
            oy = ((tl // tiles_x) * TILE).astype(jnp.float32)
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            px = ox + (idx % TILE).astype(jnp.float32)   # [1, P]
            py = oy + (idx // TILE).astype(jnp.float32)
            first = w == 0
            ld = lambda r: state_ref[r:r + 1, :]             # [1, P]
            sel = lambda r, init: jnp.where(first, init, ld(r))
            z = jnp.zeros((1, P), jnp.float32)
            tlog = sel(ST_TLOG, z)
            nc = sel(ST_NC, z)
            rgb = jnp.where(first, jnp.zeros((3, P), jnp.float32),
                            state_ref[ST_R:ST_B + 1, :])
            ivd = sel(ST_IVD, z)
            acc = sel(ST_ACC, z)
            alive = sel(ST_ALIVE, jnp.ones((1, P), jnp.float32))

            def body(kb, carry):
                tlog, nc, rgb, ivd, acc, alive = carry
                all_done = jnp.all(alive < 0.5) | (kb * KB >= count)

                def live(_):
                    sl = pl.ds(kb * KB, KB)
                    alpha, *_ = _alpha_block_t(attrs_ref, sl, px, py,
                                               count - kb * KB, sub)
                    log_om = jnp.log1p(-alpha)           # [KB, P]
                    cum = _tri_dot_left(tri, log_om)
                    fail = (tlog + cum) < LOG_EPS
                    include = (~fail) & (alive > 0.5)
                    t_excl = jnp.exp(tlog + cum - log_om)
                    wgt = jnp.where(include, alpha * t_excl, 0.0)
                    # Color/invdepth/alpha accumulation as ONE [KB,5]ᵀ@[KB,P]
                    # MXU contraction (4-pass hi/lo, exact): frees the VPU
                    # of 5 sublane reductions.  tlog/nc sums stay on the
                    # VPU (they gate termination).
                    cmat = jnp.concatenate(
                        [attrs_ref[sub, sl, CR:CB_ + 1].astype(jnp.float32),
                         attrs_ref[sub, sl, ID:ID + 1].astype(jnp.float32),
                         jnp.ones((KB, 1), jnp.float32)], axis=1)  # [KB, 5]
                    out5 = _dot_hl2_c0(cmat, wgt)        # [5, P]
                    alive_n = jnp.where(fail[-1:, :], 0.0, alive)
                    return (tlog + jnp.sum(jnp.where(include, log_om, 0.0),
                                           axis=0, keepdims=True),
                            nc + jnp.sum(include.astype(jnp.float32),
                                         axis=0, keepdims=True),
                            rgb + out5[0:3, :], ivd + out5[3:4, :],
                            acc + out5[4:5, :],
                            alive_n)

                return jax.lax.cond(all_done, lambda _: carry, live, None)

            carry0 = (tlog, nc, rgb, ivd, acc, alive)
            if n_blocks == 1:
                # K=128: one block per window — skip the loop machinery
                # (runs once per window; 24k+ windows at street scale).
                tlog, nc, rgb, ivd, acc, alive = body(0, carry0)
            else:
                tlog, nc, rgb, ivd, acc, alive = jax.lax.fori_loop(
                    0, n_blocks, body, carry0)

            is_last = meta_ref[MT_LAST, vt]

            # Non-last windows: only the carried state matters — skip the
            # composite+output write (2/3 of windows at street scale).
            # Last windows: the state write is dead (the next window
            # resets) — skip it.  Unwritten output blocks flush garbage
            # rows that the last_v selection never reads.
            @pl.when(is_last == 0)
            def _():
                state_ref[...] = jnp.concatenate(
                    [tlog, nc, rgb, ivd, acc, alive], axis=0)    # [8, P]

            @pl.when(is_last > 0)
            def _():
                t_final = jnp.exp(tlog)
                rgb_out = rgb + jnp.concatenate(
                    [t_final * bg_ref[0, 0], t_final * bg_ref[0, 1],
                     t_final * bg_ref[0, 2]], axis=0)
                pad = jnp.zeros((1, P), jnp.float32)
                out_ref[sub] = jnp.concatenate(
                    [rgb_out, ivd, acc, tlog, nc, pad], axis=0)  # [8, P]

    return kernel


# Scratch rows of the backward [2, P] state: the (transmittance-after,
# gradient-suffix) carry.  In the transposed orientation the per-REAL-tile
# finals (saved/g channel-major rows) read natively as [1, P] lane vectors
# every window — no caching transposes needed.
BS_TLOG, BS_SUF = range(2)


def _make_bwd_kernel_exact(tiles_x: int, tb: int, nprog: int,
                           t_mod: int = 0):
    def kernel(meta_ref, attrs_ref, bg_ref, saved_ref, g_ref, d_ref,
               state_ref):
        k_cap = attrs_ref.shape[1]                   # pair-major [tb, K, C]
        n_blocks = k_cap // KB
        tri_suf = _tri_left(False)
        # Virtual tiles processed in DESCENDING order: programs ride
        # reversed index maps, subs iterate high-to-low within the block.
        for sub in range(tb - 1, -1, -1):
            vt = (nprog - 1 - pl.program_id(0)) * tb + sub
            t = meta_ref[MT_T, vt]
            w = meta_ref[MT_W, vt]
            count = meta_ref[MT_CNT, vt]
            is_last = meta_ref[MT_LAST, vt]
            tl = t % t_mod if t_mod else t
            ox = ((tl % tiles_x) * TILE).astype(jnp.float32)
            oy = ((tl // tiles_x) * TILE).astype(jnp.float32)
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            px = ox + (idx % TILE).astype(jnp.float32)       # [1, P]
            py = oy + (idx // TILE).astype(jnp.float32)
            base_global = (w * k_cap).astype(jnp.float32)
            last = is_last > 0

            row = lambda ref, i: ref[sub, i:i + 1, :]        # [1, P] native
            g_r, g_g, g_b = row(g_ref, OR), row(g_ref, OG), row(g_ref, OB)
            g_ivd, g_acc = row(g_ref, OI), row(g_ref, OA)
            ncontrib = row(saved_ref, ON)
            tlf = row(saved_ref, OT)
            g_tfinal = (g_r * bg_ref[0, 0] + g_g * bg_ref[0, 1]
                        + g_b * bg_ref[0, 2]) * jnp.exp(tlf)

            # At the tile's LAST window (first visit in reverse order) the
            # carry initializes from the saved final log-transmittance.
            tlog_after0 = jnp.where(last, tlf, state_ref[BS_TLOG:BS_TLOG + 1])
            suffix0 = jnp.where(last, jnp.zeros((1, P), jnp.float32),
                                state_ref[BS_SUF:BS_SUF + 1])

            def body(i, carry):
                kb = n_blocks - 1 - i
                tlog_after, suffix = carry
                base = kb * KB
                block_dead = jnp.all(ncontrib <= base_global + base)

                def live(_):
                    sl = pl.ds(base, KB)
                    alpha, ok, raw, expp, dx, dy, a, b, c = _alpha_block_t(
                        attrs_ref, sl, px, py, count - base, sub)
                    kidx = (base_global + base
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (KB, 1), 0).astype(jnp.float32))
                    include = kidx < ncontrib                # [KB, P]
                    alpha_i = jnp.where(include, alpha, 0.0)
                    log_om = jnp.log1p(-alpha_i)
                    suf_in = _tri_dot_left(tri_suf, log_om)
                    t_excl = jnp.exp(tlog_after - (suf_in + log_om))
                    wgt = alpha_i * t_excl

                    ch = lambda cidx: attrs_ref[sub, sl,
                                                cidx:cidx + 1].astype(
                        jnp.float32)                         # [KB, 1]
                    pg = (g_r * ch(CR) + g_g * ch(CG) + g_b * ch(CB_)
                          + g_ivd * ch(ID) + g_acc)          # [KB, P]
                    wpg = wgt * pg
                    suf_after = _tri_dot_left(tri_suf, wpg) + suffix
                    one_m = jnp.maximum(1.0 - alpha_i, 1e-4)
                    g_alpha = jnp.where(
                        include & ok,
                        t_excl * pg - (suf_after + g_tfinal) / one_m, 0.0)
                    g_alpha = jnp.where(raw < ALPHA_MAX, g_alpha, 0.0)
                    g_power = alpha_i * g_alpha

                    # Per-slot grads: pixel-axis reductions are LANE
                    # reductions here, emitting [KB, 1] sublane columns
                    # that assemble into the pair-major [KB, 10] output
                    # block natively (no transposes).
                    def col(x):
                        return jnp.sum(x, axis=1, keepdims=True)  # [KB, 1]

                    d_mx = col(g_power * (a * dx + b * dy))
                    d_my = col(g_power * (c * dy + b * dx))
                    d_ca = col(g_power * (-0.5 * dx * dx))
                    d_cb = col(g_power * (-dx * dy))
                    d_cc = col(g_power * (-0.5 * dy * dy))
                    d_rgb = jnp.concatenate(
                        [col(gc * wgt) for gc in (g_r, g_g, g_b)], axis=1)
                    d_op = col(expp * g_alpha)
                    d_id = col(wgt * g_ivd)
                    block = jnp.concatenate(
                        [d_mx, d_my, d_ca, d_cb, d_cc, d_rgb, d_op, d_id],
                        axis=1)                              # [KB, 10]
                    d_ref[sub, sl, :] = block.astype(d_ref.dtype)

                    return (tlog_after - jnp.sum(log_om, axis=0,
                                                 keepdims=True),
                            suffix + jnp.sum(wpg, axis=0, keepdims=True))

                def dead(_):
                    sl = pl.ds(base, KB)
                    d_ref[sub, sl, :] = jnp.zeros((KB, N_CH), d_ref.dtype)
                    return carry

                return jax.lax.cond(block_dead, dead, live, None)

            if n_blocks == 1:
                tlog_after, suffix = body(0, (tlog_after0, suffix0))
            else:
                tlog_after, suffix = jax.lax.fori_loop(
                    0, n_blocks, body, (tlog_after0, suffix0))
            state_ref[...] = jnp.concatenate(
                [tlog_after, suffix], axis=0)                # [2, P]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _blend_exact(interpret, tiles_x, tb, mesh, axis, t_mod, meta, last_v,
                 attrs, bg):
    """Exact (virtual-tile) blend: ``attrs`` PAIR-major [T_v, K, 10] over
    virtual tiles described by ``meta`` [4, T_v] (rows: real tile, window
    index, window pair count, is-last-window); returns the per-REAL-tile
    packed output selected at ``last_v``.  Kernels run in the TRANSPOSED
    orientation (see the ST_* note above).

    With ``mesh``/``axis`` the kernels run under ``shard_map`` with the
    virtual-tile axis sharded (``axis`` may be a tuple of mesh axes —
    multi-view training, ``parallel/tp.py``): binning's shard-segmented
    allocation (``exact_shards``) guarantees shard boundaries never split
    a tile's windows, so each device's scratch carry stays local.

    ``t_mod > 0`` (multi-view concatenation): meta tile ids are GLOBAL
    (``view · t_mod + local``) — the kernels wrap them for pixel coords,
    while the backward broadcast and ``last_v`` stay in global id space."""
    out, _ = _blend_exact_fwd(interpret, tiles_x, tb, mesh, axis, t_mod,
                              meta, last_v, attrs, bg)
    return out


def _axis_size(mesh, axis) -> int:
    if mesh is None:
        return 1
    if isinstance(axis, (tuple, list)):
        s = 1
        for a in axis:
            s *= mesh.shape[a]
        return s
    return mesh.shape[axis]


def _shard_exact(mesh, axis, fn, meta, attrs, *rest):
    """Run ``fn(meta, attrs, *rest)`` sharded over the virtual-tile axis
    (meta on its second axis; rest shards like attrs except the FIRST
    rest operand — bg, first at every call site — which is replicated)."""
    if mesh is None:
        return fn(meta, attrs, *rest)
    from jax import shard_map
    from jax.sharding import PartitionSpec as PSpec

    ax = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    n_rest = len(rest)
    in_specs = (PSpec(None, ax), PSpec(ax)) + \
        (PSpec(),) + (PSpec(ax),) * (n_rest - 1)
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=PSpec(ax), check_vma=False)(
        meta, attrs, *rest)


def _blend_exact_fwd(interpret, tiles_x, tb, mesh, axis, t_mod, meta,
                     last_v, attrs, bg):
    nv, k_cap, _ = attrs.shape
    n_local = nv // _axis_size(mesh, axis)
    if n_local % tb:
        raise ValueError(f"local virtual tile count {n_local} not "
                         f"divisible by {tb}")

    def run(meta_l, attrs_l, bg_l):
        nvl, _, _ = attrs_l.shape
        meta_spec = pl.BlockSpec((4, nvl), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        bg_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            _make_fwd_kernel_exact(tiles_x, tb, t_mod), grid=(nvl // tb,),
            in_specs=[meta_spec,
                      pl.BlockSpec((tb, k_cap, N_CH), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      bg_spec],
            out_specs=pl.BlockSpec((tb, N_OUT, P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nvl, N_OUT, P), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
            interpret=interpret,
        )(meta_l, attrs_l, bg_l)

    out_v = _shard_exact(mesh, axis, run, meta, attrs, bg)
    out = out_v[last_v]                                   # [T, 8, P]
    return out, (meta, last_v, attrs, bg, out)


def _blend_exact_bwd(interpret, tiles_x, tb, mesh, axis, t_mod, res, g_out):
    meta, last_v, attrs, bg, out_sel = res
    nv, k_cap, _ = attrs.shape
    t_total = out_sel.shape[0]
    # Every window of a real tile needs that tile's FINAL state and output
    # cotangent: broadcast the per-real-tile rows onto virtual tiles.
    # Channel-major [T_v, 8, P] — these row broadcasts fuse into the
    # kernel's input pipeline; the kernel transposes the needed columns
    # into scratch once per real tile.
    t_safe = jnp.minimum(meta[MT_T], t_total - 1)
    saved_eff = out_sel[t_safe]                           # [T_v, 8, P]
    g_eff = g_out[t_safe]

    def run(meta_l, attrs_l, bg_l, saved_l, g_l):
        nvl, _, _ = attrs_l.shape
        nprog = nvl // tb
        meta_spec = pl.BlockSpec((4, nvl), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        bg_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
        rev_attrs = pl.BlockSpec((tb, k_cap, N_CH),
                                 lambda i: (nprog - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
        rev_out = pl.BlockSpec((tb, N_OUT, P),
                               lambda i: (nprog - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _make_bwd_kernel_exact(tiles_x, tb, nprog, t_mod), grid=(nprog,),
            in_specs=[meta_spec, rev_attrs, bg_spec, rev_out, rev_out],
            out_specs=rev_attrs,
            out_shape=jax.ShapeDtypeStruct((nvl, k_cap, N_CH), attrs.dtype),
            scratch_shapes=[pltpu.VMEM((2, P), jnp.float32)],
            interpret=interpret,
        )(meta_l, attrs_l, bg_l, saved_l, g_l)

    d_attrs = _shard_exact(mesh, axis, run, meta, attrs, bg, saved_eff,
                           g_eff)
    t_final = jnp.exp(out_sel[:, OT, :])                  # [T, P]
    g_bg = jnp.sum(jnp.stack(
        [jnp.sum(t_final * g_out[:, i, :], axis=1) for i in (OR, OG, OB)],
        axis=1), axis=0, keepdims=True)                   # [1, 3]
    return None, None, d_attrs, g_bg


_blend_exact.defvjp(_blend_exact_fwd, _blend_exact_bwd)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _specs(k_cap, per_tile_bg: bool, t: int = 1, tb: int = 1):
    tile0_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    # Whole [1, T] array resident in SMEM (per-tile (1, 1) blocks would
    # violate the lowering's (8, 128) divisibility rule, and a [T, 1] shape
    # pads every ROW to 512 B — 4 MB of SMEM at 8160 tiles, over the 1 MB
    # budget; one row of T lanes pads once).
    counts_spec = pl.BlockSpec((1, t), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    attrs_spec = pl.BlockSpec((tb, N_CH, k_cap), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    # bg is either a single [1, 3] color (kernel sees the same block at
    # every grid step) or per-tile [T, 3] rows (multi-view batches where
    # each view draws its own random background).
    bg_spec = pl.BlockSpec(
        (tb, 3), (lambda i: (i, 0)) if per_tile_bg else (lambda i: (0, 0)),
        memory_space=pltpu.SMEM) if per_tile_bg else pl.BlockSpec(
        (1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((tb, N_OUT, P), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return tile0_spec, counts_spec, attrs_spec, bg_spec, out_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _blend_packed(interpret, tiles_x, t_mod, tb, tile0, counts, attrs, bg):
    """``counts`` is the per-tile binned pair count [1, T] int32 (pre-clip;
    padded tiles carry 0) — a forward-only block-skip hint, never touched by
    gradients.  ``tb`` = tiles per kernel program (T must divide by it;
    callers pad with zero-count tiles)."""
    out, _ = _blend_packed_fwd(interpret, tiles_x, t_mod, tb, tile0, counts,
                               attrs, bg)
    return out


def _blend_packed_fwd(interpret, tiles_x, t_mod, tb, tile0, counts, attrs,
                      bg):
    t, _, k_cap = attrs.shape
    if t % tb:
        raise ValueError(f"tile count {t} not divisible by tile batch {tb}")
    per_tile_bg = bg.shape[0] != 1
    tile0_spec, counts_spec, attrs_spec, bg_spec, out_spec = _specs(
        k_cap, per_tile_bg, t, tb)
    out = pl.pallas_call(
        _make_fwd_kernel(tiles_x, t_mod, tb, per_tile_bg), grid=(t // tb,),
        in_specs=[tile0_spec, counts_spec, attrs_spec, bg_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((t, N_OUT, P), jnp.float32),
        interpret=interpret,
    )(tile0, counts, attrs, bg)
    return out, (tile0, counts, attrs, bg, out)


def _blend_packed_bwd(interpret, tiles_x, t_mod, tb, res, g_out):
    tile0, counts, attrs, bg, saved = res
    t, _, k_cap = attrs.shape
    per_tile_bg = bg.shape[0] != 1
    tile0_spec, counts_spec, attrs_spec, bg_spec, out_spec = _specs(
        k_cap, per_tile_bg, t, tb)
    d_attrs = pl.pallas_call(
        _make_bwd_kernel(tiles_x, t_mod, tb, per_tile_bg), grid=(t // tb,),
        in_specs=[tile0_spec, counts_spec, attrs_spec, bg_spec, out_spec,
                  out_spec],
        out_specs=attrs_spec,
        # Grads at the attrs' own precision: in bf16 mode they ride the
        # sort-based gather VJP at half the payload width.
        out_shape=jax.ShapeDtypeStruct((t, N_CH, k_cap), attrs.dtype),
        interpret=interpret,
    )(tile0, counts, attrs, bg, saved, g_out)
    # Background gradient (outside the kernel; tiny reduction).
    t_final = jnp.exp(saved[:, OT, :])                 # [T, P]
    per_tile = jnp.stack([jnp.sum(t_final * g_out[:, i, :], axis=1)
                          for i in (OR, OG, OB)], axis=1)   # [T, 3]
    g_bg = per_tile if bg.shape[0] != 1 else jnp.sum(
        per_tile, axis=0, keepdims=True)
    return None, None, d_attrs, g_bg  # tile0/counts nondiff


_blend_packed.defvjp(_blend_packed_fwd, _blend_packed_bwd)


def _blocked_cumsum_cm(rows: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum of ``rows`` [C, M] along M, as two levels of
    triangular-ones matmuls (MXU-friendly; a lane scan would crawl)."""
    c, m = rows.shape
    pad = (-m) % block
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((c, pad), rows.dtype)], axis=1)
    nb = (m + pad) // block
    r = rows.reshape(c, nb, block)
    # triT[j, i] = (j <= i): within[c, b, i] = sum_{j<=i} r[c, b, j].
    tri_t = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
             <= jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
             ).astype(rows.dtype)
    within = jax.lax.dot_general(r, tri_t, (((2,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGH)
    totals = within[:, :, -1]                                 # [C, nb]
    # tribT[b, a] = (b < a): exclusive prefix of block totals.
    trib_t = (jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
              < jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
              ).astype(rows.dtype)
    offsets = jax.lax.dot_general(totals, trib_t,
                                  (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGH)
    return (within + offsets[:, :, None]).reshape(c, m + pad)[:, :m]


def _blocked_cumsum_rows(rows: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum of ``rows`` [M, C] along M (row-major twin of
    ``_blocked_cumsum_cm`` — tri matmuls contract on the row side; the MXU
    pads C to a lane tile, which it absorbs easily)."""
    m, c = rows.shape
    pad = (-m) % block
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, c), rows.dtype)], axis=0)
    nb = (m + pad) // block
    r = rows.reshape(nb, block, c)
    # tri[i, j] = (j <= i): within[b, i, c] = sum_{j<=i} r[b, j, c].
    tri = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
           <= jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
           ).astype(rows.dtype)
    within = jax.lax.dot_general(r, tri, (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGH)
    within = jnp.swapaxes(within, 1, 2)                       # [nb, blk, C]
    totals = within[:, -1, :]                                 # [nb, C]
    trib = (jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
            ).astype(rows.dtype)
    offsets = jax.lax.dot_general(trib, totals, (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGH)
    return (within + offsets[:, None, :]).reshape(m + pad, c)[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_pack(grad_sort: str, pair_major: bool, attrs_n: jnp.ndarray,
                 gather: jnp.ndarray,
                 seg_pos: jnp.ndarray) -> jnp.ndarray:
    """``swapaxes(attrs_n[gather], 1, 2)`` ([N, C] -> [T, C, K]) with a
    sort-based segment-reduction VJP.  ``pair_major=True`` (the transposed
    exact kernels) skips the swap — output AND cotangent ride [T, K, C].

    XLA's native VJP is a 393k-row random scatter-add -- row-latency bound
    (~6-7 ms at 512x512/32k on v5e regardless of row width), and its
    follow-up ``searchsorted`` lowers to a while loop of serial HBM gathers
    (~4 ms).  The backward here merges the pair cotangents and the dense
    row ids into ONE multi-operand unstable sort (queries carry zero
    channels and sort immediately before their row's pairs), takes a
    blocked triangular-matmul prefix sum over the channels, and reads each
    row's segment sum as the difference of the prefix at consecutive query
    positions.

    ``grad_sort`` picks the cotangent payload width through that sort:
    ``"f32"`` (exact, default) or ``"bf16"`` — channel PAIRS packed two-
    per-uint32 operand, shrinking the multi-operand sort from 11 to 6
    operands (measured 35.3 → 19.1 ms at the street-scale 4.13M rows on
    v5e; sort cost is ~linear in operand count).  Per-pair bf16
    quantization (rel ~2⁻⁹) sits far below the SGD gradient noise floor;
    the running prefix sum always accumulates in f32.

    ``seg_pos`` selects the backward segmentation scheme by SHAPE: a dummy
    [1] array keeps the query-row scheme above; a real [M+1] exclusive
    prefix of per-rank emitted-pair counts (``TileBins.seg_pos``, exact
    mode) drops the M query rows from the value sort AND the re-key
    position sort entirely — segment boundaries are known, the id-sorted
    slot grads are sliced at ``seg_pos`` directly.  Only sound while
    ``tile_overflow == 0`` (window-budget drops would shift every later
    rank's segment); exact mode with a right-sized budget guarantees that
    operationally and the counter monitors it.

    Measured alternative (do not redo): precomputing the merge PERMUTATION
    from the keys alone (two int32 sorts in the fwd) and applying it in the
    bwd as a row-gather is SLOWER -- the [400k, 10] source exceeds the
    gather unit's scratch staging, so the permutation-apply runs as an
    HBM-latency-bound random row gather (2.8 ms) on top of the plan sorts
    (2x0.39 ms); the value sort moves the same bytes through the sort
    network's sequential-access merges (~2 ms total, round-3 on-chip
    trace).  Equal-key pair order is unspecified, but a fixed compiled sort
    network makes the summation order deterministic run-to-run."""
    out = attrs_n[gather]
    return out if pair_major else jnp.swapaxes(out, 1, 2)


def _gather_pack_fwd(grad_sort, pair_major, attrs_n, gather, seg_pos):
    return (_gather_pack(grad_sort, pair_major, attrs_n, gather, seg_pos),
            (gather, seg_pos, attrs_n.shape[0]))


def _pack2(a, b):
    """Two f32 channels → one uint32 (bf16 halves, a in the high bits)."""
    ab = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    bb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (ab << 16) | bb


def _unpack2(w):
    hi = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type(
        w.astype(jnp.uint16), jnp.bfloat16)
    return hi, lo


def _gather_pack_bwd(grad_sort, pair_major, res, d):
    gather, seg_pos, n = res
    if pair_major:
        t, k, c = d.shape
        d2 = d.reshape(t * k, c)
        chan = lambda j: d2[:, j]
    else:
        t, c, k = d.shape
        chan = lambda j: d[:, j, :].reshape(t * k)
    p = t * k
    use_counts = seg_pos.shape[0] > 1
    ids = gather.reshape(p)
    if use_counts:
        # Counts-based segmentation: sort slot rows by id alone (padding
        # slots carry the sentinel id n and land past every segment); the
        # per-rank boundaries are seg_pos.
        keys = ids
        chans = tuple(chan(j) for j in range(c))
        nq = 0
    else:
        nq = n + 1
        # Pairs get key 2*id+1, dense queries key 2*r: query r sorts after
        # all pairs with id < r and before any pair with id == r.
        keys = jnp.concatenate(
            [ids * 2 + 1, jnp.arange(nq, dtype=jnp.int32) * 2])
        zq = jnp.zeros((nq,), d.dtype)
        chans = tuple(
            jnp.concatenate([chan(j), zq]) for j in range(c))
    if grad_sort == "bf16" and c % 2 == 0 and pair_major and use_counts:
        # Pair-major cotangents pack channel PAIRS by BITCAST of adjacent
        # bf16 elements ([p, C] -> bf16 -> view [p, C/2] uint32): one
        # contiguous convert instead of C strided column slices +
        # shift/or packing (the columns of the half-width uint32 view are
        # the only strided reads left).  Little-endian: element 2i rides
        # the LOW 16 bits.
        db = d2.astype(jnp.bfloat16).reshape(p, c // 2, 2)
        packed32 = jax.lax.bitcast_convert_type(db, jnp.uint32)  # [p, C/2]
        ops = (keys,) + tuple(packed32[:, i] for i in range(c // 2))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        ch_list = []
        for w in out[1:]:
            hi, lo = _unpack2(w)
            ch_list += [lo.astype(jnp.float32), hi.astype(jnp.float32)]
    elif grad_sort == "bf16" and c % 2 == 0:
        ops = (keys,) + tuple(_pack2(chans[2 * i], chans[2 * i + 1])
                              for i in range(c // 2))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        ch_list = []
        for w in out[1:]:
            hi, lo = _unpack2(w)
            ch_list += [hi.astype(jnp.float32), lo.astype(jnp.float32)]
    else:
        ops = (keys,) + chans
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        ch_list = [x.astype(jnp.float32) for x in out[1:]]
    if use_counts:
        # Exclusive prefix at the known segment boundaries: rank r's rows
        # occupy [seg_pos[r], seg_pos[r+1]) of the id-sorted array.  Read
        # the INCLUSIVE prefix at seg_pos−1 (zero for boundary 0).  The
        # prefix is computed ROW-major ([p, C]; tri-matmuls on the other
        # contraction side) so this is a clean row gather — gathering
        # through a transposed [C, p] prefix ran element-strided at
        # ~3.6 GB/s (23 ms at street scale vs ~13 for the row form).
        sr = _blocked_cumsum_rows(jnp.stack(ch_list, axis=1))   # [p, C]
        b = jnp.where((seg_pos > 0)[:, None],
                      sr[jnp.maximum(seg_pos - 1, 0)],
                      0.0)                                # [M+1, C]
        return (b[1:] - b[:-1]).astype(d.dtype), None, None
    s = _blocked_cumsum_cm(jnp.stack(ch_list, axis=0))    # inclusive [C, ·]
    # Query positions, ordered by r: re-key the sorted keys by
    # (parity, value>>1) so the nq even (query) keys -- unique, ascending
    # in r -- sort to the front carrying their position; duplicate pair
    # re-keys land behind them in whatever order.  This keeps the parity
    # tag OUT of the main value sort (11 operands instead of 12).
    sk = out[0]
    pos = jax.lax.sort(
        (((sk & 1) << 30) | (sk >> 1),
         jnp.arange(p + nq, dtype=jnp.int32)),
        num_keys=1, is_stable=False)[1][:nq]
    b = jnp.transpose(s)[pos]                             # [nq, C]
    # s at query r = sum of pairs with id < r (query rows are zero).
    return (b[1:] - b[:-1]).astype(d.dtype), None, None


_gather_pack.defvjp(_gather_pack_fwd, _gather_pack_bwd)


def pack_gather_attrs(gather, mean2d, conic, color, opacity,
                      inv_depth, dtype=jnp.float32, order=None, rank=None,
                      grad_sort="f32", seg_pos=None, pair_major=False):
    """[N,·] attributes + [T,K] gather table → packed channel-major
    [T, 10, K] kernel input.

    The binning tables hold depth RANKS, so when ``order``/``rank`` are
    given (``TileBins.order`` / ``TileBins.rank``) the packed [N, 10] rows
    are permuted into depth order first — ONE cheap row permute
    (``permute_rows``, inverse-gather VJP) instead of an elementwise
    rank→row translation of the whole pair list.

    No mask plane and no sublane padding: slot validity is
    ``slot < per-tile count``, which the kernels derive from the SMEM
    counts they already hold for the block-skip.  Only the 10 real
    channels therefore ride the gather AND its sort-based VJP.
    ``dtype=bfloat16`` halves the gather, kernel-payload and
    backward-sort traffic; blending still accumulates in f32
    (``_alpha_block`` upcasts on load)."""
    attrs_n = jnp.concatenate([
        mean2d, conic, color, opacity[:, None], inv_depth[:, None]],
        axis=1).astype(dtype)                             # [N, 10]
    if order is not None:
        from .binning import permute_rows
        attrs_n = permute_rows(attrs_n, order, rank)
    if seg_pos is None:
        seg_pos = jnp.zeros((1,), jnp.int32)              # query-row scheme
    # [T, 10, K] channel-major, or [T, K, 10] pair-major (exact kernels).
    return _gather_pack(grad_sort, pair_major, attrs_n, gather, seg_pos)


def blend_tiles_pallas(
    bins,
    mean2d: jnp.ndarray,     # [N, 2] original rows (permuted internally)
    conic: jnp.ndarray,      # [N, 3]
    color: jnp.ndarray,      # [N, 3]
    opacity: jnp.ndarray,    # [N]
    inv_depth: jnp.ndarray,  # [N]
    height: int,
    width: int,
    bg: jnp.ndarray,         # [3]
    interpret: bool | None = None,
    attr_dtype=jnp.float32,
    grad_sort: str = "f32",
    tile_batch: int = 0,
):
    """Drop-in replacement for ``ops.blend.blend_tiles`` backed by the fused
    Pallas kernels.  The per-tile gather + channel packing runs in XLA (its
    VJP provides the grad scatter-add to Gaussian rows)."""
    tiles_x, tiles_y = bins.tiles_x, bins.tiles_y
    t_total = tiles_x * tiles_y
    k_cap = bins.gather.shape[1]
    if k_cap % KB != 0:
        raise ValueError(f"tile_capacity must be a multiple of {KB}, "
                         f"got {k_cap}")

    # Pack attributes per Gaussian FIRST ([N,16] rows), then ONE gather +
    # transpose — an order of magnitude cheaper than 11 separate [T,K]
    # gathers stacked on the channel axis (measured 27→15 ms fwd at
    # 512²/32k on v5e).  The exact kernels read PAIR-major [T_v, K, 10].
    attrs = pack_gather_attrs(bins.gather, mean2d, conic, color,
                              opacity, inv_depth, dtype=attr_dtype,
                              order=bins.order, rank=bins.rank,
                              grad_sort=grad_sort, seg_pos=bins.seg_pos,
                              pair_major=bins.t_of_v is not None)

    interp = _interpret_default() if interpret is None else interpret

    if bins.t_of_v is not None:
        # Exact (virtual-tile) mode: state carries across each tile's
        # consecutive K-wide windows inside the kernels; no per-tile
        # capacity truncation (see binning exact_extra).
        nv = bins.t_of_v.shape[0]
        tb = tile_batch or (8 if nv >= 2048 else 1)
        pad = -nv % tb
        t_safe = jnp.minimum(bins.t_of_v, t_total - 1)
        is_last = ((bins.t_of_v >= t_total)
                   | (jnp.arange(nv, dtype=jnp.int32)
                      == bins.last_v[t_safe])).astype(jnp.int32)
        meta = jnp.stack([t_safe, bins.wt, bins.vcounts, is_last])  # [4,T_v]
        if pad:
            meta = jnp.concatenate(
                [meta, jnp.zeros((4, pad), jnp.int32)
                 .at[MT_LAST].set(1)], axis=1)
            attrs = jnp.concatenate(
                [attrs, jnp.zeros((pad,) + attrs.shape[1:], attrs.dtype)])
        out = _blend_exact(interp, tiles_x, tb, None, None, 0, meta,
                           bins.last_v, attrs, bg[None, :])   # [T, 8, P]

        def to_image(flat, channels):
            img = flat.reshape(tiles_y, tiles_x, channels, TILE, TILE)
            img = img.transpose(2, 0, 3, 1, 4).reshape(
                channels, tiles_y * TILE, tiles_x * TILE)
            return img[:, :height, :width]

        image = to_image(out[:, OR:OB + 1, :], 3)
        invdepth = to_image(out[:, OI:OI + 1, :], 1)
        alpha_img = to_image(out[:, OA:OA + 1, :], 1)[0]
        return image, invdepth, alpha_img

    tile0 = jnp.zeros((1, 1), jnp.int32)
    # Tiles per kernel program (0 = auto): at large tile counts the
    # per-program fixed overhead (~2 µs windup/DMA setup) dwarfs the 1-2
    # live blocks a typically-sparse tile blends, so batch 8 tiles per
    # program; padded tiles carry count 0 and skip every block.
    tb = tile_batch or (8 if t_total >= 2048 else 1)
    pad = -t_total % tb
    counts = bins.counts.astype(jnp.int32)[None, :]
    if pad:
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((pad,) + attrs.shape[1:], attrs.dtype)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((1, pad), jnp.int32)], axis=1)
    out = _blend_packed(interp, tiles_x, 0, tb, tile0, counts, attrs,
                        bg[None, :])[:t_total]          # [T, 8, P]

    def to_image(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, channels, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(channels, tiles_y * TILE,
                                                   tiles_x * TILE)
        return img[:, :height, :width]

    image = to_image(out[:, OR:OB + 1, :], 3)
    invdepth = to_image(out[:, OI:OI + 1, :], 1)
    alpha_img = to_image(out[:, OA:OA + 1, :], 1)[0]
    return image, invdepth, alpha_img
