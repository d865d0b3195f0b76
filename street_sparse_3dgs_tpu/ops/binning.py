"""Tile binning: assign depth-sorted Gaussians to 16×16 pixel tiles.

TPU-native replacement for the CUDA rasterizer's duplicate-keys radix sort
(SURVEY.md §7.3 'tile binning + depth sort without atomics'): everything is
static-shaped and built from `lax.sort` / `searchsorted` / gathers.

Algorithm:
  1. sort Gaussians by camera depth once (`argsort`; culled rows carry inf);
  2. each Gaussian covers a clamped rectangle of tiles derived from its pixel
     radius; it emits up to ``max_dup`` (tile, gaussian) pairs, row-major over
     its rectangle (overflow beyond ``max_dup`` tiles is counted, not silently
     dropped);
  3. the [N·D] pair list is sorted by the packed int32 key
     ``tile_id << ceil_log2(N) | depth_rank`` ALONE (keys are unique, so an
     unstable sort yields exactly tile-grouped, depth-ordered pairs, and
     the depth rank doubles as the carried value — it rides the low bits).
     A single-operand sort beats the (key, value) two-operand form by
     ~0.75 ms at 1.36M pairs on v5e, which itself beat the stable
     two-operand sort ~4×.  When ``log2(T+1)+log2(N) > 31`` (huge scenes)
     it falls back to a two-operand (tile, rank) lexicographic sort;
  4. per-tile segments are located with ``searchsorted`` and materialized as a
     fixed-capacity gather table [num_tiles, K] + validity mask (per-tile
     overflow beyond K is likewise counted).

The gather table holds DEPTH RANKS: it indexes into depth-sorted attribute
rows.  Consumers permute the [N] attribute rows into depth order once
(``permute_rows`` — an O(N) row gather whose custom VJP is the inverse
gather, never a scatter; N ≪ pairs) and then gather with the table.
Recovering original row ids per pair instead would cost an elementwise
rank→row lookup over the pair list — measured 11.7 ms at 1.36M pairs on
v5e (4-byte random gathers are per-element latency-bound), vs ~0.1 ms for
the row permute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .oracle import ALPHA_MIN
from .preprocess import Projected

TILE = 16

# Tiles copied per slab-gather kernel program: DMAs for the whole group are
# issued before any is awaited, so their latencies overlap.
SLAB_GROUP = 8


class TileBins(NamedTuple):
    order: jnp.ndarray        # [M] depth-sort permutation: order[r] = row of rank r
    rank: jnp.ndarray         # [N] inverse map: rank[i] = depth rank of row i
    #                           (== M for rows dropped by visible compaction)
    gather: jnp.ndarray       # [T, K] DEPTH RANKS (indices into depth-sorted rows)
    #                           (exact mode: [T_v, K] over VIRTUAL tiles)
    mask: jnp.ndarray         # [T, K] bool validity ([T_v, K] in exact mode)
    counts: jnp.ndarray       # [T] number of gaussians binned per tile (pre-clip)
    dup_overflow: jnp.ndarray   # scalar: tiles lost to the per-gaussian cap
    tile_overflow: jnp.ndarray  # scalar: pairs lost to the per-tile cap
    tiles_x: int
    tiles_y: int
    vis_overflow: jnp.ndarray = 0  # visible rows dropped past vis_capacity
    # Exact ("virtual tile") mode — `exact_extra > 0`: a real tile with
    # count > K wraps onto ceil(count/K) CONSECUTIVE K-wide virtual tiles,
    # so no per-tile capacity truncation happens while every array stays
    # static-shaped ([T_v = T + exact_extra] rows; only tiles past the
    # extra-window budget still overflow, counted).  The reference CUDA
    # rasterizer has no per-tile cap at all (its tile ranges index a
    # dynamically-sized sorted pair list); this is the static-shape
    # equivalent.  All None when exact mode is off.
    t_of_v: jnp.ndarray | None = None  # [T_v] real tile of each virtual tile
    #                                    (== T for unused budget rows)
    wt: jnp.ndarray | None = None      # [T_v] window index within its tile
    last_v: jnp.ndarray | None = None  # [T] last virtual tile of each real tile
    vcounts: jnp.ndarray | None = None  # [T_v] pairs in this window (≤ K)
    # Counts-based backward segmentation (`with_seg_pos=True`, exact mode):
    # seg_pos[r] = exclusive prefix of per-RANK emitted-pair counts, so a
    # rank's slot rows occupy [seg_pos[r], seg_pos[r+1]) of the id-sorted
    # slot-grad array and the backward needs neither query rows nor the
    # re-key sort (pallas_blend._gather_pack).  Only valid while
    # tile_overflow == 0 (drops would shift every later segment).
    seg_pos: jnp.ndarray | None = None  # [M+1] int32


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, order: jnp.ndarray,
                 inv_order: jnp.ndarray) -> jnp.ndarray:
    """``x[order]`` with the VJP expressed as the INVERSE gather
    ``g[inv_order]`` instead of XLA's scatter-add (exact because ``order``
    is a permutation; scatters are row-latency-bound on TPU).  Consumers
    use this to move attribute rows into depth order before gathering with
    the rank-space tile tables.

    ``order`` may be a SLICE of a permutation (visible compaction:
    len(order) = V ≤ N): rows not selected must carry
    ``inv_order == len(order)``, which the VJP maps to an appended zero
    row — their cotangent is exactly zero (they were never rendered)."""
    return x[order]


# Above this row count the forward permute runs as a multi-operand sort
# keyed by the inverse permutation instead of a row gather: the gather is
# row-latency-bound (~12.5 ns/row → 12.4 ms at 1M×10 on v5e) while the
# sort network's sequential merges do the same move in ~8.5 ms.
PERMUTE_SORT_MIN_ROWS = 262_144


def _permute_rows_fwd(x, order, inv_order):
    n = x.shape[0]
    if n >= PERMUTE_SORT_MIN_ROWS and x.ndim == 2:
        # Row i belongs at position inv_order[i]; excluded rows (visible
        # compaction) share inv_order == len(order) and fall past the
        # slice in arbitrary order.
        ops = jax.lax.sort(
            (inv_order,) + tuple(x[:, j] for j in range(x.shape[1])),
            num_keys=1, is_stable=False)
        out = jnp.stack(ops[1:], axis=1)[:order.shape[0]]
        return out, inv_order
    return x[order], inv_order


def _permute_rows_bwd(res, g):
    gpad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)])
    return gpad[res], None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def num_tiles(height: int, width: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              tiles_x: int, tiles_y: int):
    """Per-Gaussian covered tile rectangle, exclusive max (CUDA ``getRect``
    semantics: ``min = (p - r) / B``, ``max = (p + r + B - 1) / B``, both
    clamped to the grid; negative coordinates clamp to 0 so trunc-vs-floor is
    immaterial).  Returns int32 (x0, y0, x1, y1)."""
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return x0, y0, jnp.maximum(x1, x0), jnp.maximum(y1, y0)


# Mosaic tiles int32 HBM buffers as (8, 128): dynamic HBM slices must start
# on a 1024-element boundary.  The slab gather therefore DMAs the aligned
# window covering each segment and funnel-shifts it into place in VMEM.
ALIGN = 1024
LANES = 128


def _make_slab_kernel(k_cap: int, win_rows: int):
    rows = k_cap // LANES

    def kernel(starts_ref, vals_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        dmas = []
        for b in range(SLAB_GROUP):
            start = starts_ref[g * SLAB_GROUP + b]
            row0 = (start // ALIGN) * (ALIGN // LANES)
            dmas.append(pltpu.make_async_copy(
                vals_ref.at[pl.ds(row0, win_rows)], scratch.at[b],
                sems.at[b]))
        for dma in dmas:
            dma.start()
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        for b in range(SLAB_GROUP):
            dmas[b].wait()
            start = starts_ref[g * SLAB_GROUP + b]
            offset = start % ALIGN
            ro = offset // LANES
            lo = offset % LANES
            # Window rows rotated so the segment's first row lands on row 0
            # (roll right by -ro ≡ win_rows - ro), then a lane funnel shift
            # by ``lo``: element k of the segment is window[(offset+k)//128,
            # (offset+k)%128], i.e. lanes < 128-lo come from the row itself,
            # the wrapped tail from the following row.
            a = pltpu.roll(scratch[b], (win_rows - ro) % win_rows, 0)
            d0 = pltpu.roll(a[:rows], (LANES - lo) % LANES, 1)
            d1 = pltpu.roll(a[1:rows + 1], (LANES - lo) % LANES, 1)
            out_ref[b] = jnp.where(lane < LANES - lo, d0, d1)

    return kernel


def _slab_gather(sorted_vals: jnp.ndarray, starts: jnp.ndarray,
                 k_cap: int, interpret: bool) -> jnp.ndarray:
    """[T, K] gather table from contiguous per-tile segments
    ``sorted_vals[starts[t] : starts[t]+K]`` of the pair-sorted value array.

    XLA lowers both the equivalent vmapped ``dynamic_slice`` and the affine
    gather ``vals[starts[:,None]+iota]`` to *serial* per-tile HBM reads
    (~1.6 ms at 1024 tiles × K=384 on v5e).  Here each Pallas program issues
    ``SLAB_GROUP`` aligned-window DMAs back-to-back before awaiting any, so
    the copies ride concurrent DMA engines, and shifts each window into
    place with ``pltpu.roll``.  ``k_cap`` must be a multiple of 128."""
    if k_cap % LANES:
        raise ValueError(f"k_cap must be a multiple of {LANES}, got {k_cap}")
    t = starts.shape[0]
    t_pad = -t % SLAB_GROUP
    if t_pad:
        # Padded programs re-copy segment 0; their rows are sliced off.
        starts = jnp.concatenate(
            [starts, jnp.zeros((t_pad,), starts.dtype)])
    win_elems = ALIGN * (1 + -(-k_cap // ALIGN))
    win_rows = win_elems // LANES
    # Pad so the aligned window of the largest possible start stays in
    # bounds: start ≤ len(sorted_vals) ⇒ window end ≤ pad_to.
    n = sorted_vals.shape[0]
    pad_to = (n // ALIGN + 1) * ALIGN + win_elems
    vals2d = jnp.concatenate(
        [sorted_vals,
         jnp.zeros((pad_to - n,), sorted_vals.dtype)]).reshape(-1, LANES)
    rows = k_cap // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((t + t_pad) // SLAB_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((SLAB_GROUP, rows, LANES),
                               lambda g, s: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SLAB_GROUP, win_rows, LANES), sorted_vals.dtype),
            pltpu.SemaphoreType.DMA((SLAB_GROUP,)),
        ],
    )
    out = pl.pallas_call(
        _make_slab_kernel(k_cap, win_rows), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t + t_pad, rows, LANES),
                                       sorted_vals.dtype),
        interpret=interpret,
    )(starts, vals2d)
    return out[:t].reshape(t, k_cap)


# Above this sorted-array length the per-tile boundary probes run as the
# two-level sampled search below instead of XLA's searchsorted (a while
# loop of serial probe fusions — 2.6 ms at the street scale's 4M keys).
SAMPLED_SEARCH_MIN_ROWS = 262_144


def _sampled_searchsorted(vals: jnp.ndarray, probes: jnp.ndarray,
                          interpret: bool, block: int = 1024) -> jnp.ndarray:
    """``searchsorted(vals, probes, side='left')`` for a long sorted
    ``vals`` and few ``probes``: coarse-search a ``block``-strided sample
    (broadcast compare+count — probes × n/block elements), slab-DMA each
    probe's candidate window (starts are block-aligned, so ``_slab_gather``
    needs no funnel shift), and count in-window elements < probe."""
    n = vals.shape[0]
    coarse = vals[::block]                               # [ceil(n/block)]
    c = jnp.sum((coarse[None, :] < probes[:, None]).astype(jnp.int32),
                axis=1)                                  # #coarse < probe
    starts = jnp.maximum(c - 1, 0) * block
    win = _slab_gather(vals, starts.astype(jnp.int32), block, interpret)
    pos = starts[:, None] + jnp.arange(block, dtype=jnp.int32)[None, :]
    cnt = jnp.sum(((win < probes[:, None]) & (pos < n)).astype(jnp.int32),
                  axis=1)
    return (starts + cnt).astype(jnp.int32)


def _tile_qmin(mean2d, conic, tile_x, tile_y):
    """Minimum of the Mahalanobis form Q(d) = a·dx² + 2b·dx·dy + c·dy²
    over a tile's pixel box, per (gaussian, covered-tile) pair [N, D].

    The blend evaluates power = −Q/2 at pixel centers; minimizing Q over
    the continuous box [16t, 16t+15]² is a conservative lower bound, so a
    pair culled by it (max alpha < 1/255) would have been skipped at
    EVERY pixel by the blend's own alpha_min rule — dropping it cannot
    change the image.  Interior test + 4 closed-form edge minimizations
    (clamped 1-D quadratics); a, c > 0 by the conic's low-pass term."""
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    # Hoist the reciprocals: a [N,1] divide instead of two [N,S] divides
    # (VPU float division is multi-op; this runs over ~4M elements/step).
    inv_a = 1.0 / a
    inv_c = 1.0 / c
    dxl = (tile_x * TILE).astype(jnp.float32) - mean2d[:, 0:1]
    dxr = dxl + (TILE - 1)
    dyb = (tile_y * TILE).astype(jnp.float32) - mean2d[:, 1:2]
    dyt = dyb + (TILE - 1)
    inside = (dxl <= 0) & (dxr >= 0) & (dyb <= 0) & (dyt >= 0)

    def edge_x(x):
        dy = jnp.clip(-b * x * inv_c, dyb, dyt)
        return a * x * x + 2.0 * b * x * dy + c * dy * dy

    def edge_y(y):
        dx = jnp.clip(-b * y * inv_a, dxl, dxr)
        return a * dx * dx + 2.0 * b * dx * y + c * y * y

    q = jnp.minimum(jnp.minimum(edge_x(dxl), edge_x(dxr)),
                    jnp.minimum(edge_y(dyb), edge_y(dyt)))
    return jnp.where(inside, 0.0, q)


# Rect positions evaluated per gaussian, as a multiple of max_dup: the
# ellipse culling drops most rect corners, so scanning extra positions and
# compacting the survivors to max_dup recovers real tiles that plain rect
# enumeration would lose — without growing the global pair sort.
DUP_OVERSCAN = 4

# Tail buckets for gaussians whose surviving-tile count exceeds max_dup:
# (budget, extra_width) — up to ``budget`` such gaussians emit their next
# ``extra_width`` compacted tiles through an additional (small) pair list.
# The uniform [N, max_dup] emission alone loses whole VISIBLE tiles of
# large splats (measured 0.074 mean image error at 512²/32k with
# max_dup=32 — the tile-capacity cap, by contrast, is image-invisible
# there); the CUDA reference has no per-gaussian cap at all
# (prefix-sum duplicateWithKeys).  Budgets clamp to N; gaussians beyond a
# bucket's budget (or tiles beyond the overscan window) stay counted in
# ``dup_overflow``.  Sized so the bench scene (6.5k gaussians past
# max_dup=32, 0.4k past 64, max kept 106 < overscan 128) drops nothing.
DUP_TAILS: tuple[tuple[int, int], ...] = ((8192, 32), (512, 96))


def _tail_bucket(kept, tile_id, inv_rank, n, start, budget, width, t_total):
    """Pair keys/ranks for compacted tile slots [start, start+width) of up to
    ``budget`` gaussians with kept > start.  Returns (keys, ranks, lost,
    sel_rows, granted) where ``lost`` counts pairs of qualifying gaussians
    beyond the budget and (sel_rows, granted) give each selected row's
    granted tail-slot count (for the per-row emitted-pair accounting).
    Members are prioritized near-camera-first by their depth rank."""
    flag = kept > start
    excess = jnp.clip(kept - start, 0, width).astype(jnp.int32)
    # Members first, nearest first; sentinel n sorts all non-members last.
    member = jnp.where(flag, inv_rank, jnp.int32(n))
    rows = jnp.arange(n, dtype=jnp.int32)
    bits_e = max(1, int(width).bit_length())
    if max(1, int(n).bit_length()) + bits_e <= 31:
        # excess ≤ width rides the member key's low bits (non-members all
        # carry excess 0, so duplicate sentinel keys are harmless): one
        # operand fewer through each tail sort.
        packed = (member << bits_e) | excess
        packed, sel_row = jax.lax.sort((packed, rows), num_keys=1,
                                       is_stable=False)
        member = packed >> bits_e
        sel_excess = packed & ((1 << bits_e) - 1)
    else:
        member, sel_row, sel_excess = jax.lax.sort(
            (member, rows, excess), num_keys=1, is_stable=False)
    valid = member[:budget] < n
    lost = jnp.sum(excess) - jnp.sum(jnp.where(valid, sel_excess[:budget], 0))
    sel_safe = jnp.where(valid, sel_row[:budget], 0)
    # Static column slice FIRST, then a plain row gather: the combined
    # advanced-index form ``tile_id[sel_safe, start:start+width]`` lowers to
    # a serial while-loop of dynamic-slices on TPU (~7 ms at M=8192).
    tiles = jnp.take(tile_id[:, start:start + width], sel_safe,
                     axis=0)                              # [M, width]
    live = (jnp.arange(width, dtype=jnp.int32)[None, :]
            < jnp.where(valid, sel_excess[:budget], 0)[:, None])
    keys = jnp.where(live, tiles, t_total).astype(jnp.int32).ravel()
    ranks = jnp.broadcast_to(
        jnp.where(valid, member[:budget], 0)[:, None], tiles.shape).ravel()
    granted = jnp.where(valid, sel_excess[:budget], 0)
    return keys, ranks, lost, sel_safe, granted


def bin_gaussians(proj: Projected, height: int, width: int,
                  max_dup: int, tile_capacity: int,
                  dup_tails: tuple[tuple[int, int], ...] = DUP_TAILS,
                  vis_capacity: int | None = None,
                  key_mode: str | None = None,
                  exact_extra: int = 0,
                  with_seg_pos: bool = False,
                  exact_shards: int = 1,
                  dup_overscan: int = 0,
                  ) -> TileBins:
    """``key_mode`` forces the pair-sort key encoding (``"packed31"``,
    ``"packed32"``, ``"lex"``) for tests; ``None`` picks by key width.

    ``exact_extra > 0`` enables exact (virtual-tile) mode: that many extra
    K-wide windows are budgeted so tiles with count > K keep ALL their
    pairs (see the TileBins field docs).  Extra windows are granted in
    tile order until the budget runs out; pairs beyond granted windows
    stay counted in ``tile_overflow``."""
    n = proj.depth.shape[0]
    if with_seg_pos and vis_capacity is not None and vis_capacity < n:
        # Checked against the ORIGINAL row count (``n`` is rebound to the
        # compacted count below, where this comparison would be dead).
        raise NotImplementedError(
            "seg_pos (counts-based backward) with vis_capacity")
    tiles_x, tiles_y = num_tiles(height, width)
    t_total = tiles_x * tiles_y

    # Depth order enters only through the RANK packed into the sort key —
    # everything else works on the original (unsorted) rows, saving five
    # [N]-row gathers.  inv_rank[i] = depth position of row i (culled rows,
    # depth=inf, take the largest ranks).
    order = jnp.argsort(proj.depth)                    # stable; inf last
    inv_rank_n = jax.lax.sort(
        (order, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
        is_stable=False)[1]

    if vis_capacity is not None and vis_capacity < n:
        # Visible compaction: at street scale most rows are frustum-culled
        # per view, yet the emission scan grid, the pair sort, and the
        # packed-key rank width all pay for N.  Depth-sorted rows put the
        # visible ones FIRST (culled depths are +inf), so slicing the
        # nearest ``V = vis_capacity`` rows (a) shrinks every [·, S]
        # emission array N→V, (b) keeps the single-operand packed pair
        # sort alive at million-gaussian scenes (rank_bits = log2 V, not
        # log2 N), and (c) makes ranks the IDENTITY (rows are already
        # depth-ordered — the compaction gather subsumes the row permute).
        # Visible rows past V — the FARTHEST — are dropped and counted
        # (graceful, LOD-like degradation; never silent).
        v = vis_capacity
        sel = order[:v]
        src = jax.lax.stop_gradient(jnp.concatenate([
            proj.mean2d, proj.conic, proj.radius[:, None],
            proj.opacity[:, None]], axis=1))           # [N, 7], one gather
        rows = src[sel]
        mean2d, conic = rows[:, 0:2], rows[:, 2:5]
        radius, opacity = rows[:, 5], rows[:, 6]
        n_valid = jnp.sum(proj.valid.astype(jnp.int32))
        valid = jnp.arange(v, dtype=jnp.int32) < n_valid
        vis_overflow = jnp.maximum(n_valid - v, 0)
        inv_rank = jnp.arange(v, dtype=jnp.int32)      # identity in V-space
        rank_out = jnp.minimum(inv_rank_n, v)          # dropped rows → V
        order_out = sel
        m = v
    else:
        mean2d, conic = proj.mean2d, proj.conic
        radius, opacity = proj.radius, proj.opacity
        valid = proj.valid
        vis_overflow = jnp.int32(0)
        inv_rank = inv_rank_n
        rank_out, order_out = inv_rank_n, order
        m = n

    x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y)

    nx = jnp.where(valid, x1 - x0, 0)
    ny = jnp.where(valid, y1 - y0, 0)
    coverage = nx * ny                                  # [N]

    scan = max_dup * (dup_overscan or DUP_OVERSCAN)
    n = m                                               # row count from here on
    slots = jnp.arange(scan, dtype=jnp.int32)           # [S]
    nx_safe = jnp.maximum(nx, 1)
    # slots // nx as float multiply-by-reciprocal: exact because
    # (slots+0.5)/nx = q + (r+0.5)/nx lies strictly inside (q, q+1) with
    # margin ≥ 0.5/nx ≫ f32 eps at these magnitudes (slots < 2^10,
    # nx ≤ tiles_x).  A non-constant int32 divide lowers to a multi-op
    # sequence on the VPU — this is two [N,S] elementwise arrays of FMAs.
    inv_nx = 1.0 / nx_safe.astype(jnp.float32)
    sy = jnp.floor((slots[None, :].astype(jnp.float32) + 0.5)
                   * inv_nx[:, None]).astype(jnp.int32)  # [N, S]
    sx = slots[None, :] - sy * nx_safe[:, None]
    tile_x = x0[:, None] + sx
    tile_y = y0[:, None] + sy
    tile_id = tile_y * tiles_x + tile_x
    in_range = slots[None, :] < jnp.minimum(coverage, scan)[:, None]
    # Exact ellipse-tile culling (the CUDA rect test keeps every tile the
    # 3σ box touches; most are dead corners for anisotropic gaussians):
    # drop pairs whose best-possible alpha over the tile stays below the
    # blend's 1/255 skip threshold — image-identical by construction, and
    # it cuts per-tile occupancy (overflow pressure / needed capacity).
    qmin = _tile_qmin(mean2d, conic, tile_x, tile_y)
    # opac·exp(−qmin/2) ≥ αmin ⇔ qmin ≤ 2(log opac − log αmin): the log
    # runs once per gaussian instead of exp over the [N, S] scan grid.
    # Small margin (1−1e-3): per-pixel Q in the blend rounds differently.
    opac = opacity
    qcap = 2.0 * (jnp.where(opac > 0.0, jnp.log(jnp.maximum(opac, 1e-30)),
                            -jnp.inf)
                  - jnp.log(ALPHA_MIN * (1.0 - 1e-3)))
    keep = in_range & (qmin <= qcap[:, None])
    # Per-row compaction: surviving tiles first, then slice to max_dup —
    # a wide-rect gaussian whose real (elliptical) footprint fits max_dup
    # no longer loses tiles to dead rect corners.  A row's rect tiles are
    # DISTINCT, so packing the drop flag above the tile id gives unique
    # keys and a single-operand unstable sort (4.3 → ~2.5 ms at street
    # scale; the flag bit unpacks off with the mask).
    bits_t = (t_total + 1).bit_length()
    if bits_t + 1 <= 31:
        packed_kt = ((~keep).astype(jnp.int32) << bits_t) | tile_id
        packed_kt = jax.lax.sort((packed_kt,), num_keys=1, is_stable=False,
                                 dimension=1)[0]
        tile_id = packed_kt & ((1 << bits_t) - 1)
    else:
        _, tile_id = jax.lax.sort(
            ((~keep).astype(jnp.int32), tile_id), num_keys=1,
            is_stable=True, dimension=1)
    kept = jnp.sum(keep, axis=1)
    live = jnp.arange(max_dup, dtype=jnp.int32)[None, :] < \
        jnp.minimum(kept, max_dup)[:, None]
    keys = jnp.where(live, tile_id[:, :max_dup],
                     t_total).astype(jnp.int32).ravel()   # [N*D]
    ranks = jnp.broadcast_to(inv_rank[:, None], (n, max_dup)).ravel()

    # Tail buckets: big gaussians emit their compacted tiles beyond max_dup
    # through small extra pair lists (see DUP_TAILS) instead of dropping them.
    key_parts, rank_parts = [keys], [ranks]
    start = max_dup
    tail_lost = jnp.int32(0)
    emitted = jnp.minimum(kept, max_dup).astype(jnp.int32)  # [N] per row
    for budget, width in dup_tails:
        width = min(width, scan - start)
        budget = min(budget, n)
        if width <= 0 or budget <= 0:
            continue
        tk, tr, lost, sel_rows, granted = _tail_bucket(
            kept, tile_id, inv_rank, n, start, budget, width, t_total)
        key_parts.append(tk)
        rank_parts.append(tr)
        emitted = emitted.at[sel_rows].add(granted)
        tail_lost = tail_lost + lost
        start += width
    keys = jnp.concatenate(key_parts)
    ranks = jnp.concatenate(rank_parts)
    # Lost work: survivors past the covered slot range, bucket-budget
    # overruns, and rect positions never evaluated (coverage beyond the
    # overscan window).
    dup_overflow = (jnp.sum(jnp.maximum(kept - start, 0)) + tail_lost
                    + jnp.sum(jnp.maximum(coverage - scan, 0)))

    rank_bits = max(1, (n - 1).bit_length())
    key_bits = rank_bits + (t_total + 1).bit_length()
    if key_mode is None:
        key_mode = ("packed31" if key_bits <= 31
                    else "packed32" if key_bits <= 32 else "lex")
    if key_mode != "lex":
        # Packed keys are unique ((tile, rank) pairs are), so a SINGLE
        # operand fully determines the order — the rank rides the low bits
        # as both sort tiebreak and carried value (measured 2.1× cheaper
        # than the two-operand sort at 16M pairs on v5e).  At 32 bits the
        # sort runs on uint32 (signed int32 would order high tiles first).
        if key_mode == "packed31":
            packed = (keys << rank_bits) | ranks
            probes = jnp.arange(t_total + 1, dtype=jnp.int32) << rank_bits
        else:
            packed = ((keys.astype(jnp.uint32) << rank_bits)
                      | ranks.astype(jnp.uint32))
            probes = (jnp.arange(t_total + 1).astype(jnp.uint32)
                      << rank_bits)
        sorted_vals = jax.lax.sort((packed,), num_keys=1,
                                   is_stable=False)[0]
        if (jax.default_backend() == "tpu"
                and sorted_vals.shape[0] >= SAMPLED_SEARCH_MIN_ROWS):
            boundaries = _sampled_searchsorted(sorted_vals, probes, False)
        else:
            boundaries = jnp.searchsorted(sorted_vals,
                                          probes).astype(jnp.int32)
        # Ranks unpack AFTER the [T, K] table gather (393k elements instead
        # of the full pair list).
        extract = lambda table: (
            table.astype(jnp.uint32) & ((1 << rank_bits) - 1)
        ).astype(jnp.int32)
    else:
        # Lexicographic (tile, depth-rank); the rank is key AND value.
        sorted_keys, sorted_vals = jax.lax.sort((keys, ranks), num_keys=2,
                                                is_stable=False)
        boundaries = jnp.searchsorted(
            sorted_keys, jnp.arange(t_total + 1, dtype=jnp.int32))
        extract = lambda table: table
    starts = boundaries[:-1]                            # [T]
    counts = boundaries[1:] - starts

    if exact_extra > 0:
        # Virtual-tile window allocation: every real tile gets one K-wide
        # window; tiles needing more draw extra windows from the static
        # ``exact_extra`` budget in tile order (prefix allocation — a tile
        # is granted extras only while the budget's running total covers
        # it).  Consecutive virtual tiles of a tile stay adjacent, which
        # the blend kernels rely on for their cross-window state carry.
        #
        # ``exact_shards > 1`` (tile-sharded rendering): the tile range is
        # padded to a shard multiple and each shard's slab gets its own
        # budget ``exact_extra/S``, so shard boundaries in VIRTUAL-tile
        # space are STATIC (at multiples of L + E_s) and never split a
        # tile's windows — the kernels' scratch carry stays device-local.
        kcap = tile_capacity
        s_n = exact_shards
        if exact_extra % s_n:
            raise ValueError("exact_extra must divide by exact_shards")
        t_pad_total = -(-t_total // s_n) * s_n
        pad_t = t_pad_total - t_total
        cnt_p = jnp.concatenate(
            [counts, jnp.zeros((pad_t,), counts.dtype)]) if pad_t else counts
        st_p = jnp.concatenate(
            [starts, jnp.zeros((pad_t,), starts.dtype)]) if pad_t else starts
        ln = t_pad_total // s_n                         # tiles per shard
        e_s = exact_extra // s_n
        l_v = ln + e_s                                  # windows per shard
        cnt2 = cnt_p.reshape(s_n, ln)
        nw_need = jnp.maximum(-(-cnt2 // kcap), 1)
        extra_need = nw_need - 1
        ecum = jnp.cumsum(extra_need, axis=1) - extra_need
        nw = 1 + jnp.clip(e_s - ecum, 0, extra_need)    # [S, L]
        cum = jnp.cumsum(nw, axis=1)                    # [S, L]
        vv = jnp.arange(l_v, dtype=jnp.int32)
        # searchsorted(cum, vv, 'right') as a broadcast compare+count: the
        # [S, L, L_v] fused compare-reduce runs at VPU rates (~0.3 ms at
        # street scale) where XLA's searchsorted lowers to a while loop of
        # serial probe fusions (measured 3.2 ms on v5e).
        tloc = jnp.sum((cum.astype(jnp.int32)[:, :, None]
                        <= vv[None, None, :]).astype(jnp.int32),
                       axis=1)                          # [S, L_v]
        used = tloc < ln                                # [S, L_v]
        tloc_safe = jnp.minimum(tloc, ln - 1)
        take = jax.vmap(lambda a, i: a[i])
        wt2 = jnp.where(
            used, vv[None, :] - (take(cum, tloc_safe)
                                 - take(nw, tloc_safe)), 0)
        starts_v = jnp.where(
            used, take(st_p.reshape(s_n, ln), tloc_safe) + wt2 * kcap, 0)
        vcounts = jnp.where(
            used, jnp.clip(take(cnt2, tloc_safe) - wt2 * kcap, 0, kcap), 0)
        shard_base = (jnp.arange(s_n, dtype=jnp.int32) * ln)[:, None]
        t_of_v = jnp.where(used, shard_base + tloc_safe, t_pad_total)
        last_v = ((jnp.arange(s_n, dtype=jnp.int32) * l_v)[:, None]
                  + cum - 1).reshape(-1)[:t_total]      # [T] global v ids
        tile_overflow = jnp.sum(jnp.maximum(cnt2 - nw * kcap, 0))
        exact = dict(t_of_v=t_of_v.reshape(-1),
                     wt=wt2.reshape(-1).astype(jnp.int32),
                     last_v=last_v.astype(jnp.int32),
                     vcounts=vcounts.reshape(-1).astype(jnp.int32))
        gather_starts = starts_v.reshape(-1)
        gather_counts = vcounts.reshape(-1)
    else:
        tile_overflow = jnp.sum(jnp.maximum(counts - tile_capacity, 0))
        exact = dict()
        gather_starts, gather_counts = starts, counts

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    if jax.default_backend() == "tpu" and tile_capacity % LANES == 0:
        # Pallas slab-DMA copy (overlapped per-tile segment reads).
        gather = _slab_gather(sorted_vals, gather_starts, tile_capacity,
                              False)
    else:
        # On CPU a vmapped dynamic_slice lowers to slice loads instead of
        # an elementwise gather; keeps tests off the interpret-mode DMA
        # path (covered separately by test_raster.py slab-gather parity).
        padded = jnp.concatenate(
            [sorted_vals, jnp.zeros((tile_capacity,), sorted_vals.dtype)])
        gather = jax.vmap(
            lambda s: jax.lax.dynamic_slice(
                padded, (s,), (tile_capacity,)))(gather_starts)
    mask = k[None, :] < jnp.minimum(gather_counts, tile_capacity)[:, None]
    # Masked slots carry the SENTINEL rank n (one past the last attr row):
    # in the id-keyed backward sorts they fall past every real segment
    # (consumers clamp the attr gather; kernels mask by counts anyway).
    gather = jnp.where(mask, extract(gather), n)

    if with_seg_pos:
        # Per-RANK emitted-pair counts: carry ``emitted`` through a packed
        # single-operand sort keyed by depth position (emitted ≤ scan fits
        # the low bits), then an exclusive prefix.  The packed form needs
        # rank_bits + value_bits ≤ 31 (int32, like the pair-key ladder
        # above); huge-scene overflow falls back to a two-operand sort.
        bits = max(1, int(scan).bit_length())
        if max(1, (n - 1).bit_length()) + bits <= 31:
            packed_er = (inv_rank << bits) | emitted
            er = jax.lax.sort((packed_er,), num_keys=1, is_stable=False)[0] \
                & ((1 << bits) - 1)
        else:
            er = jax.lax.sort((inv_rank, emitted), num_keys=1,
                              is_stable=False)[1]
        seg_pos = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(er).astype(jnp.int32)])            # [M+1]
        exact["seg_pos"] = seg_pos

    return TileBins(order=order_out, rank=rank_out, gather=gather, mask=mask,
                    counts=counts, dup_overflow=dup_overflow,
                    tile_overflow=tile_overflow,
                    tiles_x=tiles_x, tiles_y=tiles_y,
                    vis_overflow=vis_overflow, **exact)
