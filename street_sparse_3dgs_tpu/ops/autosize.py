"""Self-sizing for the exact (virtual-tile) rasterizer budgets.

VERDICT r4 item 2: the street production emission/window knobs (``max_dup``,
``dup_overscan``, ``dup_tails``, ``exact_extra``) were hand-tuned per scene
by ladder search, and a mis-sized ladder silently lost pairs on unprobed
views.  The CUDA reference needs no per-scene capacity tuning at all — its
pair list and tile ranges are dynamically sized
(``gaussian_renderer/__init__.py:105-113``).  This module is the static-shape
equivalent: it DERIVES the knobs from measured binning statistics over a
sample of views, with margin, so a fresh scene trains with zero hand-set
exact knobs.  Residual drift during training (densification changes the
distributions) is handled by the train loop's overflow-triggered growth —
between them no step ever trains on corrupted gradients
(``train/step.py`` gates the update on ``tile_overflow == 0`` in counts
mode).

Two measurements per sampled view:

1. **Emission ladder** — per-Gaussian surviving-tile counts (``kept``) under
   the exact ellipse-tile culling.  The full [N, S] scan at a huge S is
   unaffordable, but only rows with large rect coverage can have large
   ``kept``: probe the top ``probe_rows`` rows by coverage exactly (scan up
   to ``probe_scan`` rect positions), and bound every other row's kept by
   its rect coverage (kept ≤ coverage always).  The tail-bucket ladder then
   needs, at each bucket start ``s``, a budget ≥ count(kept > s) — counted
   exactly on the probe, conservatively (via coverage) off it.

2. **Window budget** — with the derived ladder, a stats-only
   ``bin_gaussians`` gives per-tile pair counts; the view needs
   ``sum(max(ceil(count/K), 1)) − T`` extra windows (BASELINE.md round 4:
   every UNUSED window is K dead slot-rows in every downstream sort/gather,
   so the margin is deliberately modest and the loop grows on overflow).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .binning import TILE, _tile_qmin, bin_gaussians, num_tiles, tile_rect
from .oracle import ALPHA_MIN
from .preprocess import Projected, project_gaussians


class ExactKnobs(NamedTuple):
    max_dup: int
    dup_overscan: int
    dup_tails: tuple            # ((budget, width), ...)
    exact_extra: int
    # Measured expectations at the sampled views (diagnostics):
    expected_dup_overflow: int  # pair slots past the scan window (worst view)
    expected_extras: int        # windows actually needed (worst view)


@jax.jit
def _coverage_pass(proj: Projected, tiles_x: int, tiles_y: int):
    """Rect tile coverage per row (upper bound on surviving tiles)."""
    x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius, tiles_x, tiles_y)
    cov = jnp.where(proj.valid, (x1 - x0) * (y1 - y0), 0)
    return cov.astype(jnp.int32)


def _kept_probe(proj: Projected, rows: jnp.ndarray, scan: int,
                tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """Exact surviving-tile count for ``rows`` (ellipse culling semantics of
    ``bin_gaussians``), evaluating up to ``scan`` rect positions."""
    mean2d = proj.mean2d[rows]
    conic = proj.conic[rows]
    radius = proj.radius[rows]
    opacity = proj.opacity[rows]
    valid = proj.valid[rows]
    x0, y0, x1, y1 = tile_rect(mean2d, radius, tiles_x, tiles_y)
    nx = jnp.where(valid, x1 - x0, 0)
    ny = jnp.where(valid, y1 - y0, 0)
    coverage = nx * ny
    slots = jnp.arange(scan, dtype=jnp.int32)
    nx_safe = jnp.maximum(nx, 1)
    inv_nx = 1.0 / nx_safe.astype(jnp.float32)
    sy = jnp.floor((slots[None, :].astype(jnp.float32) + 0.5)
                   * inv_nx[:, None]).astype(jnp.int32)
    sx = slots[None, :] - sy * nx_safe[:, None]
    tile_x = x0[:, None] + sx
    tile_y = y0[:, None] + sy
    in_range = slots[None, :] < jnp.minimum(coverage, scan)[:, None]
    qmin = _tile_qmin(mean2d, conic, tile_x, tile_y)
    qcap = 2.0 * (jnp.where(opacity > 0.0,
                            jnp.log(jnp.maximum(opacity, 1e-30)), -jnp.inf)
                  - jnp.log(ALPHA_MIN * (1.0 - 1e-3)))
    keep = in_range & (qmin <= qcap[:, None])
    return jnp.sum(keep, axis=1).astype(jnp.int32)


_kept_probe_jit = jax.jit(_kept_probe, static_argnums=(2, 3, 4))


def _ceil_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def derive_ladder(kept_probe: np.ndarray, cov_all_sorted: np.ndarray,
                  max_dup: int, scan_cap: int,
                  margin: float) -> tuple[int, tuple]:
    """Tail-bucket ladder from the probed kept counts.

    ``cov_all_sorted`` — descending coverage of ALL valid rows;
    ``kept_probe`` — exact kept of the top ``len(kept_probe)`` rows (rows
    off the probe are bounded by coverage: kept ≤ coverage).  Returns
    ``(dup_overscan, dup_tails)`` with total positions ≤ ``scan_cap``."""
    kept_sorted = np.sort(kept_probe)[::-1]
    n_probe = len(kept_probe)
    off_probe = cov_all_sorted[n_probe:]

    def cnt_gt(s: int) -> int:
        exact = int(np.searchsorted(-kept_sorted, -s, side="left"))
        # Rows off the probe: coverage bound (conservative).
        bound = int(np.searchsorted(-off_probe, -s, side="left"))
        return exact + bound

    kmax = int(kept_sorted[0]) if n_probe else 0
    tails = []
    s = max_dup
    while s < min(kmax, scan_cap) and len(tails) < 4:
        c = cnt_gt(s)
        if c == 0:
            break
        budget = _ceil_pow2(int(math.ceil(c * margin)))
        # Advance to the kept value at a geometrically-decayed rank so each
        # bucket's budget drops ~16× (the measured street ladders' shape).
        target = max(1, c // 16)
        if target <= n_probe:
            s_next = int(kept_sorted[target - 1])
        else:
            s_next = int(off_probe[min(target - n_probe, len(off_probe)) - 1]
                         ) if len(off_probe) else kmax
        width = max(4, s_next - s)
        width = min(width, scan_cap - s)
        if width <= 0:
            break
        tails.append((budget, width))
        s += width
    # Last bucket absorbs the remaining scan window if the max kept still
    # is not covered (bin_gaussians clamps widths to the scan anyway).
    if s < min(kmax, scan_cap) and tails:
        b, wd = tails[-1]
        tails[-1] = (b, wd + (min(kmax, scan_cap) - s))
        s = min(kmax, scan_cap)
    overscan = max(1, -(-s // max_dup))
    return overscan, tuple(tails)


def autosize_raster(means3d, scales, quats, opacities, sh_coeffs, cameras,
                    sh_degree: int, height: int, width: int,
                    tile_capacity: int, *, max_dup: int = 2,
                    scan_cap: int = 64, probe_rows: int = 16384,
                    probe_scan: int = 1024, margin: float = 1.25,
                    shards: int = 1, active_mask=None,
                    max_views: int = 8, scan_cap_max: int | None = None,
                    dup_tol: float = 1e-3) -> ExactKnobs:
    """Derive exact-mode knobs from up to ``max_views`` sampled cameras.

    Returns knobs sized so every sampled view binds with zero window
    overflow (and near-zero emission overflow) at ``tile_capacity``-wide
    windows; ``exact_extra`` divides by ``shards`` (tile-sharded exact
    rendering), and carries ``margin`` headroom for unsampled views.
    Training-time drift past the margin is caught by the loop's
    overflow-triggered growth.

    ``max_dup == 0`` also self-sizes the base emission width from the
    median positive rect coverage (clamped to [2, 16], power of two)."""
    tiles_x, tiles_y = num_tiles(height, width)
    t_total = tiles_x * tiles_y
    cams = cameras[:max_views]

    overscan_best, tails_best = 1, ()
    extras_worst = 0
    dup_of_worst = 0
    probe_rows = min(probe_rows, means3d.shape[0])

    ladder_inputs = []
    for cam in cams:
        proj = project_gaussians(means3d, scales, quats, opacities, sh_coeffs,
                                 cam, sh_degree, 1.0, active_mask)
        cov = _coverage_pass(proj, tiles_x, tiles_y)
        _, rows = jax.lax.top_k(cov, probe_rows)
        kept = _kept_probe_jit(proj, rows, probe_scan, tiles_x, tiles_y)
        cov_np = np.asarray(jax.device_get(cov))
        cov_sorted = np.sort(cov_np[cov_np > 0])[::-1]
        ladder_inputs.append((np.asarray(jax.device_get(kept)), cov_sorted,
                              proj))

    # One ladder must cover EVERY view: merge the probes (a bucket budget
    # must exceed the worst single view's count, and merging the sorted
    # arrays and taking per-view maxima of cnt_gt is equivalent to deriving
    # from the elementwise-max sorted kept profile).
    kept_stack = np.stack([np.sort(k)[::-1] for k, _, _ in ladder_inputs])
    kept_envelope = kept_stack.max(axis=0)
    cov_len = max(len(c) for _, c, _ in ladder_inputs)
    cov_stack = np.zeros((len(ladder_inputs), cov_len), np.int64)
    for i, (_, c, _) in enumerate(ladder_inputs):
        cov_stack[i, :len(c)] = c
    cov_envelope = cov_stack.max(axis=0)
    if max_dup == 0:
        pos = cov_envelope[cov_envelope > 0]
        p50 = int(np.median(pos)) if len(pos) else 2
        max_dup = min(16, max(2, _ceil_pow2(p50)))

    # Escalating scan window: an un-converged model (sparse init, large
    # splats) can need far more rect positions than the converged street
    # profile — double scan_cap until the measured emission overflow is
    # ≤ ``dup_tol`` of the binned pairs (or the memory-bound
    # ``scan_cap_max`` is hit; the [capacity, S] emission arrays grow with
    # S, so callers bound it by live capacity).
    if scan_cap_max is None:
        scan_cap_max = scan_cap
    while True:
        overscan_best, tails_best = derive_ladder(
            kept_envelope, cov_envelope, max_dup, scan_cap, margin)

        def view_stats(proj, md=max_dup, tails=tails_best,
                       osc=overscan_best):
            bins = bin_gaussians(proj, height, width, md, tile_capacity,
                                 dup_tails=tails, dup_overscan=osc)
            need = jnp.sum(jnp.maximum(
                -(-bins.counts // tile_capacity), 1)) - t_total
            return need, bins.dup_overflow, jnp.sum(bins.counts)

        view_stats = jax.jit(view_stats)
        extras_worst = dup_of_worst = 0
        pairs_worst = 1
        for _, _, proj in ladder_inputs:
            need, dup_of, pairs = jax.device_get(view_stats(proj))
            extras_worst = max(extras_worst, int(need))
            dup_of_worst = max(dup_of_worst, int(dup_of))
            pairs_worst = max(pairs_worst, int(pairs))
        if dup_of_worst <= dup_tol * pairs_worst or scan_cap >= scan_cap_max:
            break
        scan_cap = min(scan_cap * 2, scan_cap_max)

    unit = 128 * shards
    exact_extra = -(-max(int(math.ceil(extras_worst * margin)), unit)
                    // unit) * unit
    return ExactKnobs(max_dup=max_dup, dup_overscan=overscan_best,
                      dup_tails=tails_best, exact_extra=exact_extra,
                      expected_dup_overflow=dup_of_worst,
                      expected_extras=extras_worst)
