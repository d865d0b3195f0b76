"""Device profiling: jax.profiler traces + per-op roofline summaries.

SURVEY §5.1 tooling.  The reference fork profiles with nvidia-smi and
wall-clock prints; the TPU-native equivalent is an XLA trace.  This module
wraps capture (``trace_fn``) and turns the emitted Chrome-trace JSON into a
per-HLO-op table with durations, bytes accessed, and model FLOPs — enough
to read fusion hotspots and roofline position (bytes/s vs FLOP/s) without
TensorBoard.

Typical use::

    from street_sparse_3dgs_tpu.profiling import trace_fn, summarize_trace
    tdir = trace_fn(train_step, state, batch, iters=3)
    for row in summarize_trace(tdir)[:15]:
        print(row["ms"], row["name"], row["source"])
"""

from __future__ import annotations

import gzip
import json
from collections import defaultdict
from pathlib import Path
from typing import Any, Sequence

import jax

# v5e single-chip peaks, for roofline fractions (public spec: 197 TFLOP/s
# bf16, ~0.82 TB/s HBM).  f32 VPU work lands well below the MXU line.
PEAK_BYTES_S = 0.82e12
PEAK_FLOP_S = 197e12


def trace_fn(fn, *args, trace_dir: str | None = None, iters: int = 3,
             warmup: int = 1, **kwargs) -> str:
    """Run ``fn(*args)`` under ``jax.profiler.trace`` (after ``warmup``
    un-traced calls to exclude compilation) and return the trace dir."""
    import tempfile

    tdir = trace_dir or tempfile.mkdtemp(prefix="ss3dgs_trace_")
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return tdir


def _find_trace_json(trace_dir: str) -> Path:
    hits = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return hits[-1]


def summarize_trace(trace_dir: str, iters: int = 3,
                    device_only: bool = True) -> list[dict[str, Any]]:
    """Aggregate trace events by op name → rows sorted by total time.

    Each row: ``name``, ``ms`` (per iteration), ``count``, ``bytes``,
    ``flops``, ``bw_frac`` / ``flop_frac`` (roofline fractions of v5e peak),
    ``category``, ``source`` (file:line of the originating jaxpr)."""
    blob = json.load(gzip.open(_find_trace_json(trace_dir)))
    events = blob.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in e.get("args", {}).get("name", "")}

    agg: dict[str, dict[str, Any]] = defaultdict(
        lambda: {"us": 0.0, "count": 0, "bytes": 0, "flops": 0,
                 "category": "", "source": ""})
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_only and device_pids and e.get("pid") not in device_pids:
            continue
        a = e.get("args", {})
        row = agg[e.get("name", "?")]
        row["us"] += e["dur"]
        row["count"] += 1
        row["bytes"] += int(a.get("raw_bytes_accessed", 0) or 0)
        row["flops"] += int(a.get("model_flops", 0) or 0)
        row["category"] = a.get("hlo_category", row["category"])
        row["source"] = a.get("source", row["source"])

    out = []
    for name, r in agg.items():
        ms = r["us"] / 1e3 / max(1, iters)
        secs = r["us"] / 1e6
        out.append({
            "name": name, "ms": round(ms, 3),
            "count": r["count"] // max(1, iters),
            "bytes": r["bytes"] // max(1, iters),
            "flops": r["flops"] // max(1, iters),
            "bw_frac": round(r["bytes"] / secs / PEAK_BYTES_S, 4)
            if secs else 0.0,
            "flop_frac": round(r["flops"] / secs / PEAK_FLOP_S, 4)
            if secs else 0.0,
            "category": r["category"], "source": r["source"],
        })
    out.sort(key=lambda d: -d["ms"])
    return out


def print_summary(rows: Sequence[dict[str, Any]], top: int = 20) -> None:
    print(f"{'ms':>9} {'count':>6} {'GB/s':>7} {'GF/s':>8}  name / source")
    for r in rows[:top]:
        gbs = r["bw_frac"] * PEAK_BYTES_S / 1e9
        gfs = r["flop_frac"] * PEAK_FLOP_S / 1e9
        src = r["source"].split("/")[-1] if r["source"] else ""
        print(f"{r['ms']:9.3f} {r['count']:6d} {gbs:7.1f} {gfs:8.1f}  "
              f"{r['name'][:60]} {src}")
