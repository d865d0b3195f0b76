"""Shared runtime utilities: deterministic state, timestamped logging,
per-stage wall-clock timing, optional profiler traces.

Parity targets (SURVEY.md §5.1/§5.5):
  - ``safe_state``: RNG seeding + timestamped stdout
    (``utils/general_utils.py``);
  - ``run_and_log``: per-stage durations appended to
    ``training_pipeline_timing.txt`` (``complete_training.sh:16-60``);
  - stage profiling: ``jax.profiler`` traces instead of CUDA events.
"""

from __future__ import annotations

import contextlib
import random
import sys
import time
from datetime import datetime
from pathlib import Path

import numpy as np


class _TimestampedStream:
    def __init__(self, wrapped):
        self._wrapped = wrapped
        self._at_line_start = True

    def write(self, text):
        for chunk in text.splitlines(keepends=True):
            if self._at_line_start and chunk.strip():
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                self._wrapped.write(f"[{stamp}] ")
            self._wrapped.write(chunk)
            self._at_line_start = chunk.endswith("\n")

    def flush(self):
        self._wrapped.flush()

    def __getattr__(self, name):
        return getattr(self._wrapped, name)


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Seed host RNGs and timestamp every stdout line (the reference's
    ``safe_state``; device RNG is explicit `jax.random` keys here)."""
    random.seed(seed)
    np.random.seed(seed)
    if not silent and not isinstance(sys.stdout, _TimestampedStream):
        sys.stdout = _TimestampedStream(sys.stdout)


@contextlib.contextmanager
def stage_timer(name: str, log_path: str | Path | None = None,
                profile_dir: str | Path | None = None):
    """Time a pipeline stage; append ``<name>: <seconds>`` to the timing log
    (the run_and_log format) and optionally capture a jax.profiler trace."""
    ctx = contextlib.nullcontext()
    if profile_dir is not None:
        import jax

        ctx = jax.profiler.trace(str(Path(profile_dir) / name))
    t0 = time.time()
    with ctx:
        yield
    dt = time.time() - t0
    line = f"{name}: {dt:.2f} s"
    print(line)
    if log_path is not None:
        path = Path(log_path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(line + "\n")


class EmaMeter:
    """Progress-bar loss smoothing (reference: 0.4·new + 0.6·old,
    ``train_single.py:166-178``)."""

    def __init__(self, alpha: float = 0.4):
        self.alpha = alpha
        self.value: float | None = None

    def update(self, x: float) -> float:
        self.value = x if self.value is None else (
            self.alpha * x + (1 - self.alpha) * self.value)
        return self.value
