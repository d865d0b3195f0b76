"""Device-mesh construction for multi-chip training.

The reference has no intra-training distributed backend at all (SURVEY.md
§2.6: chunk-level process parallelism via Slurm is its only scaling axis).
The TPU build makes scaling first-class: a `jax.sharding.Mesh` with

  - ``data``: camera/view data parallelism inside a chunk (grad psum over ICI)
  - ``tile``: framebuffer tile sharding for very large renders (SP-analog)

Chunk-level parallelism (the Slurm fan-out, P1 in SURVEY.md §2.6) maps to
*hosts*: distinct chunks run in distinct processes/slices exactly like the
reference, orchestrated by ``pipeline/full_train.py``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_tile: int = 1,
              devices=None) -> Mesh:
    """Build a (data, tile) mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_tile
    if n_data * n_tile != len(devices):
        devices = devices[: n_data * n_tile]
    arr = np.asarray(devices).reshape(n_data, n_tile)
    return Mesh(arr, axis_names=("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))
