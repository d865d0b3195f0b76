"""In-program multi-host runtime (``jax.distributed``) + host identity.

The reference scales across machines only via Slurm array jobs — one
process per chunk, coordinated through the filesystem
(``scripts/full_train.py``: ``--use_slurm`` submits per-chunk sbatch jobs
and polls for artifact files).  This repo keeps that filesystem-coordinated
fan-out (``pipeline.full_train(host_id=…, num_hosts=…)``) and adds the
TPU-native alternative: one *program* spanning all hosts through
``jax.distributed.initialize``, where

  - ``host_id``/``num_hosts`` default from the process index/count of the
    initialized runtime, so the same ``full_train`` invocation on every
    host automatically partitions the chunk list;
  - ``jax.devices()`` becomes the global device list, so
    ``parallel.mesh.make_mesh`` builds meshes spanning hosts — DP gradient
    psums then ride ICI within a slice and DCN across slices, with XLA
    choosing the collective topology.

On a single un-initialized process everything degrades to (0, 1) — no
distributed runtime is required for the common case.
"""

from __future__ import annotations

import os

import jax

# Environment variables understood by ``init_distributed`` (mirroring the
# names torch.distributed-style launchers export, for drop-in cluster use).
ENV_COORDINATOR = "SS3DGS_COORDINATOR"
ENV_NUM_PROCESSES = "SS3DGS_NUM_PROCESSES"
ENV_PROCESS_ID = "SS3DGS_PROCESS_ID"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> tuple[int, int]:
    """Join (or create) the multi-host JAX runtime; returns
    ``(process_index, process_count)``.

    Arguments default from the ``SS3DGS_COORDINATOR`` /
    ``SS3DGS_NUM_PROCESSES`` / ``SS3DGS_PROCESS_ID`` environment (or, on
    TPU pods, from the TPU metadata that ``jax.distributed`` autodetects).
    Safe to call twice — a second call is a no-op returning the current
    identity."""
    # Peek ONLY at jax's distributed state: jax.process_count()/index()
    # would initialize the XLA backend, after which
    # jax.distributed.initialize() refuses to run — the guard itself would
    # make the join path dead on arrival.
    from jax._src import distributed as _dist
    already = getattr(getattr(_dist, "global_state", None), "client", None)
    if already is not None:
        return jax.process_index(), jax.process_count()
    coordinator_address = coordinator_address or os.environ.get(
        ENV_COORDINATOR)
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])
    if coordinator_address is None and num_processes is None:
        # Nothing to join: stay a single-process runtime (the TPU-pod
        # autodetect path would hang off-pod, so require explicit config).
        # Literal (0, 1) — calling jax.process_index() here would
        # initialize the backend and poison a later initialize().
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def host_identity(host_id: int | None = None,
                  num_hosts: int | None = None) -> tuple[int, int]:
    """Resolve the (host_id, num_hosts) pair used for chunk fan-out.

    Explicit arguments (the reference-style launcher contract) win; ``None``
    falls back to the runtime identity — ``jax.process_index()/count()``,
    which is (0, 1) unless ``init_distributed`` joined a larger runtime."""
    if num_hosts is None:
        num_hosts = jax.process_count()
    if host_id is None:
        if num_hosts > jax.process_count():
            # Every process would resolve to index 0 and train the same
            # chunk partition while the others never get produced.
            raise ValueError(
                f"num_hosts={num_hosts} exceeds the runtime process count "
                f"({jax.process_count()}): pass host_id explicitly (the "
                "launcher contract) or join the runtime via "
                "init_distributed() first")
        host_id = jax.process_index() if num_hosts > 1 else 0
    if not (0 <= host_id < num_hosts):
        raise ValueError(f"host_id {host_id} out of range for "
                         f"{num_hosts} hosts")
    return host_id, num_hosts
