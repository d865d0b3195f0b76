"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding logic is testable without a pod (SURVEY.md §4 consequence (d)).

Note: the environment's sitecustomize pre-imports jax and pins
``jax_platforms=axon,cpu`` (the axon TPU tunnel).  Backend init is lazy, so
overriding the config + XLA_FLAGS here — before any computation runs — still
lands us on an 8-device virtual CPU mesh.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
