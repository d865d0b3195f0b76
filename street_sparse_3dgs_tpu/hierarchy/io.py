"""Hierarchy serialization — the ``.hier`` / ``anchors.bin`` equivalent.

The upstream binary layout lives in the missing ``gaussianhierarchy``
submodule, so we define our own documented container (SURVEY.md §7.3
'.hier binary compatibility': validate against rendered images, not bytes).

Format: a single ``.hier.npz`` (numpy zip) with keys
  xyz, features_dc, features_rest, log_scales, quats, opacity_raw
      — [n_rows, ...] raw params, abs-opacity convention, skybox tail last
  parent, child_start, child_count    — [n_nodes] int32 topology
  box_center, box_half, size          — [n_nodes] geometry / cut metric
  anchors                             — [n_nodes] bool frozen mask
  skybox_count                        — scalar

plus an optional sidecar ``exposure.json`` ({image_name: 3x4 nested lists}),
mirroring the reference's stage artifacts (``scene/gaussian_model.py:
344-371``: ``.hier`` + ``anchors.bin`` + ``exposure.json``).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from .structure import Hierarchy


def save_hierarchy(path: str | Path, h: Hierarchy) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        xyz=np.asarray(h.params.xyz),
        features_dc=np.asarray(h.params.features_dc),
        features_rest=np.asarray(h.params.features_rest),
        log_scales=np.asarray(h.params.log_scales),
        quats=np.asarray(h.params.quats),
        opacity_raw=np.asarray(h.params.opacity_raw),
        parent=np.asarray(h.parent),
        child_start=np.asarray(h.child_start),
        child_count=np.asarray(h.child_count),
        box_center=np.asarray(h.box_center),
        box_half=np.asarray(h.box_half),
        size=np.asarray(h.size),
        anchors=np.asarray(h.anchors),
        skybox_count=np.int64(h.skybox_count),
    )


def load_hierarchy(path: str | Path) -> Hierarchy:
    with np.load(Path(path)) as z:
        params = GaussianParams(
            xyz=jnp.asarray(z["xyz"]),
            features_dc=jnp.asarray(z["features_dc"]),
            features_rest=jnp.asarray(z["features_rest"]),
            log_scales=jnp.asarray(z["log_scales"]),
            quats=jnp.asarray(z["quats"]),
            opacity_raw=jnp.asarray(z["opacity_raw"]),
        )
        return Hierarchy(
            params=params,
            parent=jnp.asarray(z["parent"]),
            child_start=jnp.asarray(z["child_start"]),
            child_count=jnp.asarray(z["child_count"]),
            box_center=jnp.asarray(z["box_center"]),
            box_half=jnp.asarray(z["box_half"]),
            size=jnp.asarray(z["size"]),
            anchors=jnp.asarray(z["anchors"]),
            skybox_count=int(z["skybox_count"]),
        )


def save_exposure(path: str | Path, exposure: np.ndarray,
                  image_names: list[str]) -> None:
    blob = {name: np.asarray(exposure[i]).tolist()
            for i, name in enumerate(image_names)}
    Path(path).write_text(json.dumps(blob))


def load_exposure(path: str | Path) -> dict[str, np.ndarray]:
    blob = json.loads(Path(path).read_text())
    return {k: np.asarray(v, np.float32) for k, v in blob.items()}
