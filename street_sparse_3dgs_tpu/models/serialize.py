"""Stage artifacts and in-loop checkpoints.

The reference's inter-stage interface is the filesystem (SURVEY.md §5.4):
  - ``Scene.save`` → ``point_cloud/iteration_N/point_cloud.ply`` +
    ``pc_info.txt`` (skybox count) + ``exposure.json``
    (``scene/__init__.py:95-115``);
  - in-loop checkpoints: ``gaussians.capture()`` tuple → ``chkpntN.pth``
    (``scene/gaussian_model.py:88-123``).

Here: the same artifact set (ply via ``data/ply.py``, exposure json), and a
single-file ``.npz`` checkpoint that captures the full TrainState (params,
active mask, Adam moments, exposure + its moments, densify stats, step) plus
the static meta — restore resumes bit-exact.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..train.step import TrainState
from . import adam
from .gaussians import GaussianMeta, GaussianParams


def save_scene(model_path: str | Path, iteration: int, state: TrainState,
               meta: GaussianMeta, image_names: list[str]) -> Path:
    """Write the stage artifact set; returns the point_cloud directory."""
    from ..data.ply import save_gaussian_ply

    out = Path(model_path) / "point_cloud" / f"iteration_{iteration}"
    out.mkdir(parents=True, exist_ok=True)
    save_gaussian_ply(out / "point_cloud.ply", state.params,
                      np.asarray(state.active))
    (out / "pc_info.txt").write_text(f"{meta.skybox_points}\n")
    (out / "scaffold_info.txt").write_text(f"{meta.scaffold_points}\n")
    exposure = {name: np.asarray(state.exposure[i]).tolist()
                for i, name in enumerate(image_names)}
    (Path(model_path) / "exposure.json").write_text(json.dumps(exposure))
    return out


def load_scene_ply(point_cloud_dir: str | Path):
    """Load (params, skybox_points) back from a stage artifact directory."""
    from ..data.ply import load_gaussian_ply

    d = Path(point_cloud_dir)
    params = load_gaussian_ply(d / "point_cloud.ply")
    info = d / "pc_info.txt"
    skybox = int(info.read_text().split()[0]) if info.exists() else 0
    return params, skybox


def save_checkpoint(path: str | Path, state: TrainState, meta: GaussianMeta,
                    iteration: int) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {"iteration": np.int64(iteration),
            "meta": json.dumps(dataclasses.asdict(meta)),
            "active": np.asarray(state.active),
            "exposure": np.asarray(state.exposure),
            "exp_mu": np.asarray(state.exposure_adam.mu),
            "exp_nu": np.asarray(state.exposure_adam.nu),
            "exp_step": np.asarray(state.exposure_adam.step),
            "grad_accum": np.asarray(state.grad_accum),
            "denom": np.asarray(state.denom),
            "max_radii2d": np.asarray(state.max_radii2d),
            "step": np.asarray(state.step),
            "adam_step": np.asarray(state.adam_state.step)}
    for name in GaussianParams._fields:
        blob[f"p_{name}"] = np.asarray(getattr(state.params, name))
        blob[f"mu_{name}"] = np.asarray(getattr(state.adam_state.mu, name))
        blob[f"nu_{name}"] = np.asarray(getattr(state.adam_state.nu, name))
    np.savez_compressed(path, **blob)


def load_checkpoint(path: str | Path) -> tuple[TrainState, GaussianMeta, int]:
    with np.load(Path(path), allow_pickle=False) as z:
        meta = GaussianMeta(**json.loads(str(z["meta"])))

        def params_of(prefix):
            return GaussianParams(*(jnp.asarray(z[f"{prefix}_{n}"])
                                    for n in GaussianParams._fields))

        state = TrainState(
            params=params_of("p"),
            active=jnp.asarray(z["active"]),
            adam_state=adam.AdamState(mu=params_of("mu"), nu=params_of("nu"),
                                      step=jnp.asarray(z["adam_step"])),
            exposure=jnp.asarray(z["exposure"]),
            exposure_adam=adam.DenseAdamState(
                jnp.asarray(z["exp_mu"]), jnp.asarray(z["exp_nu"]),
                jnp.asarray(z["exp_step"])),
            grad_accum=jnp.asarray(z["grad_accum"]),
            denom=jnp.asarray(z["denom"]),
            max_radii2d=jnp.asarray(z["max_radii2d"]),
            step=jnp.asarray(z["step"]))
        return state, meta, int(z["iteration"])
