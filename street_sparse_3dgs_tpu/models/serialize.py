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


# Above this many points the reference switches to the packed-binary fast
# path (scene/__init__.py:103-105); we write both formats there too.
PACKED_BIN_THRESHOLD = 8_000_000


def save_packed_bin(path: str | Path, params: GaussianParams,
                    active: np.ndarray | None = None) -> None:
    """Write the reference's ``point_cloud.bin`` fast format
    (``scene/gaussian_model.py:473-506``): int32 count, then contiguous f32
    blocks xyz [N,3], SH features [N,K,3] (DC band first), opacity [N,1],
    log-scales [N,3], rotations [N,4]."""
    p = GaussianParams(*(np.asarray(x) for x in params))
    if active is not None:
        idx = np.nonzero(np.asarray(active))[0]
        p = GaussianParams(*(x[idx] for x in p))
    n = p.xyz.shape[0]
    feats = np.concatenate([p.features_dc, p.features_rest], axis=1)
    with open(path, "wb") as f:
        f.write(np.int32(n).tobytes())
        for arr in (p.xyz, feats, p.opacity_raw, p.log_scales, p.quats):
            f.write(np.ascontiguousarray(arr, np.float32).tobytes())


def load_packed_bin(path: str | Path) -> GaussianParams:
    """Read ``point_cloud.bin``; the SH band count is inferred from the
    record size (the format itself does not store it)."""
    raw = Path(path).read_bytes()
    n = int(np.frombuffer(raw, np.int32, 1)[0])
    body = np.frombuffer(raw, np.float32, offset=4)
    if n == 0:
        k = 16
    else:
        per_row, rem = divmod(body.size, n)
        k, krem = divmod(per_row - 11, 3)   # 3 + 3K + 1 + 3 + 4 per row
        if rem or krem or k < 1 or body.size != n * (11 + 3 * k):
            raise ValueError(
                f"{path}: corrupt point_cloud.bin — {body.size} floats do "
                f"not factor as n*(11+3K) for n={n}")
    sizes = [3 * n, 3 * k * n, n, 3 * n, 4 * n]
    off, parts = 0, []
    for s in sizes:
        parts.append(body[off:off + s])
        off += s
    feats = parts[1].reshape(n, k, 3)
    return GaussianParams(
        xyz=parts[0].reshape(n, 3),
        features_dc=feats[:, :1],
        features_rest=feats[:, 1:],
        log_scales=parts[3].reshape(n, 3),
        quats=parts[4].reshape(n, 4),
        opacity_raw=parts[2].reshape(n, 1))


def save_scene(model_path: str | Path, iteration: int, state: TrainState,
               meta: GaussianMeta, image_names: list[str]) -> Path:
    """Write the stage artifact set; returns the point_cloud directory."""
    from ..data.ply import save_gaussian_ply

    out = Path(model_path) / "point_cloud" / f"iteration_{iteration}"
    out.mkdir(parents=True, exist_ok=True)
    active = np.asarray(state.active)
    if int(active.sum()) > PACKED_BIN_THRESHOLD:
        save_packed_bin(out / "point_cloud.bin", state.params, active)
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
    if (d / "point_cloud.ply").exists():
        params = load_gaussian_ply(d / "point_cloud.ply")
    else:
        params = load_packed_bin(d / "point_cloud.bin")
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
