"""Typed configuration tree + reflection-based CLI.

TPU-native equivalent of the reference's ``arguments/__init__.py`` ParamGroup
system: dataclass fields become argparse flags automatically (same names and
defaults as ``ModelParams`` / ``PipelineParams`` / ``OptimizationParams``,
``arguments/__init__.py:47-110``), a full config snapshot is written to
``<model_path>/cfg_args`` by the training entry points, and
:func:`load_combined` merges a saved snapshot back with CLI overrides
(the ``get_combined_args`` semantics, ``arguments/__init__.py:112-132``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path


@dataclasses.dataclass
class ModelConfig:
    """Dataset / scene-loading parameters (reference ``ModelParams``)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    exp_name: str = ""
    images: str = "images"
    alpha_masks: str = ""
    depths: str = ""
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    eval: bool = False
    skip_scale_big_gauss: bool = False
    hierarchy: str = ""
    pretrained: str = ""
    skybox_num: int = 0
    scaffold_file: str = ""
    bounds_file: str = ""
    skybox_locked: bool = False
    # Street-sparse fork flags:
    additional_depth_maps: bool = False
    gt_point_cloud_constraints: bool = False
    constraint_treshold: float = 0.05   # (sic — reference spelling)
    additional_depth_maps_weight: float = 0.9


@dataclasses.dataclass
class PipelineConfig:
    """Renderer knobs (reference ``PipelineParams`` + TPU-specific extras)."""

    debug: bool = False
    # TPU rasterizer tuning (ours):
    raster_method: str = "tiled"     # "tiled" | "oracle" | "pallas"
    max_dup: int = 64
    tile_capacity: int = 512
    tiles_chunk: int = 16
    # Exact (virtual-tile) budget for the pallas method: extra K-wide
    # windows so deep tiles keep ALL binned pairs (reference parity — its
    # rasterizer has no per-tile cap).  0 = padded mode; -1 = SELF-SIZING:
    # the train loop measures binning statistics on sample views and
    # derives exact_extra + the emission ladder (ops/autosize.py), then
    # grows the budget on overflow — zero hand-set exact knobs, matching
    # the reference's no-tuning contract.
    exact_extra: int = 0
    # Pair-emission shape (0/() = module defaults; filled in by the
    # autosizer under exact_extra == -1).  dup_tails accepts
    # "budget:width,budget:width" on the CLI.
    dup_overscan: int = 0
    dup_tails: tuple = ()
    # Cotangent payload width through the backward segment-reduction sort
    # ("f32" exact | "bf16" packed — street-scale speed knob).
    grad_sort: str = "f32"
    # Backward segmentation scheme ("sort" | "counts"; counts requires
    # exact mode and zero tile overflow — see ops.rasterize.RasterConfig).
    grad_reduce: str = "sort"


@dataclasses.dataclass
class OptimizationConfig:
    """Training hyperparameters (reference ``OptimizationParams`` defaults)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00002
    position_lr_final: float = 0.0000002
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.001
    exposure_lr_final: float = 0.0001
    exposure_lr_delay_steps: int = 5000
    exposure_lr_delay_mult: float = 0.001
    percent_dense: float = 0.0001
    lambda_dssim: float = 0.2
    densification_interval: int = 300
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.015
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01


_GROUPS = {"model": ModelConfig, "pipeline": PipelineConfig,
           "opt": OptimizationConfig}


def parse_tails(s) -> tuple:
    """``"budget:width,budget:width"`` → ``((budget, width), ...)``
    (already-parsed tuples/lists pass through; '' → ())."""
    if not s:
        return ()
    if isinstance(s, (tuple, list)):
        return tuple((int(b), int(w)) for b, w in s)
    return tuple(tuple(int(x) for x in part.split(":"))
                 for part in s.split(",") if part)


def add_group_args(parser: argparse.ArgumentParser, cls) -> None:
    """Auto-create ``--field`` flags from dataclass fields (bools become
    store_true, mirroring ParamGroup's reflection)."""
    for f in dataclasses.fields(cls):
        name = "--" + f.name
        if f.type in ("bool", bool):
            parser.add_argument(name, action="store_true",
                                default=f.default)
        elif f.type in ("tuple", tuple):
            default = f.default if f.default is not dataclasses.MISSING \
                else f.default_factory()
            parser.add_argument(name, type=parse_tails, default=default)
        else:
            typ = {"int": int, "float": float, "str": str}.get(f.type, str) \
                if isinstance(f.type, str) else f.type
            parser.add_argument(name, type=typ, default=f.default)


def extract_group(args: argparse.Namespace, cls):
    kw = {}
    for f in dataclasses.fields(cls):
        if not hasattr(args, f.name):
            continue
        v = getattr(args, f.name)
        if f.type in ("tuple", tuple):
            v = parse_tails(v)          # JSON round-trips tuples as lists
        kw[f.name] = v
    return cls(**kw)


def make_parser(description: str = "") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    for cls in _GROUPS.values():
        add_group_args(parser, cls)
    return parser


def parse_all(argv=None, description: str = ""):
    parser = make_parser(description)
    args, _ = parser.parse_known_args(argv)
    return (extract_group(args, ModelConfig),
            extract_group(args, PipelineConfig),
            extract_group(args, OptimizationConfig), args)


def save_cfg_args(model_path: str | Path, model: ModelConfig,
                  pipeline: PipelineConfig, opt: OptimizationConfig) -> None:
    """Snapshot the full config (reference writes a repr'd Namespace; we write
    JSON, same purpose/location: ``<model_path>/cfg_args``)."""
    path = Path(model_path)
    path.mkdir(parents=True, exist_ok=True)
    blob = {name: dataclasses.asdict(cfg) for name, cfg in
            (("model", model), ("pipeline", pipeline), ("opt", opt))}
    (path / "cfg_args").write_text(json.dumps(blob, indent=2))


def load_combined(model_path: str | Path, argv=None):
    """Merge a saved cfg_args with CLI flags; CLI wins where explicitly given
    (``get_combined_args`` semantics)."""
    blob = json.loads((Path(model_path) / "cfg_args").read_text())
    parser = make_parser()
    args, _ = parser.parse_known_args(argv or [])
    explicit = set()
    for tok in (argv or []):
        if tok.startswith("--"):
            explicit.add(tok[2:].split("=")[0])
    out = []
    for name, cls in _GROUPS.items():
        saved = blob.get(name, {})
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name in explicit:
                kw[f.name] = getattr(args, f.name)
            elif f.name in saved:
                kw[f.name] = saved[f.name]
            else:
                kw[f.name] = f.default
            if f.type in ("tuple", tuple):
                kw[f.name] = parse_tails(kw[f.name])
        out.append(cls(**kw))
    return tuple(out)
