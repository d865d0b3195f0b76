"""Monocular depth prior generation — the ``preprocess/generate_depth.py``
wrapper around Depth-Anything-V2.

The reference shells out to the Depth-Anything-V2 repo's ``run.py``
(``generate_depth.py:27-36``: ``--encoder vitl --pred-only --grayscale``)
and consumes its 16-bit inverse-depth PNGs.  Mono-depth inference remains an
external prior step here too (SURVEY.md §2.3); this wrapper

  - invokes a local Depth-Anything-V2 checkout/CLI when available
    (``DEPTH_ANYTHING_DIR``), or
  - falls back to a torch-hub / transformers pipeline when those weights are
    reachable, and
  - otherwise raises with the exact command to run elsewhere.

Outputs: per-image 16-bit PNGs where larger = closer (inverse depth,
normalized per image — the per-image {scale, offset} alignment to the COLMAP
frame is ``preprocess/depth_scale.py``'s job, as in the reference).
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np


def depth_anything_cli_cmd(images_dir, out_dir,
                           encoder: str = "vitl") -> list[str]:
    da_dir = os.environ.get("DEPTH_ANYTHING_DIR",
                            "submodules/Depth-Anything-V2")
    return ["python", f"{da_dir}/run.py", "--encoder", encoder,
            "--pred-only", "--grayscale",
            "--img-path", str(images_dir), "--outdir", str(out_dir)]


def _save_16bit(arr: np.ndarray, path: Path) -> None:
    from PIL import Image

    lo, hi = float(arr.min()), float(arr.max())
    norm = (arr - lo) / max(hi - lo, 1e-9)
    Image.fromarray((norm * 65535.0).astype(np.uint16)).save(path)


def generate_depth(images_dir, out_dir, encoder: str = "vitl") -> int:
    """Produce inverse-depth PNGs for every image under ``images_dir``
    (recursing one camera-folder level, like the rectified layout).
    Returns the number of maps written."""
    images_dir = Path(images_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # Preferred: the native JAX Depth-Anything port (runs on TPU) with a
    # converted torch checkpoint (DEPTH_ANYTHING_CKPT=...pth/.npz).
    ckpt = os.environ.get("DEPTH_ANYTHING_CKPT", "")
    if ckpt and Path(ckpt).exists():
        return generate_depth_jax(images_dir, out_dir, ckpt)

    da_dir = os.environ.get("DEPTH_ANYTHING_DIR",
                            "submodules/Depth-Anything-V2")
    if Path(da_dir, "run.py").exists():
        subprocess.run(depth_anything_cli_cmd(images_dir, out_dir,
                                              encoder), check=True)
        return len(list(out_dir.rglob("*.png")))

    # Fallback: transformers depth-estimation pipeline (needs downloaded
    # weights; zero-egress environments will raise below).
    try:
        from transformers import pipeline  # noqa: PLC0415
        from PIL import Image

        pipe = pipeline("depth-estimation",
                        model=f"depth-anything/Depth-Anything-V2-"
                              f"{'Large' if encoder == 'vitl' else 'Small'}"
                              f"-hf", device=-1)
    except Exception as e:  # noqa: BLE001
        cmd = " ".join(depth_anything_cli_cmd(images_dir, out_dir, encoder))
        raise RuntimeError(
            "no Depth-Anything-V2 available (set DEPTH_ANYTHING_DIR to a "
            f"checkout, or run elsewhere:\n  {cmd}\n"
            f"underlying error: {e}") from e

    n = 0
    for img_path in sorted(images_dir.rglob("*")):
        if img_path.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        rel = img_path.relative_to(images_dir)
        dst = out_dir / rel.with_suffix(".png")
        dst.parent.mkdir(parents=True, exist_ok=True)
        depth = np.asarray(
            pipe(Image.open(img_path).convert("RGB"))["predicted_depth"])
        _save_16bit(depth, dst)   # DA-V2 predicts inverse depth directly
        n += 1
    return n


def generate_depth_jax(images_dir, out_dir, ckpt_path,
                       target: int | None = None) -> int:
    """Native path: run the JAX Depth-Anything port
    (``preprocess/depth_anything_jax.py``, torch-parity-tested) over every
    image, writing the reference-contract 16-bit inverse-depth PNGs.
    ``target`` (short-side inference resolution, default 518 as in the
    DA-V2 transform) can also come from ``DEPTH_ANYTHING_TARGET``."""
    if target is None:
        target = int(os.environ.get("DEPTH_ANYTHING_TARGET", "518"))
    from PIL import Image

    from .depth_anything_jax import infer_inverse_depth, load_checkpoint

    images_dir, out_dir = Path(images_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    params, cfg = load_checkpoint(ckpt_path)
    n = 0
    for img_path in sorted(images_dir.rglob("*")):
        if img_path.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        rel = img_path.relative_to(images_dir)
        dst = out_dir / rel.with_suffix(".png")
        dst.parent.mkdir(parents=True, exist_ok=True)
        img = np.asarray(Image.open(img_path).convert("RGB"))
        depth = infer_inverse_depth(params, cfg, img, target=target)
        _save_16bit(depth, dst)
        n += 1
    return n
