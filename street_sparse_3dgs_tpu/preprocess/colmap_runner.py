"""Orchestration of the external ``colmap`` binary —
``preprocess/generate_colmap.py`` / ``prepare_chunk.py`` equivalents.

COLMAP itself stays an external CLI dependency (exactly as in the reference,
SURVEY.md §1 L6); this module sequences its invocations for the two
calibration workflows:

  - ``cal_sfm`` (fork default, ``generate_colmap.py:163-290``): known-pose
    triangulation — fill_database → distance matcher (50 pairs) →
    feature_extractor with existing cameras → matches_importer →
    point_triangulator (poses fixed) → 2× pose-frozen bundle_adjuster;
  - ``refine_chunk`` (``prepare_chunk.py:26-190``): per-chunk refinement —
    fill_database → distance matcher (200 pairs) → feature_extractor →
    matches_importer → 2× (point_triangulator + bundle_adjuster) →
    rigid re-registration back to the original frame (undo drift).

Every invocation is logged; a missing ``colmap`` executable raises a clear
error listing the exact commands so they can run elsewhere.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from ..data import colmap as colmap_io
from . import colmap_db, matchers


def colmap_available() -> bool:
    return shutil.which("colmap") is not None


def _run(cmd: list[str], log: list[str]) -> None:
    log.append(" ".join(cmd))
    if not colmap_available():
        raise RuntimeError(
            "the `colmap` executable is not on PATH; run these commands on "
            "a machine with COLMAP:\n" + "\n".join(log))
    subprocess.run(cmd, check=True)


def triangulate_known_poses(sparse_in: str | Path, images_dir: str | Path,
                            workdir: str | Path, sparse_out: str | Path,
                            n_pairs: int = 50,
                            n_features: int = 16384) -> list[str]:
    """The cal_sfm workflow: triangulate scene points for known camera poses
    (the reference's fork-default calibration)."""
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    db = workdir / "database.db"
    pairs = workdir / "pairs.txt"
    log: list[str] = []

    cams, images, _ = colmap_io.read_model(sparse_in)
    colmap_db.fill_database(db, cams, images)
    matchers.make_distance_pairs(sparse_in, pairs, n_neighbors=n_pairs)

    _run(["colmap", "feature_extractor", "--database_path", str(db),
          "--image_path", str(images_dir),
          "--SiftExtraction.max_num_features", str(n_features),
          "--ImageReader.existing_camera_id", "-1"], log)
    _run(["colmap", "matches_importer", "--database_path", str(db),
          "--match_list_path", str(pairs)], log)
    Path(sparse_out).mkdir(parents=True, exist_ok=True)
    _run(["colmap", "point_triangulator", "--database_path", str(db),
          "--image_path", str(images_dir), "--input_path", str(sparse_in),
          "--output_path", str(sparse_out),
          "--Mapper.fix_existing_images", "1"], log)
    for _ in range(2):
        _run(["colmap", "bundle_adjuster", "--input_path", str(sparse_out),
              "--output_path", str(sparse_out),
              "--BundleAdjustment.refine_extrinsics", "0"], log)
    return log


def refine_chunk(chunk_sparse: str | Path, images_dir: str | Path,
                 workdir: str | Path, n_pairs: int = 200) -> list[str]:
    """Per-chunk triangulation + bundle adjustment, then rigid
    re-registration to the original frame (``prepare_chunk.py`` +
    ``transform_colmap.py`` semantics: the refined model is aligned back so
    chunk bounds stay valid)."""
    import numpy as np

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    db = workdir / "database.db"
    pairs = workdir / "pairs.txt"
    refined = workdir / "refined"
    log: list[str] = []

    cams, images, _ = colmap_io.read_model(chunk_sparse)
    colmap_db.fill_database(db, cams, images)
    matchers.make_distance_pairs(chunk_sparse, pairs, n_neighbors=n_pairs)

    _run(["colmap", "feature_extractor", "--database_path", str(db),
          "--image_path", str(images_dir)], log)
    _run(["colmap", "matches_importer", "--database_path", str(db),
          "--match_list_path", str(pairs)], log)
    refined.mkdir(parents=True, exist_ok=True)
    for _ in range(2):
        _run(["colmap", "point_triangulator", "--database_path", str(db),
              "--image_path", str(images_dir),
              "--input_path", str(chunk_sparse),
              "--output_path", str(refined)], log)
        _run(["colmap", "bundle_adjuster", "--input_path", str(refined),
              "--output_path", str(refined)], log)

    # Undo drift: rigid-align refined camera centers onto the originals
    # (umeyama without scale) and rewrite into the chunk dir.
    _, ref_images, ref_pts = colmap_io.read_model(refined)
    orig_c = {im.name: -colmap_io.qvec2rotmat(im.qvec).T @ im.tvec
              for im in images.values()}
    new_c = {im.name: -colmap_io.qvec2rotmat(im.qvec).T @ im.tvec
             for im in ref_images.values()}
    common = [n for n in orig_c if n in new_c]
    A = np.stack([new_c[n] for n in common])
    B = np.stack([orig_c[n] for n in common])
    mu_a, mu_b = A.mean(0), B.mean(0)
    U, _, Vt = np.linalg.svd((A - mu_a).T @ (B - mu_b))
    R = (U @ Vt).T
    if np.linalg.det(R) < 0:
        Vt[-1] *= -1
        R = (U @ Vt).T
    t = mu_b - R @ mu_a

    from .reorient import apply_transform

    # apply_transform rotates via center @ rot; wrap the affine manually.
    out_images = {}
    for k, im in ref_images.items():
        Rc = colmap_io.qvec2rotmat(im.qvec)
        center = -Rc.T @ im.tvec
        new_center = R @ center + t
        c2w = R @ Rc.T
        R_new = c2w.T
        out_images[k] = colmap_io.ColmapImage(
            im.id, colmap_io.rotmat2qvec(R_new), -R_new @ new_center,
            im.camera_id, im.name, im.xys, im.point3D_ids)
    out_pts = None
    if ref_pts is not None:
        out_pts = colmap_io.ColmapPoints(
            xyz=ref_pts.xyz @ R.T + t, rgb=ref_pts.rgb, error=ref_pts.error,
            ids=ref_pts.ids, track_image_ids=ref_pts.track_image_ids,
            track_point2d_idxs=ref_pts.track_point2d_idxs)
    colmap_io.write_model(cams, out_images, out_pts, chunk_sparse)
    return log
