"""Scene reorientation + metric rescale — ``preprocess/auto_reorient.py`` /
``transform_colmap.py`` equivalents.

``auto_reorient``: least-squares ground-plane fit of the camera centers →
rotation bringing the plane normal to +z (``:20-41,118-141``); metric scale
from the median camera-to-point distance vs ``target_med_dist`` (default
20 m, ``:95-110``).  ``apply_transform`` is the shared rigid+scale model
re-registration (``rotate_camera`` semantics: C2W center is rotated/scaled,
the camera rotation is left-composed with the inverse rotation).
"""

from __future__ import annotations

import numpy as np

from ..data import colmap


def fit_plane(points: np.ndarray):
    """LSQ plane z = a·x + b·y + c → (unit normal, centroid)."""
    A = np.c_[points[:, 0], points[:, 1], np.ones(len(points))]
    (a, b, _), *_ = np.linalg.lstsq(A, points[:, 2], rcond=None)
    n = np.array([a, b, -1.0])
    n /= np.linalg.norm(n)
    if n[2] < 0:
        n = -n
    return n, points.mean(axis=0)


def rotation_to_z_up(normal: np.ndarray) -> np.ndarray:
    """Rotation matrix mapping ``normal`` to +z (Rodrigues)."""
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(normal, z)
    s = np.linalg.norm(v)
    c = float(normal @ z)
    if s < 1e-12:
        return np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))


def median_cam_point_distance(images: dict, pts: colmap.ColmapPoints):
    id_to_row = {int(p): r for r, p in enumerate(pts.ids)}
    dists = []
    for im in images.values():
        c = -colmap.qvec2rotmat(im.qvec).T @ im.tvec
        rows = [id_to_row[int(p)] for p in im.point3D_ids
                if p >= 0 and int(p) in id_to_row]
        if rows:
            dists.append(np.linalg.norm(pts.xyz[rows] - c, axis=1))
    if not dists:
        return 1.0
    return float(np.median(np.concatenate(dists)))


def apply_transform(images: dict, pts: colmap.ColmapPoints | None,
                    rot: np.ndarray, scale: float = 1.0):
    """Rigid-rotate + scale the whole model (reference ``rotate_camera``:
    new_center = scale · (centerᵀ rot); cam rotation ← rot⁻¹ · R_c2w)."""
    new_images = {}
    for k, im in images.items():
        R = colmap.qvec2rotmat(im.qvec)
        c2w_rot = R.T
        center = -R.T @ im.tvec
        new_center = scale * (center @ rot)
        new_rot_c2w = np.linalg.inv(rot) @ c2w_rot
        R_new = new_rot_c2w.T
        t_new = -R_new @ new_center
        new_images[k] = colmap.ColmapImage(
            im.id, colmap.rotmat2qvec(R_new), t_new, im.camera_id, im.name,
            im.xys, im.point3D_ids)
    new_pts = None
    if pts is not None:
        new_pts = colmap.ColmapPoints(
            xyz=scale * (pts.xyz @ rot), rgb=pts.rgb, error=pts.error,
            ids=pts.ids, track_image_ids=pts.track_image_ids,
            track_point2d_idxs=pts.track_point2d_idxs)
    return new_images, new_pts


def auto_reorient(input_sparse, output_sparse, target_med_dist: float = 20.0,
                  upscale: float = 0.0):
    """Read a model, align the camera ground plane to z-up and rescale so the
    median camera-to-point distance equals ``target_med_dist``."""
    cams, images, pts = colmap.read_model(input_sparse)
    if upscale == 0.0 and pts is not None:
        med = median_cam_point_distance(images, pts)
        upscale = target_med_dist / max(med, 1e-9)
    elif upscale == 0.0:
        upscale = 1.0
    centers = np.stack([
        -colmap.qvec2rotmat(im.qvec).T @ im.tvec for im in images.values()])
    normal, _ = fit_plane(centers)
    rot = rotation_to_z_up(normal).T   # applied as center @ rot
    new_images, new_pts = apply_transform(images, pts, rot, upscale)
    colmap.write_model(cams, new_images, new_pts, output_sparse)
    return rot, upscale
