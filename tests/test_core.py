"""Golden-value unit tests for the core math layer (SURVEY.md §4 item (b))."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_sparse_3dgs_tpu.core import camera, covariance, knn, quaternion, schedules, sh


def random_unit_dirs(key, n):
    d = jax.random.normal(key, (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


class TestSH:
    def test_degree0_constant(self):
        dirs = random_unit_dirs(jax.random.PRNGKey(0), 16)
        coeffs = jnp.ones((16, 1, 3))
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh.C0 * np.ones((16, 3)), rtol=1e-6)

    def test_basis_orthonormal(self):
        # Real SH with this normalization are orthonormal over the sphere:
        # ∫ Y_i Y_j dΩ = δ_ij.  Monte-Carlo check with 4π/N weights.
        n = 200_000
        dirs = random_unit_dirs(jax.random.PRNGKey(1), n)
        basis = sh.sh_basis(3, dirs)  # [n, 16]
        gram = (4.0 * math.pi / n) * basis.T @ basis
        np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=5e-2)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb,
                                   rtol=1e-6)

    def test_dc_only_color(self):
        # A Gaussian with only a DC coefficient has view-independent color.
        key = jax.random.PRNGKey(2)
        rgb = jnp.array([[0.25, 0.5, 0.75]])
        coeffs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(sh.rgb_to_sh(rgb))
        for seed in range(3):
            d = random_unit_dirs(jax.random.PRNGKey(seed), 1)
            out = sh.eval_sh(3, coeffs, d) + 0.5
            np.testing.assert_allclose(out, rgb, rtol=1e-5)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(quaternion.to_rotation_matrix(q)[0],
                                   np.eye(3), atol=1e-6)

    def test_vs_scipy(self):
        scipy = pytest.importorskip("scipy.spatial.transform")
        q = np.random.RandomState(0).randn(32, 4).astype(np.float32)
        ours = np.asarray(quaternion.to_rotation_matrix(jnp.asarray(q)))
        # scipy uses (x, y, z, w) ordering
        theirs = scipy.Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rotation_properties(self):
        q = jax.random.normal(jax.random.PRNGKey(3), (64, 4))
        R = quaternion.to_rotation_matrix(q)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)),
                                   np.asarray(eye), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0,
                                   atol=1e-5)

    def test_align_sign(self):
        q = jnp.array([[1.0, 0, 0, 0], [-0.9, 0.1, 0, 0]])
        ref = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
        out = quaternion.align_sign(q, ref)
        assert out[1, 0] > 0


class TestCovariance:
    def test_build_matches_rssr(self):
        key = jax.random.PRNGKey(4)
        s = jax.random.uniform(key, (16, 3), minval=0.1, maxval=1.0)
        q = quaternion.normalize(jax.random.normal(key, (16, 4)))
        cov = covariance.build_covariance(s, q)
        R = quaternion.to_rotation_matrix(q)
        S = jax.vmap(jnp.diag)(s)
        expected = R @ S @ S @ jnp.swapaxes(R, -1, -2)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(expected),
                                   atol=1e-5)

    def test_strip_roundtrip(self):
        key = jax.random.PRNGKey(5)
        s = jax.random.uniform(key, (8, 3), minval=0.1, maxval=1.0)
        q = jax.random.normal(key, (8, 4))
        cov = covariance.build_covariance(s, q)
        six = covariance.strip_symmetric(cov)
        np.testing.assert_allclose(np.asarray(covariance.unstrip_symmetric(six)),
                                   np.asarray(cov), atol=1e-6)

    def test_isotropic_projection(self):
        # An isotropic Gaussian of scale s at depth z on the optical axis
        # projects to a circular 2D Gaussian with variance (f·s/z)² + LOW_PASS.
        s, z, f = 0.1, 5.0, 400.0
        cov3d = jnp.eye(3)[None] * s * s
        mean_cam = jnp.array([[0.0, 0.0, z]])
        cov2d = covariance.project_cov3d(cov3d, mean_cam, f, f, 1.0, 1.0)
        expected = (f * s / z) ** 2 + covariance.LOW_PASS
        np.testing.assert_allclose(cov2d[0, 0], expected, rtol=1e-5)
        np.testing.assert_allclose(cov2d[0, 2], expected, rtol=1e-5)
        np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-6)

    def test_conic_radius(self):
        cov2d = jnp.array([[4.0, 0.0, 1.0]])  # σx=2, σy=1
        conic, radius, det = covariance.conic_and_radius(cov2d)
        np.testing.assert_allclose(np.asarray(det), 4.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(conic[0]), [0.25, 0.0, 1.0],
                                   atol=1e-6)
        assert float(radius[0]) == math.ceil(3.0 * 2.0)


class TestCamera:
    def test_projection_center(self):
        # With centered principal point, a point on the optical axis maps to
        # NDC (0, 0); with primx=0.6 it shifts accordingly.
        P = camera.projection_matrix(0.01, 100.0, math.radians(60),
                                     math.radians(45), 0.5, 0.5)
        p = P @ np.array([0.0, 0.0, 10.0, 1.0])
        np.testing.assert_allclose(p[:2] / p[3], 0.0, atol=1e-6)

        P2 = camera.projection_matrix(0.01, 100.0, math.radians(60),
                                      math.radians(45), 0.6, 0.5)
        p2 = P2 @ np.array([0.0, 0.0, 10.0, 1.0])
        # principal point at primx in [0,1] ⇒ ndc offset 2·primx − 1
        np.testing.assert_allclose(p2[0] / p2[3], 2 * 0.6 - 1.0, atol=1e-5)

    def test_focal_fov_roundtrip(self):
        f = camera.fov2focal(math.radians(70), 800)
        np.testing.assert_allclose(camera.focal2fov(f, 800), math.radians(70),
                                   rtol=1e-6)

    def test_world_to_view_identity(self):
        w2v = camera.world_to_view(np.eye(3), np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(w2v[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(w2v[:3, :3], np.eye(3), atol=1e-6)

    def test_make_camera_projects_forward(self):
        from street_sparse_3dgs_tpu.data.toy import lookat_camera
        cam = lookat_camera(np.array([3.0, 0.0, 0.0]), np.zeros(3), 64, 48)
        # The look-target is in front of the camera at depth 3.
        hom = jnp.array([0.0, 0.0, 0.0, 1.0])
        view = cam.viewmatrix @ hom
        np.testing.assert_allclose(float(view[2]), 3.0, rtol=1e-5)
        clip = cam.projmatrix @ hom
        ndc = clip[:2] / clip[3]
        np.testing.assert_allclose(np.asarray(ndc), 0.0, atol=1e-5)


class TestSchedules:
    def test_endpoints(self):
        lr = schedules.expon_lr(0, 1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(lr), 1e-2, rtol=1e-5)
        lr = schedules.expon_lr(100, 1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(lr), 1e-4, rtol=1e-5)

    def test_log_linear_midpoint(self):
        lr = schedules.expon_lr(50, 1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(lr), 1e-3, rtol=1e-4)

    def test_delay(self):
        lr0 = schedules.expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10,
                                 lr_delay_mult=0.1, max_steps=100)
        np.testing.assert_allclose(float(lr0), 1e-3, rtol=1e-4)

    def test_disabled(self):
        assert float(schedules.expon_lr(5, 0.0, 0.0)) == 0.0
        assert float(schedules.expon_lr(-1, 1e-2, 1e-4)) == 0.0


class TestKNN:
    def test_vs_bruteforce(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(300, 3).astype(np.float32)
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        expected = np.mean(np.sort(d2, axis=1)[:, :3], axis=1)
        got = np.asarray(knn.mean_sq_dist_to_3nn(
            jnp.asarray(pts)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_blocked_padding(self):
        # Exercise the multi-block path with a size that isn't a block multiple.
        rng = np.random.RandomState(1)
        pts = rng.rand(1000, 3).astype(np.float32)
        got = np.asarray(knn.knn_sq_dists(jnp.asarray(pts), k=3,
                                          query_block=256, point_block=512))
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3]
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-6)


def test_grid_knn_matches_exact():
    """Grid-hash approximate 3-NN agrees with the exact blocked KNN on a
    dense cloud (within the neighborhood radius) and upper-bounds isolated
    points."""
    import numpy as np
    from street_sparse_3dgs_tpu.core.knn import (grid_mean_sq_dist_to_3nn,
                                                 mean_sq_dist_to_3nn)

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    exact = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts)))
    approx = np.asarray(grid_mean_sq_dist_to_3nn(pts, query_chunk=512))
    # Dense cloud: 3-NN within one cell neighborhood for nearly all points.
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
    assert np.median(rel) < 1e-4
    assert (rel < 1e-3).mean() > 0.95
    # Isolated point: falls back to a bounded value, not inf.
    far = np.concatenate([pts, [[100.0, 100.0, 100.0]]]).astype(np.float32)
    a2 = np.asarray(grid_mean_sq_dist_to_3nn(far, query_chunk=512))
    assert np.isfinite(a2[-1]) and a2[-1] > 0
