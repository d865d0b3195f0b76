"""Rasterizer correctness: tiled production path vs dense oracle, forward and
gradients (SURVEY.md §4 consequence (a))."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

ORACLE = RasterConfig(method="oracle")
TILED = RasterConfig(method="tiled", max_dup=64, tile_capacity=512,
                     tiles_chunk=4)


@pytest.fixture(scope="module")
def scene():
    return make_toy_scene(seed=0, n=384, n_cameras=2, width=64, height=48)


def _render(scene, cfg, cam_idx=0):
    cam = scene.cameras[cam_idx]
    bg = jnp.array([0.1, 0.2, 0.3])
    return rasterize(scene.means3d, scene.scales, scene.quats, scene.opacities,
                     scene.sh_coeffs, cam, 3, bg, cfg)


class TestForwardParity:
    def test_image_matches_oracle(self, scene):
        for ci in range(2):
            a = _render(scene, ORACLE, ci)
            b = _render(scene, TILED, ci)
            assert int(b["dup_overflow"]) == 0
            assert int(b["tile_overflow"]) == 0
            np.testing.assert_allclose(np.asarray(a["render"]),
                                       np.asarray(b["render"]),
                                       atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(a["depth"]),
                                       np.asarray(b["depth"]),
                                       atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(a["alpha"]),
                                       np.asarray(b["alpha"]),
                                       atol=1e-5, rtol=1e-4)

    def test_nontrivial_content(self, scene):
        out = _render(scene, TILED)
        img = np.asarray(out["render"])
        assert img.shape == (3, 48, 64)
        assert img.std() > 0.01          # scene actually renders something
        assert np.asarray(out["visibility"]).sum() > 100

    def test_background_only(self, scene):
        # All gaussians behind the camera -> pure background.
        cam = scene.cameras[0]
        bg = jnp.array([0.25, 0.5, 0.75])
        far = scene.means3d + 1000.0
        out = rasterize(far, scene.scales, scene.quats, scene.opacities,
                        scene.sh_coeffs, cam, 3, bg, TILED)
        img = np.asarray(out["render"])
        expected = np.broadcast_to(np.array([0.25, 0.5, 0.75])[:, None, None],
                                   img.shape)
        np.testing.assert_allclose(img, expected, atol=1e-5)

    def test_active_mask(self, scene):
        # Masking all gaussians inactive reduces to background.
        cam = scene.cameras[0]
        bg = jnp.zeros(3)
        mask = jnp.zeros(scene.means3d.shape[0], bool)
        out = rasterize(scene.means3d, scene.scales, scene.quats,
                        scene.opacities, scene.sh_coeffs, cam, 3, bg, TILED,
                        active_mask=mask)
        np.testing.assert_allclose(np.asarray(out["render"]), 0.0, atol=1e-6)


class TestGradientParity:
    def _loss_fn(self, cfg, scene, probe):
        cam = scene.cameras[0]
        bg = jnp.array([0.1, 0.2, 0.3])

        def loss(means, scales, quats, opac, sh_coeffs, residual):
            out = rasterize(means, scales, quats, opac, sh_coeffs, cam, 3, bg,
                            cfg, mean2d_residual=residual)
            return (jnp.sum(out["render"] * probe)
                    + 0.3 * jnp.sum(out["depth"] * probe[:1]))

        return loss

    def test_grads_match_oracle(self, scene):
        probe = jax.random.normal(jax.random.PRNGKey(7), (3, 48, 64))
        residual = jnp.zeros((scene.means3d.shape[0], 2))
        args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
                scene.sh_coeffs, residual)
        g_oracle = jax.grad(self._loss_fn(ORACLE, scene, probe),
                            argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_tiled = jax.grad(self._loss_fn(TILED, scene, probe),
                           argnums=(0, 1, 2, 3, 4, 5))(*args)
        names = ["means", "scales", "quats", "opacity", "sh", "mean2d"]
        for name, a, b in zip(names, g_oracle, g_tiled):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                       err_msg=f"grad mismatch: {name}")
            assert np.abs(a).max() > 0, f"zero grads for {name}"

    def test_mean2d_residual_grad_nonzero(self, scene):
        # The screenspace-gradient trick: grads w.r.t. the residual are the
        # densification signal (reference gaussian_renderer/__init__.py:29-33).
        probe = jnp.ones((3, 48, 64))
        residual = jnp.zeros((scene.means3d.shape[0], 2))
        g = jax.grad(self._loss_fn(TILED, scene, probe), argnums=5)(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, residual)
        vis = np.asarray(_render(scene, TILED)["visibility"])
        gnorm = np.linalg.norm(np.asarray(g), axis=1)
        assert (gnorm[vis] > 0).mean() > 0.5


class TestOverflowAccounting:
    def test_tile_overflow_counted(self, scene):
        cfg = RasterConfig(method="tiled", max_dup=64, tile_capacity=8,
                           tiles_chunk=4)
        out = _render(scene, cfg)
        assert int(out["tile_overflow"]) > 0

    def test_jit_compiles(self, scene):
        cam = scene.cameras[0]
        bg = jnp.zeros(3)

        @jax.jit
        def f(means):
            return rasterize(means, scene.scales, scene.quats,
                             scene.opacities, scene.sh_coeffs, cam, 3, bg,
                             TILED)["render"]

        out = f(scene.means3d)
        assert out.shape == (3, 48, 64)


class TestKeyModes:
    """The three pair-sort key encodings (int32 packed, uint32 packed for
    32-bit keys, and the lexicographic big-scene fallback) must produce
    identical tile tables."""

    def test_key_modes_agree(self, scene):
        from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
        from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians

        proj = project_gaussians(scene.means3d, scene.scales, scene.quats,
                                 scene.opacities, scene.sh_coeffs,
                                 scene.cameras[0], 3)
        ref = bin_gaussians(proj, 48, 64, 64, 512, key_mode="packed31")
        for mode in ("packed32", "lex"):
            alt = bin_gaussians(proj, 48, 64, 64, 512, key_mode=mode)
            np.testing.assert_array_equal(np.asarray(ref.gather),
                                          np.asarray(alt.gather),
                                          err_msg=mode)
            np.testing.assert_array_equal(np.asarray(ref.mask),
                                          np.asarray(alt.mask), err_msg=mode)
            np.testing.assert_array_equal(np.asarray(ref.counts),
                                          np.asarray(alt.counts),
                                          err_msg=mode)


class TestVisCapacity:
    """Visible compaction (``RasterConfig.vis_capacity``): bin only the
    nearest V in-frustum rows (street-scale: most of N is culled per view)."""

    def test_roomy_cap_matches_uncapped(self, scene):
        n = scene.means3d.shape[0]
        cfg = dataclasses.replace(TILED, vis_capacity=n)  # cap == N
        a, b = _render(scene, TILED), _render(scene, cfg)
        assert int(b["vis_overflow"]) == 0
        np.testing.assert_allclose(np.asarray(a["render"]),
                                   np.asarray(b["render"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["depth"]),
                                   np.asarray(b["depth"]), atol=1e-6)

    def test_roomy_cap_grads_match_oracle(self, scene):
        probe = jax.random.normal(jax.random.PRNGKey(3), (3, 48, 64))
        residual = jnp.zeros((scene.means3d.shape[0], 2))
        args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
                scene.sh_coeffs, residual)
        cfg = dataclasses.replace(TILED, vis_capacity=scene.means3d.shape[0])
        g_oracle = jax.grad(TestGradientParity()._loss_fn(ORACLE, scene, probe),
                            argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_cap = jax.grad(TestGradientParity()._loss_fn(cfg, scene, probe),
                         argnums=(0, 1, 2, 3, 4, 5))(*args)
        for name, a, b in zip(["means", "scales", "quats", "opac", "sh",
                               "mean2d"], g_oracle, g_cap):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                       err_msg=f"grad mismatch: {name}")

    def test_tight_cap_drops_farthest_and_counts(self, scene):
        cfg = dataclasses.replace(TILED, vis_capacity=64)
        out = _render(scene, cfg)
        full = _render(scene, TILED)
        n_vis = int(np.asarray(full["visibility"]).sum())
        assert int(out["vis_overflow"]) == max(n_vis - 64, 0)
        img = np.asarray(out["render"])
        assert np.isfinite(img).all() and img.std() > 0.01
        # Gradients through the capped render stay finite (dropped rows get
        # exactly-zero cotangents via the padded permute_rows VJP).
        probe = jnp.ones((3, 48, 64))
        residual = jnp.zeros((scene.means3d.shape[0], 2))
        g = jax.grad(TestGradientParity()._loss_fn(cfg, scene, probe),
                     argnums=(0,))(scene.means3d, scene.scales, scene.quats,
                                   scene.opacities, scene.sh_coeffs, residual)
        assert np.isfinite(np.asarray(g[0])).all()


class TestRankTables:
    def test_gather_ranks_depth_sorted_within_tiles(self, scene):
        """The tile tables hold depth RANKS (the pair-sort key's low bits):
        within every tile segment the masked ranks must be strictly
        increasing (front-to-back blend order), in range, and consistent
        with ``order``/``rank`` being inverse permutations.  Pins the
        single-operand packed sort's rank extraction."""
        from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
        from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians

        cam = scene.cameras[0]
        proj = project_gaussians(scene.means3d, scene.scales, scene.quats,
                                 scene.opacities, scene.sh_coeffs, cam, 3,
                                 1.0, None)
        bins = bin_gaussians(proj, cam.height, cam.width, max_dup=64,
                             tile_capacity=512)
        n = scene.means3d.shape[0]
        order = np.asarray(bins.order)
        rank = np.asarray(bins.rank)
        assert (order[rank] == np.arange(n)).all()
        assert (rank[order] == np.arange(n)).all()
        g = np.asarray(bins.gather)
        m = np.asarray(bins.mask)
        assert ((g[m] >= 0) & (g[m] < n)).all()
        # Masked (padding) slots carry the sentinel rank n: they sort past
        # every real segment in the id-keyed backward reductions.
        assert (g[~m] == n).all()
        seen_any = False
        for t in range(g.shape[0]):
            r = g[t][m[t]]
            if r.size > 1:
                seen_any = True
                assert (np.diff(r) > 0).all(), t
        assert seen_any
        # Masked ranks must reference a gaussian the depth sort kept in
        # front of the culled (depth=inf) block.
        n_valid = int(np.asarray(proj.valid).sum())
        assert (g[m] < n_valid).all()


class TestSlabGather:
    def test_pallas_slab_gather_matches_slices(self):
        """The TPU slab-DMA gather table builder (interpret mode here) must
        equal the vmapped dynamic_slice reference used off-TPU."""
        from street_sparse_3dgs_tpu.ops.binning import _slab_gather

        rng = np.random.default_rng(7)
        n, t, k = 5000, 13, 256
        vals = jnp.asarray(rng.integers(0, 999, (n,), dtype=np.int32))
        starts = jnp.sort(
            jnp.asarray(rng.integers(0, n, (t,), dtype=np.int32)))
        got = np.asarray(_slab_gather(vals, starts, k, True))
        padded = np.concatenate([np.asarray(vals), np.zeros(k + 1024, np.int32)])
        want = np.stack([padded[int(s):int(s) + k] for s in np.asarray(starts)])
        np.testing.assert_array_equal(got, want)


class TestEllipseCulling:
    def test_overscan_recovers_diagonal_tiles(self):
        """A long thin 45°-rotated gaussian covers an R×R tile rect but only
        ~R real tiles along the diagonal.  With rect-order enumeration
        capped at max_dup the far diagonal tiles are lost; the ellipse
        culling + overscan compaction must recover them (ref: the CUDA
        rasterizer banks the full rect — this is strictly better)."""
        from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
        from street_sparse_3dgs_tpu.ops.preprocess import Projected

        n = 8
        h = w = 128                                   # 8x8 tile grid
        # one diagonal gaussian through the full image, 7 inactive rows
        mean2d = np.full((n, 2), -100.0, np.float32)
        mean2d[0] = (64.0, 64.0)
        sigma_major, sigma_minor = 64.0, 2.0
        # conic of a gaussian elongated along (1,1)/sqrt(2)
        u = np.array([1.0, 1.0]) / np.sqrt(2)
        v = np.array([-1.0, 1.0]) / np.sqrt(2)
        cov = (sigma_major**2 * np.outer(u, u)
               + sigma_minor**2 * np.outer(v, v))
        ic = np.linalg.inv(cov)
        conic = np.zeros((n, 3), np.float32)
        conic[0] = (ic[0, 0], ic[0, 1], ic[1, 1])
        radius = np.zeros(n, np.float32)
        radius[0] = 3.0 * sigma_major                # rect = whole grid
        valid = np.zeros(n, bool)
        valid[0] = True
        proj = Projected(
            mean2d=jnp.asarray(mean2d), depth=jnp.asarray(
                np.where(valid, 1.0, np.inf).astype(np.float32)),
            inv_depth=jnp.asarray(valid.astype(np.float32)),
            conic=jnp.asarray(conic), radius=jnp.asarray(radius),
            color=jnp.zeros((n, 3)), opacity=jnp.asarray(
                valid.astype(np.float32) * 0.9),
            valid=jnp.asarray(valid))

        bins = bin_gaussians(proj, h, w, max_dup=32, tile_capacity=32)
        g = np.asarray(bins.gather)
        m = np.asarray(bins.mask)
        covered = {t for t in range(g.shape[0])
                   if (m[t] & (g[t] == 0)).any()}
        rows = {t // 8 for t in covered}
        cols = {t % 8 for t in covered}
        # The diagonal spans all 8 tile rows/cols; plain rect-order
        # enumeration at max_dup=32 would stop after rect rows 0-3 (the
        # first 32 of 64 positions), losing the lower half of the streak.
        assert len(rows) == 8 and len(cols) == 8, (rows, cols)
        assert int(bins.dup_overflow) == 0
        # and the dead corners are NOT banked
        assert (0, 7) not in {(t // 8, t % 8) for t in covered}
        assert (7, 0) not in {(t // 8, t % 8) for t in covered}

    def test_tail_buckets_keep_big_gaussian_tiles(self):
        """A fat isotropic gaussian whose ellipse SURVIVES in more tiles
        than max_dup must still bank every tile: the tail buckets emit the
        compacted tiles beyond max_dup through the extra pair lists instead
        of dropping whole visible tiles (the round-2 scheme lost them —
        0.074 mean image error at the bench scene)."""
        from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
        from street_sparse_3dgs_tpu.ops.preprocess import Projected

        n = 8
        h = w = 128                                   # 8x8 tile grid
        mean2d = np.full((n, 2), -100.0, np.float32)
        mean2d[0] = (64.0, 64.0)
        sigma = 48.0                                  # fat: covers all tiles
        conic = np.zeros((n, 3), np.float32)
        conic[0] = (1.0 / sigma**2, 0.0, 1.0 / sigma**2)
        radius = np.zeros(n, np.float32)
        radius[0] = 3.0 * sigma
        valid = np.zeros(n, bool)
        valid[0] = True
        proj = Projected(
            mean2d=jnp.asarray(mean2d), depth=jnp.asarray(
                np.where(valid, 1.0, np.inf).astype(np.float32)),
            inv_depth=jnp.asarray(valid.astype(np.float32)),
            conic=jnp.asarray(conic), radius=jnp.asarray(radius),
            color=jnp.zeros((n, 3)), opacity=jnp.asarray(
                valid.astype(np.float32) * 0.9),
            valid=jnp.asarray(valid))

        # max_dup=16 << 64 surviving tiles; the tail bucket must recover
        # the rest (the 4x overscan window allows up to 64 positions).
        bins = bin_gaussians(proj, h, w, max_dup=16, tile_capacity=64,
                             dup_tails=((8, 48),))
        m = np.asarray(bins.mask)
        g = np.asarray(bins.gather)
        covered = {t for t in range(g.shape[0])
                   if (m[t] & (g[t] == 0)).any()}
        assert len(covered) == 64, len(covered)
        assert int(bins.dup_overflow) == 0
        # Without tails the same call must COUNT the loss instead.
        bins0 = bin_gaussians(proj, h, w, max_dup=16, tile_capacity=64,
                              dup_tails=())
        assert int(bins0.dup_overflow) == 64 - 16

    def test_big_gaussian_image_matches_oracle_at_small_max_dup(self):
        """End-to-end: with max_dup far below real tile coverage, the tail
        buckets must keep the tiled image equal to the oracle's."""
        scene = make_toy_scene(seed=3, n=64, n_cameras=1, width=96,
                               height=96)
        fat = scene._replace(scales=scene.scales * 4.0)
        bg = jnp.array([0.1, 0.2, 0.3])
        a = rasterize(fat.means3d, fat.scales, fat.quats, fat.opacities,
                      fat.sh_coeffs, fat.cameras[0], 3, bg, ORACLE)
        cfg = RasterConfig(method="tiled", max_dup=16, tile_capacity=128)
        b = rasterize(fat.means3d, fat.scales, fat.quats, fat.opacities,
                      fat.sh_coeffs, fat.cameras[0], 3, bg, cfg)
        assert int(b["dup_overflow"]) == 0
        np.testing.assert_allclose(np.asarray(a["render"]),
                                   np.asarray(b["render"]),
                                   atol=1e-5, rtol=1e-4)


class TestPermuteRowsSortPath:
    """The ≥PERMUTE_SORT_MIN_ROWS forward permute runs as an inverse-keyed
    multi-operand sort instead of a row gather (ADVICE r4: the threshold is
    far above every CPU fixture, so exercise the sort path by lowering it)."""

    def _case(self, monkeypatch, compact):
        from street_sparse_3dgs_tpu.ops import binning

        monkeypatch.setattr(binning, "PERMUTE_SORT_MIN_ROWS", 8)
        rng = np.random.default_rng(0)
        n, v, c = 64, 48, 10
        x = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        perm = rng.permutation(n).astype(np.int32)
        if compact:
            # Visible-compaction contract: order is a SLICE of a permutation
            # and excluded rows carry inv_order == len(order).
            order = jnp.asarray(perm[:v])
            inv = np.full((n,), v, np.int32)
            inv[perm[:v]] = np.arange(v)
            inv_order = jnp.asarray(inv)
        else:
            order = jnp.asarray(perm)
            inv = np.empty((n,), np.int32)
            inv[perm] = np.arange(n)
            inv_order = jnp.asarray(inv)
        return x, order, inv_order

    @pytest.mark.parametrize("compact", [False, True])
    def test_matches_gather_and_vjp(self, monkeypatch, compact):
        from street_sparse_3dgs_tpu.ops import binning

        x, order, inv_order = self._case(monkeypatch, compact)
        assert x.shape[0] >= binning.PERMUTE_SORT_MIN_ROWS  # sort path on

        out = binning.permute_rows(x, order, inv_order)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x[order]))

        # VJP parity against the plain-gather definition.
        cot = jnp.asarray(np.random.default_rng(1).normal(
            size=out.shape), jnp.float32)
        _, vjp = jax.vjp(lambda a: binning.permute_rows(a, order, inv_order),
                         x)
        (gx,) = vjp(cot)
        _, vjp_ref = jax.vjp(lambda a: a[order], x)
        (gx_ref,) = vjp_ref(cot)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-6, atol=1e-6)


def test_sampled_searchsorted_matches_searchsorted():
    """The two-level slab-DMA boundary search (used on TPU past
    SAMPLED_SEARCH_MIN_ROWS) must equal jnp.searchsorted(side='left'),
    including duplicate values, probes at/past both ends, and the
    non-multiple-of-block tail."""
    from street_sparse_3dgs_tpu.ops.binning import _sampled_searchsorted

    rng = np.random.default_rng(0)
    vals = np.sort(rng.integers(0, 5000, size=5003).astype(np.int32))
    probes = np.concatenate([
        np.arange(0, 5200, 97, dtype=np.int32), [0, 4999, 5000, 6000],
        vals[::701]]).astype(np.int32)
    got = _sampled_searchsorted(jnp.asarray(vals), jnp.asarray(probes),
                                interpret=True, block=256)
    want = np.searchsorted(vals, probes, side="left")
    np.testing.assert_array_equal(np.asarray(got), want)
