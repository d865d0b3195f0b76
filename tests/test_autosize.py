"""Self-sizing, gradient-safe exact mode (VERDICT r4 item 2).

The reference rasterizer needs no per-scene capacity tuning (dynamic pair
ranges, ``gaussian_renderer/__init__.py:105-113``); the static-shape
equivalent here is: knobs derived from measured binning statistics
(``ops/autosize.py``), an in-step guard that reverts any counts-mode update
whose window budget overflowed, and loop-level budget growth (re-jit) — so
a fresh scene trains with zero hand-set exact knobs and zero
corrupted-gradient steps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_sparse_3dgs_tpu.config import (OptimizationConfig,
                                           PipelineConfig, parse_tails)
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
from street_sparse_3dgs_tpu.ops.autosize import autosize_raster
from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.train.loop import train_loop
from street_sparse_3dgs_tpu.train.step import (CameraBatch, init_state,
                                               make_train_step)

W, H = 64, 48


@pytest.fixture(scope="module")
def scene():
    return make_toy_scene(seed=0, n=384, n_cameras=3, width=W, height=H)


def _knobs(scene, k_cap=128):
    return autosize_raster(
        scene.means3d, scene.scales, scene.quats, scene.opacities,
        scene.sh_coeffs, list(scene.cameras), 3, H, W, k_cap, max_dup=0,
        probe_rows=256, probe_scan=256)


class TestAutosize:
    def test_knobs_bind_every_view_clean(self, scene):
        knobs = _knobs(scene)
        assert knobs.exact_extra > 0 and knobs.exact_extra % 128 == 0
        assert knobs.max_dup in (2, 4, 8, 16)
        for cam in scene.cameras:
            proj = project_gaussians(scene.means3d, scene.scales, scene.quats,
                                     scene.opacities, scene.sh_coeffs, cam, 3)
            bins = bin_gaussians(proj, H, W, knobs.max_dup, 128,
                                 dup_tails=knobs.dup_tails,
                                 dup_overscan=knobs.dup_overscan,
                                 exact_extra=knobs.exact_extra)
            assert int(bins.tile_overflow) == 0
            assert int(bins.dup_overflow) <= knobs.expected_dup_overflow

    def test_autosized_render_matches_oracle(self, scene):
        knobs = _knobs(scene)
        bg = jnp.array([0.1, 0.2, 0.3])
        cam = scene.cameras[0]
        args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
                scene.sh_coeffs, cam, 3, bg)
        a = rasterize(*args, RasterConfig(method="oracle"))
        cfg = RasterConfig(method="pallas", max_dup=knobs.max_dup,
                           tile_capacity=128, exact_extra=knobs.exact_extra,
                           dup_overscan=knobs.dup_overscan,
                           dup_tails=knobs.dup_tails)
        b = rasterize(*args, cfg)
        np.testing.assert_allclose(np.asarray(a["render"]),
                                   np.asarray(b["render"]),
                                   atol=5e-3, rtol=1e-3)

    def test_parse_tails_round_trip(self):
        t = ((262144, 6), (16384, 24))
        assert parse_tails("262144:6,16384:24") == t
        assert parse_tails([[262144, 6], [16384, 24]]) == t
        assert parse_tails("") == ()
        assert parse_tails(t) == t


def _model_and_batches(scene, capacity=512):
    key = jax.random.PRNGKey(0)
    pts = np.asarray(scene.means3d)
    cols = np.clip(np.asarray(scene.sh_coeffs[:, 0, :]) * 0.28 + 0.5, 0, 1)
    params, active, meta = create_from_pcd(key, pts, cols, sh_degree=3,
                                           capacity=capacity)
    gts = []
    for cam in scene.cameras:
        out = rasterize(scene.means3d, scene.scales, scene.quats,
                        scene.opacities, scene.sh_coeffs, cam, 3,
                        jnp.zeros(3), RasterConfig(method="tiled",
                                                   tile_capacity=600))
        gts.append(jnp.clip(out["render"], 0.0, 1.0))
    batches = [CameraBatch(camera=cam, gt_image=gt,
                           alpha_mask=jnp.ones((1, H, W)),
                           mono_invdepth=jnp.zeros((1, H, W)),
                           depth_mask=jnp.zeros((1, H, W)),
                           depth_reliable=jnp.array(False),
                           image_index=jnp.int32(i))
               for i, (cam, gt) in enumerate(zip(scene.cameras, gts))]
    return params, active, meta, batches


class TestOverflowGuard:
    def test_step_reverts_update_on_window_overflow(self, scene):
        """counts-mode step with a deliberately starved window budget: the
        overflow fires and the update must REVERT (identical params/adam,
        advanced step counter) — corrupted gradients are never applied."""
        params, active, meta, batches = _model_and_batches(scene)
        pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                              max_dup=32, exact_extra=1,
                              grad_reduce="counts")
        opt = OptimizationConfig(iterations=10)
        state = init_state(params, active, n_images=len(batches))
        step = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                               sh_degree_schedule=False)
        new_state, aux = step(state, batches[0])
        assert int(aux["tile_overflow"]) > 0, \
            "fixture no longer forces window overflow"
        assert int(aux["update_skipped"]) == 1
        assert int(new_state.step) == 1
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(new_state.adam_state.mu.xyz),
            np.asarray(state.adam_state.mu.xyz))

    def test_loop_grows_budget_until_clean(self, scene):
        """train_loop with the starved budget must grow exact_extra (re-jit)
        and resume real updates — and never have applied a corrupted one."""
        params, active, meta, batches = _model_and_batches(scene)
        pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                              max_dup=32, exact_extra=1,
                              grad_reduce="counts")
        opt = OptimizationConfig(iterations=8, position_lr_init=2e-4,
                                 position_lr_final=2e-6)
        from street_sparse_3dgs_tpu.config import ModelConfig

        state = init_state(params, active, n_images=len(batches))
        x0 = np.asarray(state.params.features_dc).copy()
        state, meta, stats = train_loop(
            state, meta, batches, opt, pipe, ModelConfig(),
            cameras_extent=2.0, spatial_lr_scale=1.0, iterations=8,
            densify_enabled=False)
        assert stats["exact_growths"] >= 1
        assert stats["skipped_updates"] >= 1
        assert stats["final_pipe"].exact_extra > 1
        # After growth, updates apply again.
        assert np.abs(np.asarray(state.params.features_dc) - x0).max() > 0

    def test_loop_autosizes_from_sentinel(self, scene):
        """exact_extra == -1 resolves to measured knobs before the first
        step; the run binds clean (no overflow, no skipped updates)."""
        params, active, meta, batches = _model_and_batches(scene)
        pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                              exact_extra=-1, grad_reduce="counts")
        opt = OptimizationConfig(iterations=4, position_lr_init=2e-4,
                                 position_lr_final=2e-6)
        from street_sparse_3dgs_tpu.config import ModelConfig

        state = init_state(params, active, n_images=len(batches))
        state, meta, stats = train_loop(
            state, meta, batches, opt, pipe, ModelConfig(),
            cameras_extent=2.0, spatial_lr_scale=1.0, iterations=4,
            densify_enabled=False)
        assert stats["final_pipe"].exact_extra > 0
        assert stats["tile_overflow"] == 0
        assert stats["skipped_updates"] == 0
