"""End-to-end training-slice tests: model init → jitted step → densify.

This is the minimum viable slice of SURVEY.md §7.2: init from a toy point
cloud, optimize with the sparse-Adam step against oracle-rendered ground
truth, and verify PSNR improves; densify/prune and opacity reset run at their
cadence without shape errors; capacity growth re-jits cleanly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_sparse_3dgs_tpu.config import (ModelConfig, OptimizationConfig,
                                           PipelineConfig)
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.models import adam, densify
from street_sparse_3dgs_tpu.models.gaussians import (
    GaussianMeta, GaussianParams, create_from_pcd, pad_to_capacity)
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.train import losses
from street_sparse_3dgs_tpu.train.loop import grow_capacity, train_loop
from street_sparse_3dgs_tpu.train.step import (CameraBatch, init_state,
                                               make_train_step)

W = H = 64


def render_gt(scene, cam):
    out = rasterize(scene.means3d, scene.scales, scene.quats, scene.opacities,
                    scene.sh_coeffs, cam, 3, jnp.zeros(3),
                    RasterConfig(method="tiled", tile_capacity=600))
    return jnp.clip(out["render"], 0.0, 1.0)


@pytest.fixture(scope="module")
def toy():
    scene = make_toy_scene(seed=3, n=300, n_cameras=4, width=W, height=H)
    gts = [render_gt(scene, c) for c in scene.cameras]
    return scene, gts


def make_batches(scene, gts):
    batches = []
    for i, (cam, gt) in enumerate(zip(scene.cameras, gts)):
        batches.append(CameraBatch(
            camera=cam, gt_image=gt,
            alpha_mask=jnp.ones((1, H, W)),
            mono_invdepth=jnp.zeros((1, H, W)),
            depth_mask=jnp.zeros((1, H, W)),
            depth_reliable=jnp.array(False),
            image_index=jnp.int32(i)))
    return batches


def init_model(scene, capacity=512, seed=0):
    key = jax.random.PRNGKey(seed)
    # Init from perturbed GT positions with mean colors — a realistic SfM-like
    # starting point for which the GT images are an achievable optimum.
    pts = np.asarray(scene.means3d) + 0.02 * np.asarray(
        jax.random.normal(key, scene.means3d.shape))
    cols = np.clip(np.asarray(scene.sh_coeffs[:, 0, :]) * 0.28 + 0.5, 0, 1)
    params, active, meta = create_from_pcd(
        key, pts, cols, sh_degree=3, capacity=capacity)
    return params, active, meta


def test_train_step_improves_psnr(toy):
    scene, gts = toy
    params, active, meta = init_model(scene)
    opt = OptimizationConfig(iterations=200, position_lr_init=2e-4,
                             position_lr_final=2e-6)
    pipe = PipelineConfig(tile_capacity=600)
    state = init_state(params, active, n_images=len(gts))
    step = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                           sh_degree_schedule=False)
    batches = make_batches(scene, gts)

    def psnr_now(state):
        cfg = RasterConfig(tile_capacity=600)
        from street_sparse_3dgs_tpu.models.gaussians import (
            activate_opacity, activate_scales, sh_coeffs)
        vals = []
        for cam, gt in zip(scene.cameras, gts):
            out = rasterize(state.params.xyz, activate_scales(state.params),
                            state.params.quats,
                            activate_opacity(state.params, meta),
                            sh_coeffs(state.params), cam, 3, jnp.zeros(3),
                            cfg, active_mask=state.active)
            vals.append(float(losses.psnr(jnp.clip(out["render"], 0, 1), gt)))
        return sum(vals) / len(vals)

    before = psnr_now(state)
    for it in range(120):
        state, aux = step(state, batches[it % len(batches)])
        assert np.isfinite(float(aux["loss"]))
    after = psnr_now(state)
    assert after > before + 1.0, (before, after)
    # Exposure stays near identity early in training (delayed lr).
    assert float(jnp.abs(state.exposure[0] - jnp.eye(3, 4)).max()) < 0.05


def test_sparse_adam_untouched_rows_frozen(toy):
    scene, gts = toy
    params, active, meta = init_model(scene)
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=600)
    state = init_state(params, active, n_images=len(gts))
    step = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                           sh_degree_schedule=False)
    state2, _ = step(state, make_batches(scene, gts)[0])
    # Inactive padding rows must be bit-identical after a step.
    pad = ~np.asarray(state.active)
    assert pad.sum() > 0
    for a, b in zip(state.params, state2.params):
        np.testing.assert_array_equal(np.asarray(a)[pad], np.asarray(b)[pad])
    # Their moments too (OurAdam semantics: untouched rows do not decay).
    for a, b in zip(state.adam_state.mu, state2.adam_state.mu):
        np.testing.assert_array_equal(np.asarray(a)[pad], np.asarray(b)[pad])


def test_densify_and_prune_static_shapes(toy):
    scene, gts = toy
    params, active, meta = init_model(scene, capacity=400)
    state_d = densify.init(400)
    astate = adam.init(params)
    # Fake stats that force some clones and splits.
    key = jax.random.PRNGKey(1)
    grad = jnp.where(jnp.arange(400) % 7 == 0, 1.0, 0.0)
    radii = jnp.full((400,), 5.0)
    state_d = densify.DensifyState(grad, jnp.ones(400), radii)
    res = densify.densify_and_prune(
        key, params, active, astate, state_d, meta,
        grad_threshold=0.01, min_opacity=0.005, extent=1.0,
        percent_dense=0.05)
    assert res.params.xyz.shape == (400, 3)
    n0 = int(jnp.sum(active))
    assert int(res.n_active) >= n0  # clones/splits net-added (opacity .01<0.15
    # means gate fails → but opacity>0.15 gate excludes all? init opacity=0.01)
    assert int(res.overflow) == 0


def test_densify_gate_and_split_semantics():
    # Construct a controlled model: 4 active rows, opacity 0.5.
    key = jax.random.PRNGKey(0)
    n, cap = 4, 16
    params = GaussianParams(
        xyz=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
        features_dc=jnp.zeros((n, 1, 3)), features_rest=jnp.zeros((n, 15, 3)),
        log_scales=jnp.log(jnp.array([[.01] * 3, [.01] * 3, [1.] * 3,
                                      [1.] * 3])),
        quats=jnp.tile(jnp.array([1., 0, 0, 0]), (n, 1)),
        opacity_raw=jnp.full((n, 1), 0.0),  # sigmoid -> 0.5
    )
    params, active = pad_to_capacity(params, n, cap)
    meta = GaussianMeta(sh_degree=3, capacity=cap)
    dstate = densify.DensifyState(
        grad_accum=jnp.array([1., 0., 1., 0.] + [0.] * (cap - n)),
        denom=jnp.ones(cap), max_radii2d=jnp.full((cap,), 10.0))
    res = densify.densify_and_prune(
        key, params, active, adam.init(params), dstate, meta,
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01)
    # Row 0: small scale (0.01 <= 0.1) + grad -> cloned (stays + copy).
    # Row 2: big scale (1.0 > 0.1) + grad -> split (removed + 2 children).
    # Rows 1,3: no grad -> untouched. Total active: 4 - 1 + 1 + 2 = 6.
    assert int(res.n_active) == 6
    assert bool(res.active[0]) and bool(res.active[1]) and bool(res.active[3])
    # The split parent's slot (row 2) is reused by the first new row (the
    # clone of row 0) — free slots are filled lowest-index first.
    assert bool(res.active[2])
    np.testing.assert_allclose(np.asarray(res.params.xyz[2]),
                               np.asarray(params.xyz[0]), rtol=1e-6)
    # Split children land in the next free slots (4, 5) with scales ÷ 1.6.
    assert bool(res.active[4]) and bool(res.active[5])
    for r in (4, 5):
        np.testing.assert_allclose(
            np.exp(np.asarray(res.params.log_scales[r])), 1.0 / 1.6,
            rtol=1e-5)
    assert not bool(res.active[6])


def test_capacity_growth_preserves_state(toy):
    scene, gts = toy
    params, active, meta = init_model(scene, capacity=320)
    state = init_state(params, active, n_images=len(gts))
    state2, meta2 = grow_capacity(state, meta, 640)
    assert meta2.capacity == 640
    assert state2.params.xyz.shape == (640, 3)
    assert int(jnp.sum(state2.active)) == int(jnp.sum(state.active))
    np.testing.assert_array_equal(np.asarray(state2.params.xyz[:320]),
                                  np.asarray(state.params.xyz))


def test_train_loop_with_densify(toy):
    scene, gts = toy
    params, active, meta = init_model(scene, capacity=400)
    opt = OptimizationConfig(
        iterations=40, densification_interval=10, densify_from_iter=5,
        densify_until_iter=35, opacity_reset_interval=1000,
        position_lr_init=2e-4, position_lr_final=2e-6,
        densify_grad_threshold=1e-4)
    pipe = PipelineConfig(tile_capacity=600)
    state = init_state(params, active, n_images=len(gts))
    state, meta, stats = train_loop(
        state, meta, make_batches(scene, gts), opt, pipe, ModelConfig(),
        cameras_extent=3.0, spatial_lr_scale=1.0, clamp_fraction=1.0)
    assert len(stats["losses"]) == 40
    assert np.isfinite(stats["losses"]).all()
    assert len(stats["n_active"]) == 3  # densified at 10, 20, 30


def test_gt_constraint_prunes_far_points():
    """compare_points_to_gt semantics: active rows inside the GT x/y bounds
    with no GT point within the threshold are pruned; near rows and rows
    outside the bounds survive."""
    import numpy as np
    from street_sparse_3dgs_tpu.models import gt_constraint

    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    index = gt_constraint.build_index(gt, threshold=0.3)

    near = gt[:10] + 0.01            # within threshold of a GT point
    far = np.full((5, 3), 0.0, np.float32)
    far[:, 2] = 50.0                 # inside x/y bounds but far in z
    outside = np.full((5, 3), 10.0, np.float32)   # outside x/y bounds
    xyz = jnp.asarray(np.concatenate([near, far, outside]))
    active = jnp.ones(20, bool)
    mask = gt_constraint.too_far_mask(index, xyz, active, chunk=8)
    m = np.asarray(mask)
    assert not m[:10].any()          # near points kept
    assert m[10:15].all()            # far-in-bounds pruned
    assert not m[15:].any()          # outside bounds untouched

    # Integration with densify: far rows deactivate, clones of far rows do
    # not appear.
    from street_sparse_3dgs_tpu.models import adam, densify
    from street_sparse_3dgs_tpu.models.gaussians import GaussianMeta

    cap = 32
    params = GaussianParams(
        xyz=jnp.zeros((cap, 3)).at[:20].set(xyz),
        features_dc=jnp.zeros((cap, 1, 3)),
        features_rest=jnp.zeros((cap, 15, 3)),
        log_scales=jnp.full((cap, 3), -3.0),
        quats=jnp.zeros((cap, 4)).at[:, 0].set(1.0),
        opacity_raw=jnp.full((cap, 1), 2.0))   # opacity ~0.88
    active_full = jnp.arange(cap) < 20
    meta = GaussianMeta(sh_degree=3, capacity=cap)
    dstate = densify.DensifyState(jnp.ones(cap), jnp.ones(cap),
                                  jnp.full((cap,), 10.0))
    extra = jnp.zeros(cap, bool).at[:20].set(mask)
    res = densify.densify_and_prune(
        jax.random.PRNGKey(0), params, active_full, adam.init(params),
        dstate, meta, grad_threshold=0.01, min_opacity=0.005, extent=100.0,
        percent_dense=0.01, extra_prune=extra)
    # 15 surviving originals, each cloned (gate passes) -> 30 active.
    assert int(res.n_active) == 30
    # No surviving row sits at a far position (neither original nor clone).
    live_xyz = np.asarray(res.params.xyz)[np.asarray(res.active)]
    for f in far:
        assert not np.any(np.all(np.abs(live_xyz - f) < 1e-5, axis=-1))


def test_random_background_per_step(toy):
    """The reference draws bg = rand(3) every iteration (train_single.py:74);
    our step draws it in-program from the step counter.  Check: bg differs
    across steps, stays in [0,1), lands on bg-only pixels, and the fixed
    white/black variants honor white_background."""
    scene, gts = toy
    params, active, meta = init_model(scene)
    opt = OptimizationConfig(iterations=50)
    pipe = PipelineConfig(tile_capacity=600)
    state = init_state(params, active, n_images=len(gts))
    batches = make_batches(scene, gts)

    step = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                           random_background=True, use_trained_exp=False)
    s1, aux1 = step(state, batches[0])
    s2, aux2 = step(s1, batches[0])
    bg1, bg2 = np.asarray(aux1["bg"]), np.asarray(aux2["bg"])
    assert not np.allclose(bg1, bg2)
    for bg in (bg1, bg2):
        assert (bg >= 0.0).all() and (bg < 1.0).all()
    # Where nothing renders (alpha==0) the image equals the background.
    cfg = RasterConfig(tile_capacity=600)
    out = rasterize(state.params.xyz,
                    jnp.exp(state.params.log_scales), state.params.quats,
                    jax.nn.sigmoid(state.params.opacity_raw[:, 0]),
                    jnp.concatenate([state.params.features_dc,
                                     state.params.features_rest], axis=1),
                    scene.cameras[0], 3, jnp.asarray(bg1), cfg,
                    active_mask=state.active)
    empty = np.asarray(out["alpha"]) < 1e-6
    if empty.any():
        img = np.asarray(out["render"])
        for c in range(3):
            np.testing.assert_allclose(img[c][empty], bg1[c], atol=1e-5)

    step_w = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                             random_background=False, white_background=True,
                             use_trained_exp=False)
    _, aux_w = step_w(state, batches[0])
    np.testing.assert_allclose(np.asarray(aux_w["bg"]), 1.0)
    step_b = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                             random_background=False, white_background=False,
                             use_trained_exp=False)
    _, aux_b = step_b(state, batches[0])
    np.testing.assert_allclose(np.asarray(aux_b["bg"]), 0.0)


def test_pallas_path_training_improves():
    """Train THROUGH the Pallas kernels (interpret off-TPU) and require the
    loss to drop substantially.  Guards the kernel fwd/bwd consistency the
    per-step parity gates cannot see compounding over optimization — the
    round-2 cross-block-termination bug passed every parity test yet
    stalled training exactly like this test would have caught."""
    import numpy as np

    from street_sparse_3dgs_tpu.config import (OptimizationConfig,
                                               PipelineConfig)
    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
    from street_sparse_3dgs_tpu.train.step import (CameraBatch, init_state,
                                                   make_train_step)

    RES = 64
    scene = make_toy_scene(seed=2, n=200, n_cameras=3, width=RES, height=RES)
    gts = [rasterize(scene.means3d, scene.scales, scene.quats,
                     scene.opacities, scene.sh_coeffs, c, 3, jnp.zeros(3),
                     RasterConfig(method="oracle"))["render"]
           for c in scene.cameras]
    key = jax.random.PRNGKey(0)
    pts = np.asarray(scene.means3d) + 0.02 * np.asarray(
        jax.random.normal(key, scene.means3d.shape))
    params, active, meta = create_from_pcd(
        key, pts, np.full((200, 3), 0.5), capacity=256)
    batches = [CameraBatch(camera=c, gt_image=jnp.clip(g, 0, 1),
                           alpha_mask=jnp.ones((1, RES, RES)),
                           mono_invdepth=jnp.zeros((1, RES, RES)),
                           depth_mask=jnp.zeros((1, RES, RES)),
                           depth_reliable=jnp.array(False),
                           image_index=jnp.int32(i))
               for i, (c, g) in enumerate(zip(scene.cameras, gts))]
    opt = OptimizationConfig(iterations=300)
    pipe = PipelineConfig(raster_method="pallas", tile_capacity=128,
                          max_dup=32)
    step = make_train_step(meta, opt, pipe, 1.0)
    state = init_state(params, active, n_images=3)
    first, ema = None, None
    for i in range(300):
        state, aux = step(state, batches[i % 3])
        l = float(aux["loss"])
        ema = l if ema is None else 0.97 * ema + 0.03 * l
        if i == 19:
            first = ema
    assert ema < 0.75 * first, (
        f"pallas-path training stalled: EMA {first:.4f} -> {ema:.4f}")


def test_train_step_exact_mode_matches_uncapped(toy):
    """Training through the exact (virtual-tile) pallas path at a K well
    below the scene's max tile occupancy follows the UNCAPPED tiled
    trajectory (zero tile overflow), where padded pallas at the same K
    would silently truncate — reference parity: its rasterizer has no
    per-tile cap."""
    scene, gts = toy

    def run(pipe):
        params, active, meta = init_model(scene)
        opt = OptimizationConfig(iterations=50, position_lr_init=2e-4,
                                 position_lr_final=2e-6)
        state = init_state(params, active, n_images=len(gts))
        step = make_train_step(meta, opt, pipe, spatial_lr_scale=1.0,
                               sh_degree_schedule=False)
        traj, overflow = [], 0
        for epoch in range(2):
            for b in make_batches(scene, gts):
                state, aux = step(state, b)
                loss = float(aux["loss"])
                assert np.isfinite(loss)
                overflow += int(aux["tile_overflow"])
                traj.append(loss)
        return np.asarray(traj), overflow

    ref, _ = run(PipelineConfig(raster_method="tiled", tile_capacity=640,
                                max_dup=32))
    ex, ex_of = run(PipelineConfig(raster_method="pallas", tile_capacity=128,
                                   max_dup=32, exact_extra=64))
    assert ex_of == 0
    np.testing.assert_allclose(ex, ref, rtol=5e-3)
