"""Multi-chip sharding tests on the 8-device virtual CPU mesh: data-parallel
training step semantics and tile-sharded rendering parity + gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from street_sparse_3dgs_tpu.config import OptimizationConfig, PipelineConfig
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.models.gaussians import create_from_pcd
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.parallel.dp import make_dp_train_step
from street_sparse_3dgs_tpu.parallel.mesh import make_mesh
from street_sparse_3dgs_tpu.parallel.tiles import rasterize_tile_sharded
from street_sparse_3dgs_tpu.train.step import CameraBatch, init_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def scene():
    # 48x48 -> 9 tiles (pads to 12 over 4 shards), n sized so every
    # shard still blends multiple gaussian blocks; interpret-mode pallas
    # pays per-op costs, so K=128 (one 128-block) halves compile+run
    # vs K=256 with no assertion lost (parity is scale-invariant).
    return make_toy_scene(seed=0, n=192, n_cameras=8, width=48, height=48)


def test_tile_sharded_matches_single(scene):
    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16)
    cam = scene.cameras[0]
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cam, 3, jnp.zeros(3))
    ref = rasterize(*args, cfg)
    with mesh:
        out = rasterize_tile_sharded(*args, mesh=mesh, config=cfg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=2e-5)


def test_tile_sharded_gradients(scene):
    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16)
    cam = scene.cameras[0]

    def loss_single(means):
        out = rasterize(means, scene.scales, scene.quats, scene.opacities,
                        scene.sh_coeffs, cam, 3, jnp.zeros(3), cfg)
        return jnp.mean(out["render"] ** 2)

    def loss_sharded(means):
        out = rasterize_tile_sharded(
            means, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cam, 3, jnp.zeros(3), mesh, cfg)
        return jnp.mean(out["render"] ** 2)

    ga = jax.grad(loss_single)(scene.means3d)
    with mesh:
        gb = jax.jit(jax.grad(loss_sharded))(scene.means3d)
    scale = float(jnp.abs(ga).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=3e-4 * scale, rtol=2e-3)


def test_dp_step_matches_serial_visibility_union(scene):
    """The DP step over B cameras computes the mean-loss gradient; check it
    runs sharded over 8 devices and the result is replicated-consistent."""
    mesh = make_mesh(n_data=8, n_tile=1)
    key = jax.random.PRNGKey(0)
    params, active, meta = create_from_pcd(
        key, np.asarray(scene.means3d), np.full((scene.means3d.shape[0], 3), 0.5), capacity=256)
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=128, max_dup=16)
    step_fn, shard_batch, shard_state = make_dp_train_step(
        meta, opt, pipe, 1.0, mesh)
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *scene.cameras)
    b = 8
    batch = CameraBatch(
        camera=cams, gt_image=jnp.zeros((b, 3, 48, 48)),
        alpha_mask=jnp.ones((b, 1, 48, 48)),
        mono_invdepth=jnp.zeros((b, 1, 48, 48)),
        depth_mask=jnp.zeros((b, 1, 48, 48)),
        depth_reliable=jnp.zeros((b,), bool),
        image_index=jnp.arange(b, dtype=jnp.int32))
    state = shard_state(init_state(params, active, b))
    with mesh:
        new_state, aux = step_fn(shard_state(state), shard_batch(batch), 3)
    assert np.isfinite(float(aux["loss"]))
    assert int(aux["n_visible"]) > 0
    # Params changed and stayed finite.
    assert np.isfinite(np.asarray(new_state.params.xyz)).all()
    assert not np.allclose(np.asarray(new_state.params.xyz),
                           np.asarray(state.params.xyz))


def _mixed_batch(scene, b, h=48, w=48):
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *scene.cameras[:b])
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0, 1, (b, 3, h, w)), jnp.float32)
    mono = jnp.asarray(rng.uniform(0.1, 1.0, (b, 1, h, w)), jnp.float32)
    reliable = jnp.zeros((b,), bool).at[1].set(True)
    return CameraBatch(
        camera=cams, gt_image=gt,
        alpha_mask=jnp.ones((b, 1, h, w)),
        mono_invdepth=mono,
        depth_mask=jnp.ones((b, 1, h, w)),
        depth_reliable=reliable,
        image_index=jnp.arange(b, dtype=jnp.int32))


def test_batch_tile_sharded_render_and_grads(scene):
    """The batched (data × tile)-sharded rasterizer must match per-view
    serial rasterization in images AND gradients (the actual parity
    guarantee behind the tile-sharded TRAINING step)."""
    from street_sparse_3dgs_tpu.parallel.tp import rasterize_batch_tile_sharded

    mesh = make_mesh(n_data=2, n_tile=4)
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16)
    b = 2
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *scene.cameras[:b])
    bgs = jnp.asarray([[0.1, 0.2, 0.3], [0.9, 0.5, 0.0]], jnp.float32)

    def loss_serial(means, scales):
        total = 0.0
        for i in range(b):
            cam = jax.tree.map(lambda x: x[i], cams)
            out = rasterize(means, scales, scene.quats, scene.opacities,
                            scene.sh_coeffs, cam, 3, bgs[i], cfg)
            total = total + jnp.mean(out["render"] ** 2) \
                + 0.3 * jnp.mean(out["depth"] ** 2)
        return total / b

    def loss_sharded(means, scales):
        out = rasterize_batch_tile_sharded(
            means, scales, scene.quats, scene.opacities, scene.sh_coeffs,
            cams, 3, bgs, mesh, config=cfg)
        return jnp.mean(out["render"] ** 2) \
            + 0.3 * jnp.mean(out["depth"] ** 2)

    # Images.
    serial_imgs = [rasterize(scene.means3d, scene.scales, scene.quats,
                             scene.opacities, scene.sh_coeffs,
                             jax.tree.map(lambda x: x[i], cams), 3, bgs[i],
                             cfg)["render"] for i in range(b)]
    with mesh:
        out = rasterize_batch_tile_sharded(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cams, 3, bgs, mesh, config=cfg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.stack(serial_imgs), atol=2e-5)

    # Gradients wrt two parameter leaves.
    ga = jax.grad(loss_serial, argnums=(0, 1))(scene.means3d, scene.scales)
    with mesh:
        gb = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
            scene.means3d, scene.scales)
    for a, b_ in zip(ga, gb):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=3e-4 * scale, rtol=2e-3)


def test_tile_sharded_train_step_matches_dp(scene):
    """VERDICT round-2 #4: training THROUGH the tile-sharded blend.  The
    (data × tile)-sharded step computes the same batch-mean loss as the
    data-parallel step on the same mixed batch (photometric views plus one
    depth-only view), so: identical loss, identical densify statistics, and
    post-Adam parameters equal up to ONE Adam quantum per field — reordered
    f32 summation can flip the sign of noise-magnitude gradients, and Adam's
    first step is ±lr regardless of magnitude, so elements may differ by
    exactly 2·lr.  True gradient parity is locked by
    ``test_batch_tile_sharded_render_and_grads`` above."""
    from street_sparse_3dgs_tpu.parallel.tp import make_tile_sharded_train_step

    key = jax.random.PRNGKey(0)
    params, active, meta = create_from_pcd(
        key, np.asarray(scene.means3d), np.full((scene.means3d.shape[0], 3), 0.5), capacity=256)
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=128, max_dup=16,
                          raster_method="pallas")
    b = 4
    batch = _mixed_batch(scene, b)
    depth_flags = jnp.zeros((b,), bool).at[1].set(True)

    dp_mesh = make_mesh(n_data=4, n_tile=1, devices=jax.devices()[:4])
    dp_step, shard_batch, shard_state = make_dp_train_step(
        meta, opt, pipe, 1.0, dp_mesh)
    state0 = init_state(params, active, n_images=b)
    with dp_mesh:
        dp_state, dp_aux = dp_step(shard_state(state0), shard_batch(batch),
                                   3, depth_flags)
        dp_state = jax.tree.map(np.asarray, dp_state)

    tp_mesh = make_mesh(n_data=2, n_tile=4)
    tp_step, replicate = make_tile_sharded_train_step(
        meta, opt, pipe, 1.0, tp_mesh)
    with tp_mesh:
        tp_state, tp_aux = tp_step(replicate(state0), replicate(batch),
                                   3, depth_flags)
        tp_state = jax.tree.map(np.asarray, tp_state)

    assert np.isfinite(float(tp_aux["loss"]))
    np.testing.assert_allclose(float(tp_aux["loss"]), float(dp_aux["loss"]),
                               rtol=1e-5, atol=1e-6)
    # One Adam quantum per field: lr for xyz/features/opacity/scaling/rot.
    quantum = {
        "xyz": opt.position_lr_init, "features_dc": opt.feature_lr,
        "features_rest": opt.feature_lr / 20.0, "opacity_raw": opt.opacity_lr,
        "log_scales": opt.scaling_lr, "quats": opt.rotation_lr,
    }
    for name, a, b_ in zip(dp_state.params._fields, dp_state.params,
                           tp_state.params):
        bound = 2.05 * quantum[name] + 1e-5
        max_dev = float(np.abs(np.asarray(b_) - np.asarray(a)).max())
        assert max_dev <= bound, (
            f"param {name}: tp/dp deviate by {max_dev} > one Adam "
            f"quantum bound {bound}")
    np.testing.assert_allclose(tp_state.exposure, dp_state.exposure,
                               atol=1e-6)
    np.testing.assert_allclose(tp_state.grad_accum, dp_state.grad_accum,
                               atol=1e-5)
    np.testing.assert_allclose(tp_state.denom, dp_state.denom, atol=0)
    np.testing.assert_allclose(tp_state.max_radii2d, dp_state.max_radii2d,
                               atol=1e-5)
    # The depth-only view must have contributed: its flag ON changes params
    # vs the same batch with the flag off.
    with tp_mesh:
        tp_state2, _ = tp_step(replicate(state0), replicate(batch),
                               3, jnp.zeros((b,), bool))
    assert not np.allclose(np.asarray(tp_state2.params.xyz),
                           tp_state.params.xyz)


def test_ring_train_step_matches_serial(scene):
    """Model-parallel ring TRAINING step (params/moments/stats sharded over
    the gaussian axis, render via the ring) must match the serial
    single-view step: same loss, same densify stats, post-Adam params equal
    up to one Adam quantum (see the tp/dp test for why)."""
    from street_sparse_3dgs_tpu.parallel.ring import make_ring_train_step
    from street_sparse_3dgs_tpu.train.step import make_train_step

    key = jax.random.PRNGKey(0)
    params, active, meta = create_from_pcd(
        key, np.asarray(scene.means3d), np.full((scene.means3d.shape[0], 3), 0.5), capacity=256)
    opt = OptimizationConfig()
    # K=256: ring staging bins each gaussian shard separately, so a tile
    # overflow truncates a DIFFERENT pair set than the serial bin — the
    # loss-parity assertion needs the overflow-free capacity.
    pipe = PipelineConfig(tile_capacity=256, max_dup=16,
                          raster_method="pallas")
    b = _mixed_batch(scene, 1)
    batch = jax.tree.map(lambda x: x[0] if hasattr(x, "shape")
                         and x.shape[:1] == (1,) else x, b)
    batch = batch._replace(camera=jax.tree.map(lambda x: x[0], b.camera),
                           depth_reliable=jnp.asarray(True))

    serial_step = make_train_step(meta, opt, pipe, 1.0,
                                  sh_degree_schedule=False)
    s_state, s_aux = serial_step(init_state(params, active, n_images=1),
                                 batch)
    s_state = jax.tree.map(np.asarray, s_state)

    mesh = make_mesh(n_data=1, n_tile=8)
    ring_step, shard_state = make_ring_train_step(meta, opt, pipe, 1.0, mesh)
    with mesh:
        r_state, r_aux = ring_step(
            shard_state(init_state(params, active, n_images=1)), batch, 3)
        r_state = jax.tree.map(np.asarray, r_state)

    np.testing.assert_allclose(float(r_aux["loss"]), float(s_aux["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(r_aux["n_visible"]) == int(s_aux["n_visible"])
    quantum = {
        "xyz": opt.position_lr_init, "features_dc": opt.feature_lr,
        "features_rest": opt.feature_lr / 20.0, "opacity_raw": opt.opacity_lr,
        "log_scales": opt.scaling_lr, "quats": opt.rotation_lr,
    }
    for name, a, b_ in zip(s_state.params._fields, s_state.params,
                           r_state.params):
        bound = 2.05 * quantum[name] + 1e-5
        max_dev = float(np.abs(np.asarray(b_) - np.asarray(a)).max())
        assert max_dev <= bound, (
            f"param {name}: ring/serial deviate by {max_dev} > {bound}")
    np.testing.assert_allclose(r_state.exposure, s_state.exposure, atol=1e-6)
    np.testing.assert_allclose(r_state.grad_accum, s_state.grad_accum,
                               atol=1e-5)
    np.testing.assert_allclose(r_state.denom, s_state.denom, atol=0)
    np.testing.assert_allclose(r_state.max_radii2d, s_state.max_radii2d,
                               atol=1e-5)
    # Depth-only flag changes the result (the dynamic branch is live).
    with mesh:
        r2, _ = ring_step(
            shard_state(init_state(params, active, n_images=1)), batch, 3,
            jnp.asarray(True))
    assert not np.allclose(np.asarray(r2.params.xyz), r_state.params.xyz)


def test_ring_staged_matches_single(scene):
    """Gaussian+tile sharded ring render == single-device render (images)."""
    from street_sparse_3dgs_tpu.parallel.ring import rasterize_ring_staged

    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=256, max_dup=16)
    cam = scene.cameras[0]
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cam, 3, jnp.zeros(3))
    ref = rasterize(*args, cfg)
    with mesh:
        out = jax.jit(lambda m, s, q, o, sh: rasterize_ring_staged(
            m, s, q, o, sh, cam, 3, jnp.zeros(3), mesh=mesh, config=cfg))(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs)
    assert int(out["pair_overflow"]) == 0
    assert int(out["tile_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=2e-5)


def test_ring_staged_gradients(scene):
    from street_sparse_3dgs_tpu.parallel.ring import rasterize_ring_staged

    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=256, max_dup=16)
    cam = scene.cameras[0]

    def loss_single(means, sh):
        out = rasterize(means, scene.scales, scene.quats, scene.opacities,
                        sh, cam, 3, jnp.zeros(3), cfg)
        return jnp.mean(out["render"] ** 2) + jnp.mean(out["depth"])

    def loss_ring(means, sh):
        out = rasterize_ring_staged(
            means, scene.scales, scene.quats, scene.opacities,
            sh, cam, 3, jnp.zeros(3), mesh, cfg)
        return jnp.mean(out["render"] ** 2) + jnp.mean(out["depth"])

    ga, gsh = jax.grad(loss_single, argnums=(0, 1))(scene.means3d,
                                                    scene.sh_coeffs)
    with mesh:
        gb, gbsh = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(
            scene.means3d, scene.sh_coeffs)
    scale = float(jnp.abs(ga).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=3e-4 * scale, rtol=2e-3)
    ssc = float(jnp.abs(gsh).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(gbsh), np.asarray(gsh),
                               atol=3e-4 * ssc, rtol=2e-3)


def test_ring_staged_pair_overflow_counted(scene):
    """Shrinking stage_pair_capacity must surface counted overflow, not
    silently drop pairs."""
    from street_sparse_3dgs_tpu.parallel.ring import rasterize_ring_staged

    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16)
    cam = scene.cameras[0]
    with mesh:
        out = rasterize_ring_staged(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cam, 3, jnp.zeros(3), mesh, cfg,
            stage_pair_capacity=8)
    assert int(out["pair_overflow"]) > 0


class TestDistributedIdentity:
    """parallel.distributed: in-program multi-host identity resolution."""

    def test_single_process_defaults(self):
        from street_sparse_3dgs_tpu.parallel.distributed import (
            host_identity, init_distributed)
        assert init_distributed() == (0, 1)   # no coordinator → no-op
        assert host_identity() == (0, 1)

    def test_explicit_override_wins(self):
        from street_sparse_3dgs_tpu.parallel.distributed import host_identity
        assert host_identity(2, 4) == (2, 4)

    def test_ambiguous_fanout_rejected(self):
        # num_hosts beyond the runtime's process count with no explicit
        # host_id would map EVERY host to partition 0 — must error.
        import pytest
        from street_sparse_3dgs_tpu.parallel.distributed import host_identity
        with pytest.raises(ValueError, match="process count"):
            host_identity(None, 4)

    def test_out_of_range_rejected(self):
        import pytest
        from street_sparse_3dgs_tpu.parallel.distributed import host_identity
        with pytest.raises(ValueError):
            host_identity(5, 4)


def test_tile_sharded_exact_matches_single(scene):
    """Exact virtual-tile rendering sharded over the tile axis: the
    shard-segmented window allocation must reproduce the single-device
    exact render (images AND grads) with zero tile overflow at a K below
    the scene's max occupancy."""
    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16,
                       exact_extra=32)
    cam = scene.cameras[0]
    args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs)
    bg = jnp.array([0.2, 0.1, 0.3])
    ref = rasterize(*args, cam, 3, bg, cfg)
    out = rasterize_tile_sharded(*args, cam, 3, bg, mesh, cfg)
    assert int(out["tile_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=1e-5)

    def loss_sharded(means):
        o = rasterize_tile_sharded(means, *args[1:], cam, 3, bg, mesh, cfg)
        return jnp.mean(o["render"] ** 2) + 0.2 * jnp.mean(o["depth"])

    def loss_single(means):
        o = rasterize(means, *args[1:], cam, 3, bg, cfg)
        return jnp.mean(o["render"] ** 2) + 0.2 * jnp.mean(o["depth"])

    ga = jax.grad(loss_single)(scene.means3d)
    gb = jax.grad(loss_sharded)(scene.means3d)
    scale = float(jnp.abs(ga).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=1e-4 * scale)


def test_batch_tile_sharded_exact_matches_serial(scene):
    """VERDICT r4 item 4: the (data × tile)-sharded TRAINING blend in EXACT
    (virtual-tile) mode — per-view shard-segmented window allocation,
    global tile ids with the kernels' t_mod wrap, outside bg composite —
    must match per-view serial EXACT rasterization in images and grads
    (counts-based backward included)."""
    from street_sparse_3dgs_tpu.parallel.tp import rasterize_batch_tile_sharded

    mesh = make_mesh(n_data=2, n_tile=4)
    # K well below the deepest tile so windows actually wrap; counts-mode
    # backward exercises seg_pos through the sharded path.
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16,
                       exact_extra=16, grad_reduce="counts")
    b = 2
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *scene.cameras[:b])
    bgs = jnp.asarray([[0.1, 0.2, 0.3], [0.9, 0.5, 0.0]], jnp.float32)

    serial = [rasterize(scene.means3d, scene.scales, scene.quats,
                        scene.opacities, scene.sh_coeffs,
                        jax.tree.map(lambda x: x[i], cams), 3, bgs[i], cfg)
              for i in range(b)]
    assert all(int(o["tile_overflow"]) == 0 for o in serial)
    with mesh:
        out = rasterize_batch_tile_sharded(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, cams, 3, bgs, mesh, config=cfg)
    assert int(out["tile_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.stack([o["render"] for o in serial]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.stack([o["alpha"] for o in serial]),
                               atol=2e-5)

    def loss_serial(means, scales):
        total = 0.0
        for i in range(b):
            cam = jax.tree.map(lambda x: x[i], cams)
            o = rasterize(means, scales, scene.quats, scene.opacities,
                          scene.sh_coeffs, cam, 3, bgs[i], cfg)
            total = total + jnp.mean(o["render"] ** 2) \
                + 0.3 * jnp.mean(o["depth"] ** 2)
        return total / b

    def loss_sharded(means, scales):
        o = rasterize_batch_tile_sharded(
            means, scales, scene.quats, scene.opacities, scene.sh_coeffs,
            cams, 3, bgs, mesh, config=cfg)
        return jnp.mean(o["render"] ** 2) + 0.3 * jnp.mean(o["depth"] ** 2)

    ga = jax.grad(loss_serial, argnums=(0, 1))(scene.means3d, scene.scales)
    with mesh:
        gb = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
            scene.means3d, scene.scales)
    for a, b_ in zip(ga, gb):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=3e-4 * scale, rtol=2e-3)


def test_tile_sharded_exact_train_step_runs(scene):
    """The exact+counts tile-sharded train STEP executes end-to-end on the
    mesh (guard wired: update_skipped aux present, 0 at a clean budget)."""
    from street_sparse_3dgs_tpu.parallel.tp import make_tile_sharded_train_step

    key = jax.random.PRNGKey(0)
    params, active, meta = create_from_pcd(
        key, np.asarray(scene.means3d),
        np.full((scene.means3d.shape[0], 3), 0.5), capacity=256)
    opt = OptimizationConfig()
    pipe = PipelineConfig(tile_capacity=128, max_dup=16,
                          raster_method="pallas", exact_extra=16,
                          grad_reduce="counts")
    b = 4
    batch = _mixed_batch(scene, b)
    mesh = make_mesh(n_data=2, n_tile=4)
    step, replicate = make_tile_sharded_train_step(meta, opt, pipe, 1.0,
                                                   mesh)
    state0 = init_state(params, active, n_images=b)
    with mesh:
        state1, aux = step(replicate(state0), replicate(batch), 3,
                           jnp.zeros((b,), bool))
    assert np.isfinite(float(aux["loss"]))
    assert int(aux["update_skipped"]) == 0
    assert int(aux["tile_overflow"]) == 0
    assert not np.allclose(np.asarray(state1.params.xyz),
                           np.asarray(state0.params.xyz))


def test_ring_rejects_exact_mode(scene):
    """Advisor r4: the ring path must fail loudly (not silently truncate)
    when a config requests exact virtual-tile windows."""
    from street_sparse_3dgs_tpu.parallel.ring import rasterize_ring_staged

    mesh = make_mesh(n_data=1, n_tile=4, devices=jax.devices()[:4])
    cfg = RasterConfig(method="pallas", tile_capacity=128, exact_extra=64)
    with pytest.raises(ValueError, match="exact_extra"):
        rasterize_ring_staged(
            scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, scene.cameras[0], 3, jnp.zeros(3), mesh, cfg)
