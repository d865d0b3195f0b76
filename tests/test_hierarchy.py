"""Hierarchy subsystem tests: builder invariants, cut partition property,
LOD render consistency, serialization roundtrip, merger, post-opt step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from street_sparse_3dgs_tpu.config import OptimizationConfig, PipelineConfig
from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.hierarchy.build import build_hierarchy
from street_sparse_3dgs_tpu.hierarchy.io import load_hierarchy, save_hierarchy
from street_sparse_3dgs_tpu.hierarchy.merge import merge_hierarchies
from street_sparse_3dgs_tpu.hierarchy.render import render_cut
from street_sparse_3dgs_tpu.hierarchy.structure import (Cut, pixel_limit,
                                                        select_cut)
from street_sparse_3dgs_tpu.models.gaussians import (GaussianParams,
                                                     inverse_sigmoid)
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from street_sparse_3dgs_tpu.train import losses
from street_sparse_3dgs_tpu.train.post import (init_post_state,
                                               make_post_step, random_limit)
from street_sparse_3dgs_tpu.train.step import CameraBatch


def toy_params(n=100, seed=0, sh_degree=3):
    s = make_toy_scene(seed=seed, n=n, n_cameras=2, width=64, height=64)
    k_rest = (sh_degree + 1) ** 2 - 1
    return GaussianParams(
        xyz=s.means3d,
        features_dc=s.sh_coeffs[:, :1, :],
        features_rest=s.sh_coeffs[:, 1:, :],
        log_scales=jnp.log(s.scales),
        quats=s.quats,
        opacity_raw=inverse_sigmoid(s.opacities)[:, None],
    ), s


@pytest.fixture(scope="module")
def built():
    params, scene = toy_params(n=100)
    h = build_hierarchy(params)
    return h, params, scene


def test_builder_invariants(built):
    h, params, _ = built
    n_leaves = 100
    n_nodes = h.n_nodes
    parent = np.asarray(h.parent)
    ccount = np.asarray(h.child_count)
    cstart = np.asarray(h.child_start)
    # Exactly one root; every non-root's parent is an interior node.
    roots = np.nonzero(parent < 0)[0]
    assert len(roots) == 1
    root = roots[0]
    assert ccount[root] > 0
    # Leaves are the first n_leaves rows with no children.
    assert (ccount[:n_leaves] == 0).all()
    assert (ccount[n_leaves:] > 0).all()
    # Child ranges point back to the parent.
    for i in range(n_leaves, n_nodes):
        for c in range(ccount[i]):
            assert parent[cstart[i] + c] == i
    # Boxes contain children's boxes.
    lo = np.asarray(h.box_center) - np.asarray(h.box_half)
    hi = np.asarray(h.box_center) + np.asarray(h.box_half)
    for i in range(n_nodes):
        p = parent[i]
        if p >= 0:
            assert (lo[p] <= lo[i] + 1e-4).all() and (
                hi[p] >= hi[i] - 1e-4).all()
    # The leaf params are the input params (in Morton order).
    in_xyz = np.asarray(params.xyz)
    leaf_xyz = np.asarray(h.params.xyz[:n_leaves])
    assert set(map(tuple, np.round(in_xyz, 5))) == set(
        map(tuple, np.round(leaf_xyz, 5)))
    # size is monotone along every leaf-to-root path's boxes.
    size = np.asarray(h.size)
    assert size[root] == size.max()


def _check_partition(h, cut: Cut):
    """Every leaf must have exactly one selected node on its root path."""
    parent = np.asarray(h.parent)
    sel = np.asarray(cut.selected)
    leaves = np.nonzero(np.asarray(h.child_count) == 0)[0]
    for leaf in leaves:
        count = 0
        node = leaf
        while node >= 0:
            count += int(sel[node])
            node = parent[node]
        assert count == 1, (leaf, count)


def test_cut_extremes_and_partition(built):
    h, _, scene = built
    campos = scene.cameras[0].campos
    # Huge limit -> only the root.
    cut = select_cut(h, campos, 1e9)
    sel = np.asarray(cut.selected)
    assert sel.sum() == 1
    assert np.asarray(h.parent)[np.nonzero(sel)[0][0]] < 0
    # Zero limit -> exactly the leaves.
    cut0 = select_cut(h, campos, 0.0)
    np.testing.assert_array_equal(np.asarray(cut0.selected),
                                  np.asarray(h.child_count) == 0)
    np.testing.assert_allclose(
        np.asarray(cut0.weights)[np.asarray(cut0.selected)], 1.0)
    # Intermediate limits partition the tree.
    for lim in (0.01, 0.05, 0.3, 2.0):
        cut_l = select_cut(h, campos, lim)
        _check_partition(h, cut_l)
        w = np.asarray(cut_l.weights)
        assert ((w > 0) & (w <= 1.0)).all()


def test_fine_cut_matches_leaf_render(built):
    h, params, scene = built
    cam = scene.cameras[0]
    cfg = RasterConfig(tile_capacity=256)
    limit = pixel_limit(0.0, float(cam.tan_fovx), cam.width)  # tau = 0
    cut = select_cut(h, cam.campos, limit)
    out = render_cut(h.params, cut, h.n_nodes, h.skybox_count, cam, 3,
                     jnp.zeros(3), cfg)
    ref = rasterize(params.xyz, jnp.exp(params.log_scales), params.quats,
                    jax.nn.sigmoid(params.opacity_raw[:, 0]),
                    jnp.concatenate([params.features_dc,
                                     params.features_rest], 1),
                    cam, 3, jnp.zeros(3), cfg)
    # The cut at tau=0 selects every leaf with weight 1 -> identical render.
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=1e-4)


def test_coarse_cut_renders_plausibly(built):
    h, params, scene = built
    cam = scene.cameras[0]
    cfg = RasterConfig(tile_capacity=256)
    fine = render_cut(h.params, select_cut(h, cam.campos, 1e-6), h.n_nodes,
                      h.skybox_count, cam, 3, jnp.zeros(3), cfg)["render"]
    coarse = render_cut(h.params, select_cut(h, cam.campos, 0.5), h.n_nodes,
                        h.skybox_count, cam, 3, jnp.zeros(3), cfg)["render"]
    # Coarse LOD approximates the fine image (moment matching): nonempty and
    # correlated with the fine render.
    f = np.asarray(fine).ravel()
    c = np.asarray(coarse).ravel()
    assert c.std() > 0.01
    corr = np.corrcoef(f, c)[0, 1]
    assert corr > 0.5, corr


def test_io_roundtrip(tmp_path, built):
    h, _, _ = built
    save_hierarchy(tmp_path / "chunk.hier.npz", h)
    h2 = load_hierarchy(tmp_path / "chunk.hier.npz")
    for a, b in zip(h.params, h2.params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(h.parent), np.asarray(h2.parent))
    assert h2.skybox_count == h.skybox_count


def test_merge_two_chunks():
    p1, s1 = toy_params(n=60, seed=1)
    p2, s2 = toy_params(n=50, seed=2)
    # Shift chunk 2 so the merged scene is two clusters.
    p2 = p2._replace(xyz=p2.xyz + 5.0)
    h1 = build_hierarchy(p1)
    h2 = build_hierarchy(p2)
    m = merge_hierarchies([h1, h2])
    assert m.n_nodes == h1.n_nodes + h2.n_nodes + 1
    parent = np.asarray(m.parent)
    assert (parent < 0).sum() == 1
    campos = s1.cameras[0].campos
    for lim in (0.0, 0.05, 1e9):
        _check_partition(m, select_cut(m, campos, lim))
    sel_root = select_cut(m, campos, 1e9)
    assert int(jnp.sum(sel_root.selected)) == 1


def test_post_step_freezes_anchors_and_improves(built):
    h, params, scene = built
    # Mark some rows as anchors manually to exercise freezing.
    anchors = np.zeros(h.n_nodes, bool)
    anchors[:10] = True
    h = h._replace(anchors=jnp.asarray(anchors))
    cam = scene.cameras[0]
    cfg = PipelineConfig(tile_capacity=256)
    opt = OptimizationConfig(position_lr_init=2e-4, position_lr_final=2e-6)
    # GT: the fine render of the hierarchy itself, so it is achievable.
    gt = jnp.clip(render_cut(h.params, select_cut(h, cam.campos, 1e-6),
                             h.n_nodes, h.skybox_count, cam, 3, jnp.zeros(3),
                             RasterConfig(tile_capacity=256))["render"], 0, 1)
    batch = CameraBatch(camera=cam, gt_image=gt,
                        alpha_mask=jnp.ones((1, 64, 64)),
                        mono_invdepth=jnp.zeros((1, 64, 64)),
                        depth_mask=jnp.zeros((1, 64, 64)),
                        depth_reliable=jnp.array(False),
                        image_index=jnp.int32(0))
    step = make_post_step(h, opt, cfg, use_trained_exp=False)
    state = init_post_state(h)
    import random
    rng = random.Random(0)
    losses_seen = []
    for _ in range(25):
        state, aux = step(state, batch, jnp.float32(random_limit(rng)),
                          jnp.eye(3, 4))
        losses_seen.append(float(aux["loss"]))
        assert np.isfinite(losses_seen[-1])
        assert int(aux["n_selected"]) > 0
    # Anchor rows unchanged.
    for a, b in zip(h.params, state.params):
        np.testing.assert_array_equal(np.asarray(a)[:10], np.asarray(b)[:10])
    # Non-anchored rows did move.
    assert not np.allclose(np.asarray(h.params.xyz[10:h.n_nodes]),
                           np.asarray(state.params.xyz[10:h.n_nodes]))
    # Loss trends down (compare first and last 5-step means).
    assert np.mean(losses_seen[-5:]) < np.mean(losses_seen[:5])


def test_compact_cut_render_matches_mask(built):
    """The O(cut) compacted differentiable render (VERDICT round-2 #6) must
    match the O(nodes) mask-form render in images AND gradients back to the
    full node arrays (scatter-add through the gather VJP)."""
    from street_sparse_3dgs_tpu.hierarchy.render import render_cut_compacted

    h, _, scene = built
    cam = scene.cameras[0]
    cfg = RasterConfig(tile_capacity=256)
    limit = 0.05
    cut = select_cut(h, cam.campos, limit)
    n_sel = int(jnp.sum(cut.selected))
    cap = 1 << (n_sel - 1).bit_length()

    def loss_mask(params):
        out = render_cut(params, cut, h.n_nodes, h.skybox_count, cam, 3,
                         jnp.zeros(3), cfg)
        return jnp.mean(out["render"] ** 2) + 0.3 * jnp.mean(
            out["depth"] ** 2), out["render"]

    def loss_compact(params):
        out = render_cut_compacted(params, cut, h.n_nodes, h.skybox_count,
                                   cap, cam, 3, jnp.zeros(3), cfg)
        return jnp.mean(out["render"] ** 2) + 0.3 * jnp.mean(
            out["depth"] ** 2), out["render"]

    (la, img_a), ga = jax.value_and_grad(loss_mask, has_aux=True)(h.params)
    (lb, img_b), gb = jax.value_and_grad(loss_compact, has_aux=True)(h.params)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               atol=2e-5)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5)
    for name, a, b in zip(ga._fields, ga, gb):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale, rtol=2e-3,
            err_msg=f"grad {name} mask-form vs compact")


def test_compact_cut_overflow_counted(built):
    """Selected nodes beyond the static capacity are counted, not dropped."""
    from street_sparse_3dgs_tpu.hierarchy.render import compact_cut_indices

    h, _, scene = built
    cut = select_cut(h, scene.cameras[0].campos, 0.01)
    n_sel = int(jnp.sum(cut.selected))
    assert n_sel > 4
    gi, gp, w, valid, overflow = compact_cut_indices(cut, 4)
    assert int(overflow) == n_sel - 4
    assert int(jnp.sum(valid)) == 4
    # Full capacity: no overflow, indices are exactly the selected set.
    gi, _, _, valid, overflow = compact_cut_indices(cut, 1 << 10)
    assert int(overflow) == 0
    np.testing.assert_array_equal(
        np.sort(np.asarray(gi)[np.asarray(valid)]),
        np.nonzero(np.asarray(cut.selected))[0])


def test_compact_post_driver_grows_and_redoes(built):
    """CompactPostDriver: an undersized capacity must grow (pow2) with the
    overflowing step REDONE, and the final state must equal training the
    same schedule at a sufficient capacity from the start."""
    from street_sparse_3dgs_tpu.train.post import CompactPostDriver

    h, params, scene = built
    cam = scene.cameras[0]
    cfg = PipelineConfig(tile_capacity=256)
    opt = OptimizationConfig(position_lr_init=2e-4, position_lr_final=2e-6)
    gt = jnp.clip(render_cut(h.params, select_cut(h, cam.campos, 1e-6),
                             h.n_nodes, h.skybox_count, cam, 3, jnp.zeros(3),
                             RasterConfig(tile_capacity=256))["render"], 0, 1)
    batch = CameraBatch(camera=cam, gt_image=gt,
                        alpha_mask=jnp.ones((1, 64, 64)),
                        mono_invdepth=jnp.zeros((1, 64, 64)),
                        depth_mask=jnp.zeros((1, 64, 64)),
                        depth_reliable=jnp.array(False),
                        image_index=jnp.int32(0))
    import random

    def run(capacity):
        d = CompactPostDriver(h, opt, cfg, capacity=capacity,
                              use_trained_exp=False)
        rng = random.Random(0)
        for _ in range(8):
            d.step(batch, jnp.float32(random_limit(rng)), jnp.eye(3, 4))
        return d, d.finish()

    d_small, s_small = run(capacity=2)
    assert d_small.redos > 0 and d_small.capacity > 2
    d_big, s_big = run(capacity=d_small.capacity)
    assert d_big.redos == 0
    for name, a, b in zip(s_big.params._fields, s_big.params, s_small.params):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=f"param {name} after growth redo")


def test_random_limit_distribution():
    import random
    rng = random.Random(0)
    vals = [random_limit(rng) for _ in range(2000)]
    assert min(vals) >= 0.005 and max(vals) <= 0.1
    # log-uniform: median near geometric mean sqrt(0.005*0.1)=0.0224
    med = sorted(vals)[1000]
    assert 0.015 < med < 0.032


def test_budget_limit_caps_cut_size(built):
    """budget_limit (the SIBR viewer --budget analog) must return the
    finest limit whose cut fits the node budget."""
    import numpy as np

    from street_sparse_3dgs_tpu.hierarchy.structure import (budget_limit,
                                                            select_cut)

    h, params, scene = built
    campos = jnp.asarray(np.array([3.0, 0.0, 1.0], np.float32))
    for budget in (1, 8, 32, 10_000):
        lim = budget_limit(h, campos, budget)
        n = int(jnp.sum(select_cut(h, campos, lim).selected))
        assert 1 <= n <= budget
    # A generous budget should admit a finer cut than a tight one.
    lim_tight = float(budget_limit(h, campos, 4))
    lim_loose = float(budget_limit(h, campos, 64))
    assert lim_loose <= lim_tight
    n_tight = int(jnp.sum(select_cut(h, campos, lim_tight).selected))
    n_loose = int(jnp.sum(select_cut(h, campos, lim_loose).selected))
    assert n_loose >= n_tight
