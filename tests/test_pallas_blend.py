"""Parity of the fused Pallas blend kernels against the XLA-composed tiled
blend (and hence the oracle): forward images, depth, alpha, and gradients
w.r.t. every Gaussian attribute.  Runs the kernels in interpreter mode on
CPU; the same code compiles on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from street_sparse_3dgs_tpu.data.toy import make_toy_scene
from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

W, H = 64, 48


@pytest.fixture(scope="module", params=[0, 1])
def scene(request):
    return make_toy_scene(seed=request.param, n=300, n_cameras=1,
                          width=W, height=H)


def render(scene, method, **kw):
    cfg = RasterConfig(method=method, tile_capacity=256, max_dup=32)
    return rasterize(scene.means3d, scene.scales, scene.quats,
                     scene.opacities, scene.sh_coeffs, scene.cameras[0], 3,
                     jnp.array([0.2, 0.1, 0.3]), cfg, **kw)


def test_forward_parity(scene):
    a = render(scene, "tiled")
    b = render(scene, "pallas")
    np.testing.assert_allclose(np.asarray(b["render"]),
                               np.asarray(a["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b["depth"]),
                               np.asarray(a["depth"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b["alpha"]),
                               np.asarray(a["alpha"]), atol=2e-5)


def test_gradient_parity(scene):
    def loss(method, means3d, scales, quats, opac, sh):
        cfg = RasterConfig(method=method, tile_capacity=256, max_dup=32)
        out = rasterize(means3d, scales, quats, opac, sh, scene.cameras[0],
                        3, jnp.array([0.2, 0.1, 0.3]), cfg)
        # Weighted sums exercise color, depth and alpha channels.
        return (jnp.mean(out["render"] ** 2) + 0.3 * jnp.mean(out["depth"])
                + 0.1 * jnp.mean(out["alpha"] ** 2))

    args = (scene.means3d, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs)
    ga = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(
        *args)
    gb = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(
        *args)
    names = ("means3d", "scales", "quats", "opacities", "sh")
    for name, a, b in zip(names, ga, gb):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=3e-4 * scale, rtol=2e-3,
                                   err_msg=name)


def test_screen_grad_parity(scene):
    """The densification stat path: grads w.r.t. the mean2d residual."""
    n = scene.means3d.shape[0]

    def loss(method, res):
        out = render(scene, method, mean2d_residual=res)
        return jnp.mean(out["render"] ** 2)

    z = jnp.zeros((n, 2))
    ga = jax.grad(lambda r: loss("tiled", r))(z)
    gb = jax.grad(lambda r: loss("pallas", r))(z)
    scale = float(jnp.abs(ga).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=3e-4 * scale, rtol=2e-3)


def test_background_gradient(scene):
    def loss(method, bg):
        cfg = RasterConfig(method=method, tile_capacity=256, max_dup=32)
        out = rasterize(scene.means3d, scene.scales, scene.quats,
                        scene.opacities, scene.sh_coeffs, scene.cameras[0],
                        3, bg, cfg)
        return jnp.mean(out["render"] ** 2)

    bg = jnp.array([0.2, 0.1, 0.3])
    ga = jax.grad(lambda b: loss("tiled", b))(bg)
    gb = jax.grad(lambda b: loss("pallas", b))(bg)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=1e-5,
                               rtol=1e-3)


def test_finite_difference_gradcheck():
    """Numeric (finite-difference) gradient check of the Pallas path on a
    tiny smooth scene — autodiff-independent verification (SURVEY.md §4
    consequence (c)).  Uses interior Gaussians with moderate opacity so the
    loss is locally smooth (the blend's inclusion masks are piecewise
    constant)."""
    scene = make_toy_scene(seed=5, n=24, n_cameras=1, width=32, height=32)
    opac = jnp.clip(scene.opacities, 0.3, 0.7)
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16)

    def loss(means3d):
        out = rasterize(means3d, scene.scales, scene.quats, opac,
                        scene.sh_coeffs, scene.cameras[0], 3,
                        jnp.array([0.1, 0.2, 0.3]), cfg)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["depth"])

    g = np.asarray(jax.grad(loss)(scene.means3d))
    rng = np.random.default_rng(0)
    eps = 1e-3
    base = np.asarray(scene.means3d)
    checked = agree = 0
    for _ in range(16):
        i = rng.integers(0, base.shape[0])
        d = rng.integers(0, 3)
        if abs(g[i, d]) < 1e-3:
            continue
        pert = base.copy()
        pert[i, d] += eps
        up = float(loss(jnp.asarray(pert)))
        pert[i, d] -= 2 * eps
        dn = float(loss(jnp.asarray(pert)))
        fd = (up - dn) / (2 * eps)
        checked += 1
        if abs(fd - g[i, d]) <= 0.1 * abs(g[i, d]) + 1e-3:
            agree += 1
    # The loss is piecewise smooth (inclusion masks / alpha cutoffs create
    # kinks a finite difference may straddle); require a clear majority of
    # sampled coordinates to match instead of all of them.
    assert checked >= 6
    assert agree / checked >= 0.7, (agree, checked)


def test_bf16_attr_mode_bounded_deviation():
    """attr_dtype="bf16" packs blend attributes (and backward per-slot
    grads) bfloat16 with f32 accumulators.  Measured on v5e it is NOT
    faster (the TPU sort does not reward narrower payloads: 15.05 vs
    14.71 ms at 512^2/32k), so it stays opt-in; this test locks that the
    mode works end-to-end and bounds its deviation from f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    s = make_toy_scene(seed=0, n=512, n_cameras=1, width=96, height=64)
    bg = jnp.array([0.1, 0.2, 0.3])

    def run(cfg):
        def loss(m):
            out = rasterize(m, s.scales, s.quats, s.opacities, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.mean(out["render"]), out["render"]

        (_, img), g = jax.value_and_grad(loss, has_aux=True)(s.means3d)
        return np.asarray(img), np.asarray(g)

    base = dict(method="pallas", max_dup=32, tile_capacity=128)
    img32, g32 = run(RasterConfig(**base))
    img16, g16 = run(RasterConfig(**base, attr_dtype="bf16"))
    assert np.abs(img32 - img16).max() < 0.06
    gn = np.linalg.norm(g32, axis=1)
    mask = gn > 1e-6
    rel = np.abs(g32 - g16).max(axis=1)[mask] / (gn[mask] + 1e-12)
    assert np.median(rel) < 0.1


def test_tile_batch_matches_unbatched():
    """tile_batch > 1 (several tiles per kernel program, zero-count padded
    tail tiles) must be bit-identical to the per-tile grid — images AND
    grads, including a tile count NOT divisible by the batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    # 96x80 -> 6x5 = 30 tiles: not divisible by 4 (pads to 32).
    s = make_toy_scene(seed=2, n=384, n_cameras=1, width=96, height=80)
    bg = jnp.array([0.2, 0.1, 0.3])

    def run(cfg):
        def loss(m):
            out = rasterize(m, s.scales, s.quats, s.opacities, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.sum(out["render"] * out["render"]) \
                + jnp.sum(out["depth"]), out["render"]

        (_, img), g = jax.value_and_grad(loss, has_aux=True)(s.means3d)
        return np.asarray(img), np.asarray(g)

    base = dict(method="pallas", max_dup=32, tile_capacity=128)
    img1, g1 = run(RasterConfig(**base, tile_batch=1))
    img4, g4 = run(RasterConfig(**base, tile_batch=4))
    np.testing.assert_array_equal(img1, img4)
    np.testing.assert_array_equal(g1, g4)


def test_bf16_grad_sort_bounded_deviation():
    """grad_sort="bf16" packs backward cotangent channel PAIRS two-per-
    uint32 through the segment-reduction sort (11 -> 6 operands; measured
    35.3 -> 19.1 ms at street scale on v5e).  The forward is bit-identical
    to f32 mode; gradients deviate only by per-pair bf16 rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    s = make_toy_scene(seed=1, n=512, n_cameras=1, width=96, height=64)
    bg = jnp.array([0.1, 0.2, 0.3])

    def run(cfg):
        def loss(m, sc):
            out = rasterize(m, sc, s.quats, s.opacities, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.mean(out["render"]) + 0.1 * jnp.mean(out["depth"]), \
                out["render"]

        (_, img), g = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(s.means3d, s.scales)
        return np.asarray(img), [np.asarray(x) for x in g]

    base = dict(method="pallas", max_dup=32, tile_capacity=128)
    img32, g32 = run(RasterConfig(**base))
    img16, g16 = run(RasterConfig(**base, grad_sort="bf16"))
    np.testing.assert_array_equal(img32, img16)   # forward untouched
    for a, b in zip(g32, g16):
        gn = np.linalg.norm(a, axis=1)
        mask = gn > 1e-6
        rel = np.abs(a - b).max(axis=1)[mask] / (gn[mask] + 1e-12)
        assert np.median(rel) < 0.02
        assert np.all(np.isfinite(b))


def test_terminated_pixels_stay_terminated_across_blocks():
    """Regression: pixels that cross the 1e-4 transmittance threshold
    mid-block must not resume contributing in later 128-wide gaussian
    blocks.  The fwd deviation is tiny (weights near T_EPS) but it breaks
    the backward's prefix assumption (included slots = first ncontrib),
    which reconstructs transmittance as exp(+large) and produced 1e5-scale
    garbage gradients — the failure mode that stalled real-TPU training
    while all benign-scene parity tests stayed green.

    Scene: opaque front gaussians (terminate every pixel inside block 0)
    followed by a long tail of barely-above-alpha-min gaussians (the
    resume bait)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from street_sparse_3dgs_tpu.data.toy import make_toy_scene
    from street_sparse_3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    s = make_toy_scene(seed=5, n=320, n_cameras=1, width=64, height=48)
    rng = np.random.default_rng(0)
    # depth-sorted bait: front third opaque, back two thirds faint
    opac = np.where(np.arange(320) < 100,
                    rng.uniform(0.9, 0.99, 320),
                    rng.uniform(0.006, 0.012, 320)).astype(np.float32)
    # big footprints so every gaussian covers many pixels
    scales = np.full((320, 3), 0.35, np.float32)
    bg = jnp.array([0.2, 0.4, 0.6])

    def grads(cfg):
        def loss(m, sc, o):
            out = rasterize(m, sc, s.quats, o, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.mean(jnp.abs(out["render"]))
        g = jax.grad(loss, argnums=(0, 1, 2))(
            s.means3d, jnp.asarray(scales), jnp.asarray(opac))
        return [np.asarray(x) for x in g]

    gT = grads(RasterConfig(method="tiled", max_dup=64, tile_capacity=256))
    gP = grads(RasterConfig(method="pallas", max_dup=64, tile_capacity=256))
    for a, b in zip(gT, gP):
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=2e-4 * scale + 1e-8, rtol=0)


# ---------- exact (virtual-tile) mode ----------

def _dense_scene():
    """Scene whose tiles exceed K=128 (multi-window coverage required)."""
    return make_toy_scene(seed=0, n=2048, n_cameras=1, width=128, height=96)


def test_exact_mode_matches_oracle_images_and_grads():
    """Tiles with count > K wrap onto several virtual tiles with state
    carried across windows; result must equal the (uncapped) oracle with
    ZERO tile overflow — the property padded mode cannot provide (max
    binned count here is ~3x K).  Ref: the CUDA rasterizer's uncapped
    per-tile ranges (SURVEY.md L0)."""
    s = _dense_scene()
    bg = jnp.array([0.1, 0.2, 0.3])
    cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16,
                       exact_extra=64)

    from street_sparse_3dgs_tpu.ops.binning import bin_gaussians
    from street_sparse_3dgs_tpu.ops.preprocess import project_gaussians
    proj = project_gaussians(s.means3d, s.scales, s.quats, s.opacities,
                             s.sh_coeffs, s.cameras[0], 3)
    bins = bin_gaussians(proj, 96, 128, 16, 128, exact_extra=64)
    assert int(jnp.max(bins.counts)) > 128      # multi-window really hit

    o = rasterize(s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs,
                  s.cameras[0], 3, bg, RasterConfig(method="oracle"))
    e = rasterize(s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs,
                  s.cameras[0], 3, bg, cfg)
    assert int(e["tile_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(e["render"]),
                               np.asarray(o["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(e["depth"]),
                               np.asarray(o["depth"]), atol=3e-5)

    def loss(method_cfg, m, sc, op):
        out = rasterize(m, sc, s.quats, op, s.sh_coeffs, s.cameras[0], 3,
                        bg, method_cfg)
        return (jnp.mean(out["render"] ** 2) + 0.3 * jnp.mean(out["depth"])
                + 0.1 * jnp.mean(out["alpha"] ** 2))

    go = jax.grad(lambda *a: loss(RasterConfig(method="oracle"), *a),
                  argnums=(0, 1, 2))(s.means3d, s.scales, s.opacities)
    ge = jax.grad(lambda *a: loss(cfg, *a),
                  argnums=(0, 1, 2))(s.means3d, s.scales, s.opacities)
    for name, a, b in zip(("means", "scales", "opac"), go, ge):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=3e-4 * scale, rtol=2e-3,
                                   err_msg=name)


def test_exact_mode_budget_overflow_counted():
    """Pairs beyond the exact_extra window budget stay counted (never
    silently dropped — repo invariant)."""
    s = _dense_scene()
    bg = jnp.zeros(3)
    out = rasterize(s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs,
                    s.cameras[0], 3, bg,
                    RasterConfig(method="pallas", tile_capacity=128,
                                 max_dup=16, exact_extra=2))
    assert int(out["tile_overflow"]) > 0


def test_exact_mode_tile_batch_bit_identical():
    """tb>1 shares the scratch state across subs of one program; must be
    bit-identical to tb=1 (same adds in the same order)."""
    s = _dense_scene()
    bg = jnp.array([0.3, 0.2, 0.1])
    outs = []
    for tb in (1, 4):
        cfg = RasterConfig(method="pallas", tile_capacity=128, max_dup=16,
                           exact_extra=64, tile_batch=tb)
        out = rasterize(s.means3d, s.scales, s.quats, s.opacities,
                        s.sh_coeffs, s.cameras[0], 3, bg, cfg)
        outs.append(np.asarray(out["render"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_exact_mode_termination_across_windows():
    """Termination must persist across WINDOWS (not just 128-blocks):
    opaque front gaussians kill every pixel in window 0; later windows of
    faint bait must not resurrect them, in fwd or bwd."""
    s = make_toy_scene(seed=5, n=640, n_cameras=1, width=64, height=48)
    rng = np.random.default_rng(0)
    opac = np.where(np.arange(640) < 100,
                    rng.uniform(0.9, 0.99, 640),
                    rng.uniform(0.006, 0.012, 640)).astype(np.float32)
    scales = np.full((640, 3), 0.35, np.float32)
    bg = jnp.array([0.2, 0.4, 0.6])

    def grads(cfg):
        def loss(m, sc, o):
            out = rasterize(m, sc, s.quats, o, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.mean(jnp.abs(out["render"]))
        g = jax.grad(loss, argnums=(0, 1, 2))(
            s.means3d, jnp.asarray(scales), jnp.asarray(opac))
        return [np.asarray(x) for x in g]

    gT = grads(RasterConfig(method="tiled", max_dup=64, tile_capacity=1024))
    gE = grads(RasterConfig(method="pallas", max_dup=64, tile_capacity=128,
                            exact_extra=256))
    for a, b in zip(gT, gE):
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=2e-4 * scale + 1e-8, rtol=0)


def test_exact_counts_grad_reduce_matches_sort():
    """grad_reduce='counts' (boundaries from per-rank emitted counts — no
    query rows, no re-key sort) must reproduce the query-row scheme's
    gradients; max_dup=4 forces tail-bucket grants into the accounting."""
    s = _dense_scene()
    bg = jnp.array([0.1, 0.2, 0.3])

    def gradfn(cfg):
        def loss(m, sc, op):
            out = rasterize(m, sc, s.quats, op, s.sh_coeffs, s.cameras[0],
                            3, bg, cfg)
            return jnp.mean(out["render"] ** 2) + 0.3 * jnp.mean(out["depth"])
        return jax.grad(loss, argnums=(0, 1, 2))(
            s.means3d, s.scales, s.opacities)

    g1 = gradfn(RasterConfig(method="pallas", tile_capacity=128, max_dup=4,
                             exact_extra=64))
    g2 = gradfn(RasterConfig(method="pallas", tile_capacity=128, max_dup=4,
                             exact_extra=64, grad_reduce="counts"))
    for name, a, b in zip(("means", "scales", "opac"), g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, atol=1e-4 * (np.abs(a).max() + 1e-9),
                                   err_msg=name)


def test_counts_reduce_requires_exact_mode():
    s = _dense_scene()
    with pytest.raises(ValueError, match="exact"):
        rasterize(s.means3d, s.scales, s.quats, s.opacities, s.sh_coeffs,
                  s.cameras[0], 3, jnp.zeros(3),
                  RasterConfig(method="pallas", grad_reduce="counts",
                               tile_capacity=128))


def test_exact_counts_bf16_bitcast_pack_bounded_deviation():
    """The pair-major counts-mode bf16 path packs channel pairs by BITCAST
    of adjacent bf16 lanes (round 5) — a different code path from the
    shift/or packer the padded path uses.  Forward bit-identical; grads
    within the documented per-pair bf16 rounding band of the f32 counts
    scheme."""
    s = _dense_scene()
    bg = jnp.array([0.1, 0.2, 0.3])

    def run(cfg):
        def loss(m, sc):
            out = rasterize(m, sc, s.quats, s.opacities, s.sh_coeffs,
                            s.cameras[0], 3, bg, cfg)
            return jnp.mean(out["render"] ** 2) + 0.1 * jnp.mean(
                out["depth"]), out["render"]

        (_, img), g = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(s.means3d, s.scales)
        return np.asarray(img), [np.asarray(x) for x in g]

    base = dict(method="pallas", tile_capacity=128, max_dup=4,
                exact_extra=64, grad_reduce="counts")
    img32, g32 = run(RasterConfig(**base))
    img16, g16 = run(RasterConfig(**base, grad_sort="bf16"))
    np.testing.assert_array_equal(img32, img16)
    for a, b in zip(g32, g16):
        gn = np.linalg.norm(a, axis=-1) if a.ndim > 1 else np.abs(a)
        mask = gn > 1e-6
        rel = (np.abs(a - b).max(axis=-1) if a.ndim > 1
               else np.abs(a - b))[mask] / (gn[mask] + 1e-12)
        assert np.median(rel) < 0.02
        assert np.all(np.isfinite(b))
