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
