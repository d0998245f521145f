import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.ops.rasterizer import render, render_depth
from transplat_tpu.ops.rasterizer.api import RasterizeConfig

REF_CFG = RasterizeConfig(mode="reference")
TILED_CFG = RasterizeConfig(mode="tiled", capacity=512, chunk=64, max_tiles_per_gaussian=32)


def make_camera(b=1):
    extr = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )
    near = jnp.full((b,), 0.5)
    far = jnp.full((b,), 100.0)
    bg = jnp.zeros((b, 3))
    return extr, intr, near, far, bg


def random_scene(key, g=256, sh_degree=2):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(k1, (g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(k2, (g, 1), minval=2.0, maxval=8.0),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(k3, (g, 3), minval=0.02, maxval=0.12)
    eye = jnp.eye(3)
    cov = jnp.einsum("gi,ij->gij", scales**2, eye)
    n = (sh_degree + 1) ** 2
    sh = jax.random.normal(k4, (g, 3, n)) * 0.3
    opac = jax.random.uniform(k5, (g,), minval=0.3, maxval=0.95)
    return means[None], cov[None], sh[None], opac[None]


class TestRasterizerForward:
    def test_single_gaussian_peak(self):
        """Opaque Gaussian at the image center: peak pixel = color."""
        extr, intr, near, far, bg = make_camera()
        means = jnp.array([[[0.0, 0.0, 4.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.04, (1, 1, 3, 3))
        # DC-only sh encoding color (0.8, 0.2, 0.4): coeff = (c - 0.5)/C0
        target = jnp.array([0.8, 0.2, 0.4])
        c0 = 0.28209479177387814
        sh = ((target - 0.5) / c0).reshape(1, 1, 3, 1)
        opac = jnp.array([[0.95]])
        out = render(
            extr, intr, near, far, (64, 64), bg, means, cov, sh, opac, cfg=REF_CFG
        )
        img = np.asarray(out.color[0])
        # Peak should be at the center, value = alpha_max_capped * color
        peak = img[31:33, 31:33].max(axis=(0, 1))
        np.testing.assert_allclose(peak, 0.95 * np.asarray(target), atol=0.02)

    def test_occlusion_order(self):
        """A near opaque red Gaussian must occlude a far green one."""
        extr, intr, near, far, bg = make_camera()
        means = jnp.array([[[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.09, (1, 2, 3, 3))
        c0 = 0.28209479177387814
        red = ((jnp.array([1.0, 0.0, 0.0]) - 0.5) / c0).reshape(1, 3, 1)
        green = ((jnp.array([0.0, 1.0, 0.0]) - 0.5) / c0).reshape(1, 3, 1)
        sh = jnp.stack([red, green], axis=1)[None].squeeze(0)[None]
        sh = jnp.concatenate([red[None], green[None]], axis=1)[None]
        sh = sh.reshape(1, 2, 3, 1)
        opac = jnp.array([[0.99, 0.99]])
        out = render(
            extr, intr, near, far, (32, 32), bg, means, cov, sh, opac, cfg=REF_CFG
        )
        center = np.asarray(out.color[0, 15, 15])
        assert center[0] > 0.85, center
        assert center[1] < 0.15, center

    def test_tiled_matches_reference(self):
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(0), g=300)
        ref = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=REF_CFG)
        tiled = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=TILED_CFG)
        assert int(tiled.overflow[0]) == 0
        np.testing.assert_allclose(
            np.asarray(tiled.color), np.asarray(ref.color), atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(tiled.radii), np.asarray(ref.radii))

    def test_tiled_matches_reference_nonsquare(self):
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(7), g=200)
        ref = render(extr, intr, near, far, (32, 64), bg, *scene, cfg=REF_CFG)
        tiled = render(extr, intr, near, far, (32, 64), bg, *scene, cfg=TILED_CFG)
        np.testing.assert_allclose(
            np.asarray(tiled.color), np.asarray(ref.color), atol=2e-5
        )

    def test_background_fills_empty(self):
        extr, intr, near, far, _ = make_camera()
        bg = jnp.array([[0.1, 0.2, 0.3]])
        means = jnp.array([[[100.0, 100.0, 5.0]]])  # far off-screen
        cov = jnp.broadcast_to(jnp.eye(3) * 0.01, (1, 1, 3, 3))
        sh = jnp.zeros((1, 1, 3, 1))
        opac = jnp.array([[0.9]])
        out = render(
            extr, intr, near, far, (16, 16), bg, means, cov, sh, opac, cfg=TILED_CFG
        )
        np.testing.assert_allclose(
            np.asarray(out.color[0]),
            np.broadcast_to(np.array([0.1, 0.2, 0.3]), (16, 16, 3)),
            atol=1e-6,
        )

    def test_behind_camera_culled(self):
        extr, intr, near, far, bg = make_camera()
        means = jnp.array([[[0.0, 0.0, -3.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.04, (1, 1, 3, 3))
        sh = jnp.ones((1, 1, 3, 1))
        opac = jnp.array([[0.9]])
        out = render(
            extr, intr, near, far, (16, 16), bg, means, cov, sh, opac, cfg=TILED_CFG
        )
        np.testing.assert_allclose(np.asarray(out.color), 0.0, atol=1e-6)
        assert float(out.radii[0, 0]) == 0.0


class TestRasterizerGradients:
    def test_tiled_grads_match_reference(self):
        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(1), g=120)

        def loss(cfg):
            def fn(m, c, s, o):
                out = render(
                    extr, intr, near, far, (32, 32), bg, m, c, s, o, cfg=cfg
                )
                img = out.color
                w = jnp.cos(jnp.arange(img.size).reshape(img.shape) * 0.37)
                return jnp.sum(img * w)

            return fn

        g_ref = jax.grad(loss(REF_CFG), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        g_tiled = jax.grad(loss(TILED_CFG), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        for a, b, name in zip(g_ref, g_tiled, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4, err_msg=name
            )

    def test_finite_difference_opacity(self):
        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(2), g=24)

        def f(o):
            out = render(
                extr, intr, near, far, (32, 32), bg, means, cov, sh, o, cfg=TILED_CFG
            )
            return jnp.sum(out.color**2)

        g = jax.grad(f)(opac)
        eps = 1e-3
        i = 5
        f_plus = f(opac.at[0, i].add(eps))
        f_minus = f(opac.at[0, i].add(-eps))
        fd = (f_plus - f_minus) / (2 * eps)
        np.testing.assert_allclose(float(g[0, i]), float(fd), rtol=5e-2, atol=1e-4)

    def test_finite_difference_means(self):
        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(3), g=24)

        def f(m):
            out = render(
                extr, intr, near, far, (32, 32), bg, m, cov, sh, opac, cfg=TILED_CFG
            )
            return jnp.sum(out.color**2)

        g = jax.grad(f)(means)
        eps = 1e-4
        i, d = 3, 0
        fd = (
            f(means.at[0, i, d].add(eps)) - f(means.at[0, i, d].add(-eps))
        ) / (2 * eps)
        np.testing.assert_allclose(float(g[0, i, d]), float(fd), rtol=5e-2, atol=1e-3)


class TestDepthRender:
    def test_flat_wall_depth(self):
        extr, intr, near, far, bg = make_camera()
        # Dense plane of opaque Gaussians at z=5.
        n = 12
        xs = jnp.linspace(-2.0, 2.0, n)
        xx, yy = jnp.meshgrid(xs, xs)
        means = jnp.stack([xx.ravel(), yy.ravel(), jnp.full(n * n, 5.0)], -1)[None]
        cov = jnp.broadcast_to(jnp.eye(3) * 0.05, (1, n * n, 3, 3))
        opac = jnp.full((1, n * n), 0.999)
        depth = render_depth(
            extr, intr, near, far, (32, 32), means, cov, opac, cfg=TILED_CFG
        )
        center = float(depth[0, 16, 16])
        # Scale-invariant rendering renormalizes by 1/near; expected z/near... the
        # feature itself is computed in unscaled camera space, so expect ~5.
        np.testing.assert_allclose(center, 5.0, rtol=0.05)
