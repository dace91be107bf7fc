"""Tests for the oracle rasterizer: forward semantics, hand-derived VJP vs
autodiff, absgrad side-channel, early-stop behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.ops.rasterize_ref import (
    rasterize,
    rasterize_sorted,
    rasterize_sorted_autodiff,
    ALPHA_THRESH,
)

H, W = 24, 32


def _single_gaussian(cx=16.0, cy=12.0, var=9.0, opac=0.7, color=(1.0, 0.2, 0.1)):
    means2d = jnp.array([[cx, cy]], jnp.float32)
    conics = jnp.array([[1.0 / var, 0.0, 1.0 / var]], jnp.float32)
    colors = jnp.array([color], jnp.float32)
    opacities = jnp.array([opac], jnp.float32)
    return means2d, conics, colors, opacities


def _random_scene(rng, n=40):
    means2d = jnp.asarray(
        rng.uniform([-4, -4], [W + 4, H + 4], size=(n, 2)).astype(np.float32)
    )
    # random PSD conics from random 2x2 factors
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * 0.4
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 2.0
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    conics = np.stack(
        [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det], axis=-1
    )
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.1, 0.95, size=(n,)).astype(np.float32)
    depths = rng.uniform(1.0, 10.0, size=(n,)).astype(np.float32)
    return (
        means2d,
        jnp.asarray(conics.astype(np.float32)),
        jnp.asarray(colors),
        jnp.asarray(opacities),
        jnp.asarray(depths),
    )


class TestForward:
    def test_single_gaussian_center_alpha(self):
        m2d, con, col, opa = _single_gaussian()
        bg = jnp.zeros(3)
        img, alpha = rasterize(
            m2d, con, col, opa, jnp.array([1.0]), bg, jnp.zeros((1, 2)), H, W
        )
        # pixel (16, 12) has center at (16.5, 12.5): sigma = 0.5*(2*0.5^2)/9
        d = 0.5
        sigma = 0.5 * (d * d / 9.0 + d * d / 9.0)
        expected_alpha = 0.7 * np.exp(-sigma)
        np.testing.assert_allclose(alpha[12, 16], expected_alpha, rtol=1e-5)
        np.testing.assert_allclose(
            img[12, 16], expected_alpha * np.array([1.0, 0.2, 0.1]), rtol=1e-5
        )

    def test_background_blend(self):
        m2d, con, col, opa = _single_gaussian(opac=0.5)
        bg = jnp.array([0.0, 0.0, 1.0])
        img, alpha = rasterize(
            m2d, con, col, opa, jnp.array([1.0]), bg, jnp.zeros((1, 2)), H, W
        )
        # far corner: no gaussian -> pure background
        np.testing.assert_allclose(img[0, 0], [0.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(alpha[0, 0], 0.0, atol=1e-6)

    def test_depth_ordering_occlusion(self):
        # two coincident gaussians; the nearer one dominates
        m2d = jnp.array([[16.0, 12.0], [16.0, 12.0]], jnp.float32)
        con = jnp.array([[0.5, 0.0, 0.5]] * 2, jnp.float32)
        col = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        opa = jnp.array([0.9, 0.9], jnp.float32)
        bg = jnp.zeros(3)
        # red at depth 1 (front), green at depth 2
        img1, _ = rasterize(
            m2d, con, col, opa, jnp.array([1.0, 2.0]), bg, jnp.zeros((2, 2)), H, W
        )
        assert img1[12, 16, 0] > img1[12, 16, 1]
        # swap depths -> green in front
        img2, _ = rasterize(
            m2d, con, col, opa, jnp.array([2.0, 1.0]), bg, jnp.zeros((2, 2)), H, W
        )
        assert img2[12, 16, 1] > img2[12, 16, 0]
        # compositing math: front weight a, back weight (1-a)*a
        a = float(np.asarray(_alpha_at_center(con, opa)))
        np.testing.assert_allclose(img1[12, 16, 0], a, rtol=1e-5)
        np.testing.assert_allclose(img1[12, 16, 1], (1 - a) * a, rtol=1e-5)

    def test_alpha_threshold_skips(self):
        # opacity below 1/255 -> no contribution at all
        m2d, con, col, _ = _single_gaussian()
        opa = jnp.array([ALPHA_THRESH * 0.9], jnp.float32)
        img, alpha = rasterize(
            m2d, con, col, opa, jnp.array([1.0]), jnp.zeros(3),
            jnp.zeros((1, 2)), H, W,
        )
        np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-7)

    def test_early_stop_transmittance_floor(self, rng):
        # many opaque coincident gaussians: T should stop near 1e-4, not 0
        n = 64
        m2d = jnp.tile(jnp.array([[16.0, 12.0]], jnp.float32), (n, 1))
        con = jnp.tile(jnp.array([[2.0, 0.0, 2.0]], jnp.float32), (n, 1))
        col = jnp.ones((n, 3), jnp.float32)
        opa = jnp.full((n,), 0.99, jnp.float32)
        depths = jnp.arange(n, dtype=jnp.float32)
        img, alpha = rasterize(
            m2d, con, col, opa, depths, jnp.zeros(3), jnp.zeros((n, 2)), H, W
        )
        t_final = 1.0 - float(alpha[12, 16])
        assert 0 < t_final < 1e-2
        # image value bounded by 1 (energy conservation)
        assert float(img[12, 16, 0]) <= 1.0 + 1e-5

    def test_chunk_size_invariance(self, rng):
        scene = _random_scene(rng)
        m2d, con, col, opa, dep = scene
        order = jnp.argsort(dep)
        args = (m2d[order], con[order], col[order], opa[order])
        img1, t1 = rasterize_sorted(*args, jnp.zeros((40, 2)), H, W, 7)
        img2, t2 = rasterize_sorted(*args, jnp.zeros((40, 2)), H, W, 40)
        np.testing.assert_allclose(img1, img2, atol=1e-5)
        np.testing.assert_allclose(t1, t2, atol=1e-5)


def _alpha_at_center(con, opa):
    d = 0.5
    sigma = 0.5 * (con[0, 0] * d * d + con[0, 2] * d * d) + con[0, 1] * d * d
    return opa[0] * jnp.exp(-sigma)


class TestBackward:
    def test_manual_vjp_matches_autodiff(self, rng):
        m2d, con, col, opa, dep = _random_scene(rng)
        order = jnp.argsort(dep)
        sm2d, scon, scol, sopa = m2d[order], con[order], col[order], opa[order]
        g_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
        g_t = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))

        def loss_manual(a, b, c, d):
            img, t = rasterize_sorted(a, b, c, d, jnp.zeros((40, 2)), H, W, 16)
            return jnp.sum(img * g_img) + jnp.sum(t * g_t)

        def loss_auto(a, b, c, d):
            img, t = rasterize_sorted_autodiff(a, b, c, d, H, W, 16)
            return jnp.sum(img * g_img) + jnp.sum(t * g_t)

        gm = jax.grad(loss_manual, argnums=(0, 1, 2, 3))(sm2d, scon, scol, sopa)
        ga = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(sm2d, scon, scol, sopa)
        for x, y, name in zip(gm, ga, ["m2d", "conic", "color", "opac"]):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_absgrad_bounds_net_grad(self, rng):
        m2d, con, col, opa, dep = _random_scene(rng)
        order = jnp.argsort(dep)
        dummy = jnp.zeros((40, 2))

        def loss(a, d):
            img, t = rasterize_sorted(
                a, con[order], col[order], opa[order], d, H, W, 16
            )
            return jnp.sum(img**2)

        g_m2d, absgrad = jax.grad(loss, argnums=(0, 1))(m2d[order], dummy)
        absgrad = np.asarray(absgrad)
        g_m2d = np.asarray(g_m2d)
        assert np.all(absgrad >= 0)
        # sum of per-pixel |contributions| >= |sum of contributions|
        assert np.all(absgrad - np.abs(g_m2d) >= -1e-5)
        # and strictly larger somewhere (cancellation happens)
        assert np.any(absgrad > np.abs(g_m2d) + 1e-6)

    def test_finite_differences(self, rng):
        # small scene, check d loss / d opacity against central differences
        m2d, con, col, opa, dep = _random_scene(rng, n=6)
        order = jnp.argsort(dep)
        sm2d, scon, scol, sopa = m2d[order], con[order], col[order], opa[order]

        def loss(o):
            img, _ = rasterize_sorted(
                sm2d, scon, scol, o, jnp.zeros((6, 2)), H, W, 3
            )
            return jnp.sum(img**2)

        g = np.asarray(jax.grad(loss)(sopa))
        eps = 1e-3
        for i in range(6):
            op = np.asarray(sopa).copy()
            om = op.copy()
            op[i] += eps
            om[i] -= eps
            fd = (float(loss(jnp.asarray(op))) - float(loss(jnp.asarray(om)))) / (
                2 * eps
            )
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-3)

    def test_grads_through_full_rasterize(self, rng):
        # gradient flows through sort/gather + background blend
        m2d, con, col, opa, dep = _random_scene(rng)
        bg = jnp.array([0.2, 0.3, 0.4])

        def loss(m, c, k, o, b):
            img, _ = rasterize(m, c, k, o, dep, b, jnp.zeros((40, 2)), H, W)
            return jnp.mean((img - 0.5) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m2d, con, col, opa, bg)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(grads[4]) != 0.0)  # bg receives gradient
