"""Unit tests for the pure math ops: quaternions, SH, LR schedule, k-NN,
SSIM, projection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.ndimage

from easy_gaussian_splatting_tpu.ops.quaternion import (
    normalized_quat_to_rotmat,
    quat_to_rotmat,
)
from easy_gaussian_splatting_tpu.ops.sh import (
    eval_sh,
    num_sh_bases,
    rgb_to_sh0,
    sh0_to_rgb,
    C0,
)
from easy_gaussian_splatting_tpu.ops.lr_schedule import log_lerp_schedule
from easy_gaussian_splatting_tpu.ops.knn import knn_dists
from easy_gaussian_splatting_tpu.ops.ssim import ssim
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
    quat_scale_to_covar,
)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(
            normalized_quat_to_rotmat(q)[0], np.eye(3), atol=1e-6
        )

    def test_known_rotation_90z(self):
        # 90 deg about z: w = cos(45deg), z = sin(45deg)
        s = np.sqrt(0.5)
        q = jnp.array([s, 0.0, 0.0, s])
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(quat_to_rotmat(q), expected, atol=1e-6)

    def test_normalization(self, rng):
        q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        r = quat_to_rotmat(q)
        eye = jnp.eye(3)[None]
        np.testing.assert_allclose(r @ jnp.swapaxes(r, -1, -2), np.broadcast_to(eye, r.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)

    def test_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        q = rng.normal(size=(16, 4)).astype(np.float32)
        ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        # scipy uses xyzw ordering
        theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestSH:
    def test_num_bases(self):
        assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]

    def test_deg0_constant(self, rng):
        sh = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, C0 * sh[:, 0, :], atol=1e-6)

    def test_rgb_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32))
        np.testing.assert_allclose(sh0_to_rgb(rgb_to_sh0(rgb)), rgb, atol=1e-6)

    def test_flat_matches_rank3(self, rng):
        # the renderer's flat form (rank-2 VJP intermediates; ops/sh.py
        # layout-pathology docs) must match eval_sh exactly, values AND
        # coefficient gradients, at every degree
        import jax

        from easy_gaussian_splatting_tpu.ops.sh import eval_sh_flat

        n = 33
        sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        sh_j = jnp.asarray(sh)
        dirs_j = jnp.asarray(dirs)
        for deg in range(4):
            ref = eval_sh(deg, sh_j, dirs_j)
            flat = eval_sh_flat(
                deg, sh_j[:, 0, :], sh_j[:, 1:, :].reshape(n, -1), dirs_j
            )
            np.testing.assert_allclose(
                np.asarray(flat), np.asarray(ref), atol=1e-6
            )

            def loss_ref(s):
                return jnp.sum(eval_sh(deg, s, dirs_j) ** 2)

            def loss_flat(s):
                return jnp.sum(
                    eval_sh_flat(
                        deg, s[:, 0, :], s[:, 1:, :].reshape(n, -1), dirs_j
                    )
                    ** 2
                )

            g_ref = jax.grad(loss_ref)(sh_j)
            g_flat = jax.grad(loss_flat)(sh_j)
            np.testing.assert_allclose(
                np.asarray(g_flat), np.asarray(g_ref), atol=1e-5
            )

    def test_orthonormality(self, rng):
        # MC integration of basis products over the sphere approximates I/(4pi)
        n = 200000
        v = rng.normal(size=(n, 3))
        v = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
        basis = []
        for i in range(16):
            sh = np.zeros((1, 16, 3), np.float32)
            sh[0, i, :] = 1.0
            vals = eval_sh(3, jnp.asarray(sh), jnp.asarray(v)[:, None, :].squeeze())
            basis.append(np.asarray(vals)[:, 0])
        basis = np.stack(basis, axis=1)  # [n, 16]
        gram = basis.T @ basis / n  # should approx I / (4pi) * 4pi = I/(4pi)*...
        gram = gram * 4.0 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


class TestLRSchedule:
    def test_endpoints(self):
        sched = log_lerp_schedule(1e-3, 1e-5, 100)
        np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-5)
        np.testing.assert_allclose(float(sched(1000)), 1e-5, rtol=1e-5)

    def test_log_linear_midpoint(self):
        sched = log_lerp_schedule(1e-3, 1e-5, 100)
        np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-4)


class TestKNN:
    def test_grid(self):
        # regular 1D line with spacing 1: nearest 2 neighbors at distance 1
        pts = np.stack(
            [np.arange(10, dtype=np.float32), np.zeros(10), np.zeros(10)], axis=1
        )
        d = knn_dists(pts, k=2)
        assert d.shape == (10, 2)
        np.testing.assert_allclose(d[1:-1, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[1:-1, 1], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[0], [1.0, 2.0], atol=1e-5)

    def test_matches_sklearn(self, rng):
        from sklearn.neighbors import NearestNeighbors

        pts = rng.normal(size=(500, 3)).astype(np.float32)
        ours = knn_dists(pts, k=3)
        nn = NearestNeighbors(n_neighbors=4).fit(pts)
        theirs, _ = nn.kneighbors(pts)
        np.testing.assert_allclose(ours, theirs[:, 1:], atol=1e-4)


def _ssim_numpy(a, b, data_range=1.0):
    """Independent numpy/scipy SSIM oracle (11x11 gaussian, sigma 1.5,
    valid region)."""
    k = 11
    sigma = 1.5
    ax = np.arange(k) - (k - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    g /= g.sum()
    kern = np.outer(g, g)

    def filt(x):
        out = scipy.ndimage.convolve(x, kern, mode="constant")
        r = (k - 1) // 2
        return out[r:-r, r:-r]

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch].astype(np.float64), b[..., ch].astype(np.float64)
        mx, my = filt(x), filt(y)
        vx = filt(x * x) - mx * mx
        vy = filt(y * y) - my * my
        cxy = filt(x * y) - mx * my
        m = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2)
        )
        vals.append(m.mean())
    return float(np.mean(vals))


class TestSSIM:
    def test_identical(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_matches_numpy_oracle(self, rng):
        a = rng.uniform(size=(48, 40, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(
            np.float32
        )
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        oracle = _ssim_numpy(a, b)
        np.testing.assert_allclose(ours, oracle, atol=1e-4)

    def test_differentiable(self, rng):
        a = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))
        g = jax.grad(lambda x: ssim(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))


class TestProjection:
    def _simple_camera(self, w=64, h=48):
        K = jnp.array([[50.0, 0.0, 32.0], [0.0, 50.0, 24.0], [0.0, 0.0, 1.0]])
        return CameraIntrinsics.from_K(K, w, h)

    def test_center_point_projects_to_principal_point(self):
        intr = self._simple_camera()
        means = jnp.array([[0.0, 0.0, 5.0]])
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.1)
        w2c = jnp.eye(4)
        out = project_gaussians(means, quats, scales, w2c, intr)
        np.testing.assert_allclose(out.means2d[0], [32.0, 24.0], atol=1e-5)
        np.testing.assert_allclose(out.depths[0], 5.0, atol=1e-6)
        assert out.radii[0] > 0

    def test_isotropic_conic(self):
        # isotropic gaussian on-axis: cov2d = (fx*s/z)^2 I + eps2d I
        intr = self._simple_camera()
        s = 0.2
        z = 4.0
        out = project_gaussians(
            jnp.array([[0.0, 0.0, z]]),
            jnp.array([[1.0, 0.0, 0.0, 0.0]]),
            jnp.full((1, 3), s),
            jnp.eye(4),
            intr,
        )
        expected_var = (50.0 * s / z) ** 2 + 0.3
        np.testing.assert_allclose(
            out.conics[0], [1.0 / expected_var, 0.0, 1.0 / expected_var],
            rtol=1e-5, atol=1e-7,
        )
        expected_radius = np.ceil(3.0 * np.sqrt(expected_var))
        np.testing.assert_allclose(out.radii[0], expected_radius)

    def test_behind_camera_culled(self):
        intr = self._simple_camera()
        out = project_gaussians(
            jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]]),
            jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1)),
            jnp.full((2, 3), 0.1),
            jnp.eye(4),
            intr,
        )
        assert out.radii[0] == 0.0
        assert out.radii[1] > 0.0

    def test_offscreen_culled(self):
        intr = self._simple_camera()
        out = project_gaussians(
            jnp.array([[100.0, 0.0, 1.0]]),  # far off to the side
            jnp.array([[1.0, 0.0, 0.0, 0.0]]),
            jnp.full((1, 3), 0.01),
            jnp.eye(4),
            intr,
        )
        assert out.radii[0] == 0.0

    def test_w2c_transform(self):
        intr = self._simple_camera()
        # camera shifted +1 in x: world point at x=1 maps to camera center
        w2c = jnp.eye(4).at[0, 3].set(-1.0)
        out = project_gaussians(
            jnp.array([[1.0, 0.0, 3.0]]),
            jnp.array([[1.0, 0.0, 0.0, 0.0]]),
            jnp.full((1, 3), 0.05),
            w2c,
            intr,
        )
        np.testing.assert_allclose(out.means2d[0], [32.0, 24.0], atol=1e-5)

    def test_covar_3d(self, rng):
        q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0.1, 2.0, size=(8, 3)).astype(np.float32))
        cov = quat_scale_to_covar(q, s)
        # symmetric PSD with det = prod(s^2)
        np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.det(np.asarray(cov)),
            np.prod(np.asarray(s) ** 2, axis=-1),
            rtol=1e-4,
        )

    def test_differentiable(self, rng):
        intr = self._simple_camera()
        means = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)) + jnp.array(
            [0.0, 0.0, 5.0]
        )

        def f(m):
            out = project_gaussians(
                m,
                jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (16, 1)),
                jnp.full((16, 3), 0.1),
                jnp.eye(4),
                intr,
            )
            return jnp.sum(out.means2d) + jnp.sum(out.conics)

        g = jax.grad(f)(means)
        assert np.all(np.isfinite(np.asarray(g)))
