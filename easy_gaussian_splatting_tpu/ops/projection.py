"""EWA projection: 3D Gaussians -> screen-space 2D Gaussians.

This is stage (1) of the rendering pipeline the reference delegates to
gsplat's CUDA kernels (contract documented at ``/root/reference/model/
gaussian.py:353-374``): world->camera transform, perspective projection,
3D covariance from quat+scale via R.S.S^T.R^T, EWA projection through the
pinhole Jacobian -> 2D covariance -> conic + ~3-sigma radius + depth, with
near-plane and frustum culling (radius == 0 => culled).

Everything here is vectorized over N and differentiable by JAX autodiff —
elementwise math maps straight onto the TPU VPU; there is no need for a
hand-written kernel at this stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quaternion import quat_to_rotmat

# Defaults matching the pinned external rasterizer the reference uses.
NEAR_PLANE = 0.01
FAR_PLANE = 1e10
EPS2D = 0.3  # screen-space blur added to the 2D covariance diagonal
RADIUS_CLIP = 0.0


class CameraIntrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def from_K(K: jnp.ndarray, width: int, height: int) -> "CameraIntrinsics":
        return CameraIntrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], width, height)


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians. All [N, ...]; invalid entries have radius 0."""

    means2d: jnp.ndarray  # [N, 2] pixel coords
    conics: jnp.ndarray  # [N, 3] (a, b, c) of the inverse 2D covariance
    depths: jnp.ndarray  # [N] camera-space z
    radii: jnp.ndarray  # [N] float pixel radius (0 => culled)
    cam_means: jnp.ndarray  # [N, 3] camera-space centers


def quat_scale_to_covar(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """3D covariance from (wxyz) quats and per-axis scales: R S S^T R^T."""
    R = quat_to_rotmat(quats)  # [N, 3, 3]
    M = R * scales[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def _camera_covar_upper(
    quats: jnp.ndarray,  # [N, 4] wxyz (unnormalized)
    scales: jnp.ndarray,  # [N, 3]
    R_cw: jnp.ndarray,  # [3, 3]
    eps: float = 1e-12,
):
    """Upper triangle (s00,s01,s02,s11,s12,s22) of R_cw (R S S^T R^T) R_cw^T
    as six [N] arrays.

    Tiny batched [N,3,3] matmuls lower onto the TPU as "convolution fusion"
    passes over a T(4,128)-tiled layout and cost ~6 ms/step (fwd+VJP) at
    N=131k; expanding the quadratic form elementwise keeps the whole thing
    one fused VPU pass."""
    norm = jnp.linalg.norm(quats, axis=-1, keepdims=True)
    q = quats / jnp.maximum(norm, eps)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation matrix rows (r[i][j] = R[:, i, j]) as [N] arrays
    r = (
        (1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y)),
        (2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - w * x)),
        (2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 - 2.0 * (x * x + y * y)),
    )
    # Q = R_cw @ R, with R_cw entries as traced scalars
    Q = [
        [
            R_cw[i, 0] * r[0][j] + R_cw[i, 1] * r[1][j] + R_cw[i, 2] * r[2][j]
            for j in range(3)
        ]
        for i in range(3)
    ]
    s2 = scales * scales  # [N, 3]
    s2c = (s2[:, 0], s2[:, 1], s2[:, 2])

    def entry(i, l):
        return (
            s2c[0] * Q[i][0] * Q[l][0]
            + s2c[1] * Q[i][1] * Q[l][1]
            + s2c[2] * Q[i][2] * Q[l][2]
        )

    return entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2)


def project_gaussians(
    means: jnp.ndarray,  # [N, 3] world
    quats: jnp.ndarray,  # [N, 4] wxyz (unnormalized ok)
    scales: jnp.ndarray,  # [N, 3] positive
    w2c: jnp.ndarray,  # [4, 4]
    intr: CameraIntrinsics,
    near_plane: float = NEAR_PLANE,
    far_plane: float = FAR_PLANE,
    eps2d: float = EPS2D,
    radius_clip: float = RADIUS_CLIP,
) -> ProjectedGaussians:
    """Project 3D Gaussians to screen space (EWA splatting)."""
    R_cw = w2c[:3, :3]
    t_cw = w2c[:3, 3]

    # world -> camera, columnwise with traced-scalar matrix entries: the
    # batched ``means @ R_cw.T + t_cw`` form triggers the same pathological
    # lane-padded materialization as the covariance matmuls (see
    # _camera_covar_upper) — columnwise [N] math keeps it one fused pass
    mx, my_, mz = means[:, 0], means[:, 1], means[:, 2]
    x = R_cw[0, 0] * mx + R_cw[0, 1] * my_ + R_cw[0, 2] * mz + t_cw[0]
    y = R_cw[1, 0] * mx + R_cw[1, 1] * my_ + R_cw[1, 2] * mz + t_cw[1]
    z = R_cw[2, 0] * mx + R_cw[2, 1] * my_ + R_cw[2, 2] * mz + t_cw[2]
    p_cam = jnp.stack([x, y, z], axis=1)  # [N, 3]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)

    # 3D covariance in camera frame, elementwise (see _camera_covar_upper)
    s00, s01, s02, s11, s12, s22 = _camera_covar_upper(quats, scales, R_cw)

    # Pinhole Jacobian with the standard EWA frustum clamp: x/z, y/z limited
    # to 1.3 * tan(fov/2) so off-screen Gaussians don't blow up the Jacobian.
    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy
    tan_fovx = 0.5 * intr.width / fx
    tan_fovy = 0.5 * intr.height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(x / zsafe, -lim_x, lim_x) * z
    ty = jnp.clip(y / zsafe, -lim_y, lim_y) * z

    rz = 1.0 / zsafe
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]  -> cov2d = J S J^T
    # with S = covar_cam. Expand explicitly (cheaper than batched matmul and
    # maps onto the VPU as pure elementwise math).
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    # row0 = (j00, 0, j02) ; row1 = (0, j11, j12)
    c00 = j00 * (j00 * s00 + j02 * s02) + j02 * (j00 * s02 + j02 * s22)
    c01 = j00 * (j11 * s01 + j12 * s02) + j02 * (j11 * s12 + j12 * s22)
    c11 = j11 * (j11 * s11 + j12 * s12) + j12 * (j11 * s12 + j12 * s22)

    # screen-space blur
    c00 = c00 + eps2d
    c11 = c11 + eps2d

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det <= 0.0, 1.0, det)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    # ~3-sigma radius from the larger eigenvalue of the 2D covariance
    b = 0.5 * (c00 + c11)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    mean2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], axis=-1)

    valid = (z > near_plane) & (z < far_plane) & (det > 0.0)
    # frustum cull: bounding box entirely off-screen
    inside = (
        (mean2d[:, 0] + radius > 0.0)
        & (mean2d[:, 0] - radius < intr.width)
        & (mean2d[:, 1] + radius > 0.0)
        & (mean2d[:, 1] - radius < intr.height)
    )
    valid = valid & inside & (radius > radius_clip)
    radius = jnp.where(valid, radius, 0.0)

    return ProjectedGaussians(
        means2d=mean2d,
        conics=conic,
        depths=z,
        radii=radius,
        cam_means=p_cam,
    )
