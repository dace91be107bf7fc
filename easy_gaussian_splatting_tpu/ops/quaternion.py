"""Quaternion utilities (wxyz convention).

Behavioral spec: the reference normalizes the quaternion then builds the
rotation matrix (``/root/reference/model/utils.py:31-55``); the rasterizer
also receives *unnormalized* quats and normalizes inside the kernel
(``/root/reference/model/gaussian.py:82-87``).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalized_quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert already-normalized quaternions (wxyz, [..., 4]) to rotation
    matrices [..., 3, 3]."""
    if quat.shape[-1] != 4:
        raise ValueError(f"last dimension must be 4, got {quat.shape[-1]}")
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    mat = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z),
            2.0 * (x * y - w * z),
            2.0 * (x * z + w * y),
            2.0 * (x * y + w * z),
            1.0 - 2.0 * (x * x + z * z),
            2.0 * (y * z - w * x),
            2.0 * (x * z - w * y),
            2.0 * (y * z + w * x),
            1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return mat.reshape(quat.shape[:-1] + (3, 3))


def quat_to_rotmat(quat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions (wxyz) then convert to rotation matrices."""
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    quat = quat / jnp.maximum(norm, eps)
    return normalized_quat_to_rotmat(quat)
