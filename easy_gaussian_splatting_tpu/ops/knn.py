"""k-nearest-neighbor distances for Gaussian scale initialization.

Behavioral spec: the reference initializes per-Gaussian scales from the mean
distance to the 3 nearest neighbors, halved (``/root/reference/model/
gaussian.py:34-38``; sklearn call at ``/root/reference/model/utils.py:8-11``).

This implementation is a chunked brute-force top-k in JAX: the pairwise
distance blocks are [chunk, N] matmuls that map onto the TPU MXU, so for the
point-cloud sizes involved (1e5..5e6) it is far faster than a host kd-tree,
and it runs on-device at model init. A numpy fallback is provided for tiny
inputs without a device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_dists_device(points: jnp.ndarray, k: int, chunk: int) -> jnp.ndarray:
    n = points.shape[0]
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk - n
    pts_pad = jnp.pad(points, ((0, n_pad), (0, 0)))
    sq_norms = jnp.sum(points * points, axis=-1)  # [N]

    def body(i, out):
        q = jax.lax.dynamic_slice_in_dim(pts_pad, i * chunk, chunk)  # [c, 3]
        qn = jnp.sum(q * q, axis=-1)  # [c]
        # squared distances via the MXU: |q|^2 + |p|^2 - 2 q.p
        d2 = (
            qn[:, None]
            + sq_norms[None, :]
            - 2.0 * jnp.dot(q, points.T, preferred_element_type=jnp.float32)
        )  # [c, N]
        # exclude self (distance ~0 at own index); take k smallest.
        # k passes of min-extraction: far cheaper on TPU than lax.top_k,
        # which lowers to a full sort along the N axis.
        row_ids = i * chunk + jnp.arange(chunk)
        self_mask = row_ids[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        cols = jnp.arange(n)[None, :]
        mins = []
        for _ in range(k):
            m = jnp.min(d2, axis=1)  # [c]
            am = jnp.argmin(d2, axis=1)  # [c]
            mins.append(m)
            d2 = jnp.where(cols == am[:, None], jnp.inf, d2)
        dists = jnp.sqrt(jnp.maximum(jnp.stack(mins, axis=1), 0.0))
        return jax.lax.dynamic_update_slice_in_dim(out, dists, i * chunk, axis=0)

    out = jnp.zeros((n_chunks * chunk, k), jnp.float32)
    out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out[:n]


def knn_dists(points: np.ndarray, k: int = 3, chunk: int = 4096) -> np.ndarray:
    """Distances [N, k] to the k nearest neighbors (self excluded).

    Host KD-tree by default: init-time KNN is a one-shot O(N log N)
    problem, and the chunked MXU brute force is O(N^2) — measured
    round 4: cKDTree build+query at 3M points is 6.2 s on host, while
    the device path needs ~90 s at 1M and CRASHES the TPU worker at 3M
    (a [chunk, 3M]-lane program kills the worker; the 3M bench
    regression of rounds 1-3 traced here, not to the raster kernels).
    The device path remains as a scipy-free fallback for small clouds."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if n <= k:
        raise ValueError(f"need more than k={k} points, got {n}")
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        cKDTree = None
    if cKDTree is not None:
        d, _ = cKDTree(points).query(points, k=k + 1, workers=-1)
        return np.asarray(d[:, 1:], np.float32)  # drop self (distance 0)
    # fallback: each loop iteration materializes a [chunk, N] f32
    # distance block (+ XLA temporaries); bound it to ~2 GB
    max_chunk = max(64, int(512e6 // max(n, 1)) // 64 * 64)
    chunk = min(chunk, max_chunk, max(8, n))
    return np.asarray(_knn_dists_device(jnp.asarray(points), k, chunk))
