"""Gaussian parameter state: a fixed-capacity, alive-masked pytree.

Behavioral spec (``/root/reference/model/gaussian.py:13-91``): six learnable
per-Gaussian tensors — ``means [N,3]``, ``log_scales [N,3]`` (init: log of
half the mean 3-NN distance), ``quats [N,4]`` (wxyz, identity init),
``sh_0 [N,1,3]`` (DC from RGB), ``sh_rest [N,(K+1)^2-1,3]`` (zeros),
``logit_opacities [N]`` (logit of 0.8) — plus densify/prune statistics
buffers.

TPU-first redesign: XLA requires static shapes, so instead of torch's
dynamically growing tensors the N Gaussians live in capacity-``C`` padded
buffers with an ``alive`` mask. Clone/split/prune become masked scatters
(see ``density.py``); when the population approaches capacity the host
re-pads to the next power of two (one recompile per growth event).
"""

from __future__ import annotations

from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_dists
from ..ops.sh import num_sh_bases, rgb_to_sh0

PARAM_NAMES = (
    "means",
    "log_scales",
    "quats",
    "sh_0",
    "sh_rest",
    "logit_opacities",
)


@flax.struct.dataclass
class GaussianParams:
    means: jnp.ndarray  # [C, 3]
    log_scales: jnp.ndarray  # [C, 3]
    quats: jnp.ndarray  # [C, 4] wxyz
    sh_0: jnp.ndarray  # [C, 1, 3]
    sh_rest: jnp.ndarray  # [C, K-1, 3]
    logit_opacities: jnp.ndarray  # [C]


@flax.struct.dataclass
class DensifyStats:
    """Densification statistics (``/root/reference/model/gaussian.py:56-64``):
    accumulated screen-gradient norms, per-Gaussian observation counts, and
    max normalized screen radii since the last refine."""

    grad_norm_accum: jnp.ndarray  # [C]
    collecting_counts: jnp.ndarray  # [C]
    max_radii: jnp.ndarray  # [C] (normalized by max(H, W))


@flax.struct.dataclass
class GaussianModelState:
    params: GaussianParams
    alive: jnp.ndarray  # [C] bool
    stats: DensifyStats

    @property
    def capacity(self) -> int:
        return self.params.means.shape[0]

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def zero_stats(capacity: int) -> DensifyStats:
    # distinct buffers per field so jit buffer donation stays legal
    return DensifyStats(
        grad_norm_accum=jnp.zeros((capacity,), jnp.float32),
        collecting_counts=jnp.zeros((capacity,), jnp.float32),
        max_radii=jnp.zeros((capacity,), jnp.float32),
    )


def _round_up_capacity(n: int) -> int:
    """Smallest ladder capacity >= n. Rungs are pow2 AND 1.5*pow2
    (1024, 1536, 2048, 3072, ...): every per-capacity cost (binning grid,
    sort domain, argsorts) scales with the rung, and pure pow2 wastes up
    to 2x right after a round-up (e.g. 1.3M -> 2.1M). Nothing requires
    pow2 — capacities only need to be static ints; the denser ladder's
    extra shapes hit the persistent compilation cache on repeats."""
    cap = 1024
    while True:
        if cap >= n:
            return cap
        if cap + cap // 2 >= n:
            return cap + cap // 2
        cap *= 2


def init_gaussian_state(
    xyzs: np.ndarray,  # [N, 3] float
    rgbs: np.ndarray,  # [N, 3] uint8
    sh_degree: int,
    capacity: int | None = None,
    init_opacity: float = 0.8,
) -> GaussianModelState:
    """Initialize from a point cloud, reproducing the reference's init:
    scales = mean 3-NN distance / 2 (log-stored), identity quats, DC SH from
    RGB, opacity 0.8 (logit-stored)."""
    n = xyzs.shape[0]
    if capacity is None:
        capacity = _round_up_capacity(int(n * 1.3))
    if capacity < n:
        raise ValueError(f"capacity {capacity} < number of points {n}")

    dists = knn_dists(np.asarray(xyzs, np.float32), k=3)  # [N, 3]
    avg_dist = dists.mean(axis=1, keepdims=True)  # [N, 1]
    scales = np.repeat(avg_dist, 3, axis=1) / 2.0
    log_scales = np.log(np.maximum(scales, 1e-12))

    dim_sh = num_sh_bases(sh_degree)
    sh_0 = np.asarray(rgb_to_sh0(np.asarray(rgbs, np.float32) / 255.0))[:, None, :]
    sh_rest = np.zeros((n, dim_sh - 1, 3), np.float32)

    logit_op = float(np.log(init_opacity) - np.log1p(-init_opacity))

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0

    params = GaussianParams(
        means=pad(np.asarray(xyzs, np.float32)),
        log_scales=pad(log_scales),
        # dead slots keep identity quats so projection math stays finite
        quats=jnp.asarray(
            np.concatenate(
                [quats, np.tile([[1.0, 0, 0, 0]], (capacity - n, 1))], 0
            ).astype(np.float32)
        ),
        sh_0=pad(sh_0),
        sh_rest=pad(sh_rest),
        logit_opacities=pad(np.full((n,), logit_op, np.float32)),
    )
    alive = jnp.asarray(np.arange(capacity) < n)
    return GaussianModelState(params=params, alive=alive, stats=zero_stats(capacity))


def grow_capacity(state: GaussianModelState, new_capacity: int) -> GaussianModelState:
    """Re-pad all buffers to a larger capacity (host-side; triggers one
    recompile of the jitted steps for the new shape)."""
    old = state.capacity
    if new_capacity <= old:
        raise ValueError(f"new capacity {new_capacity} <= current {old}")
    extra = new_capacity - old

    def pad(x):
        pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    params = GaussianParams(
        means=pad(state.params.means),
        log_scales=pad(state.params.log_scales),
        quats=jnp.concatenate(
            [
                state.params.quats,
                jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (extra, 1)),
            ],
            axis=0,
        ),
        sh_0=pad(state.params.sh_0),
        sh_rest=pad(state.params.sh_rest),
        logit_opacities=pad(state.params.logit_opacities),
    )
    return GaussianModelState(
        params=params,
        alive=pad(state.alive),
        stats=DensifyStats(
            grad_norm_accum=pad(state.stats.grad_norm_accum),
            collecting_counts=pad(state.stats.collecting_counts),
            max_radii=pad(state.stats.max_radii),
        ),
    )


def compact_capacity(
    state: GaussianModelState, new_capacity: int
) -> tuple[GaussianModelState, jnp.ndarray]:
    """Permute alive rows to the buffer front and shrink to
    ``new_capacity`` (host-side; one recompile of the jitted steps).

    The inverse of :func:`grow_capacity`, for post-pruning phases: every
    per-capacity cost — binning's [C, M] key grid, the (tile, rank) sort
    domain C*M, the depth argsorts, projection/SH — scales with capacity,
    not with the alive count, so a heavily pruned population wastes
    proportional work until compacted. Row order among alive Gaussians is
    preserved (no semantics depend on slot order; this just keeps
    checkpoints and logs stable).

    Returns (new_state, perm) where ``perm`` is the row permutation to
    apply to any aligned per-Gaussian buffers (e.g. Adam moments)."""
    alive = state.alive
    n_alive = int(jnp.sum(alive.astype(jnp.int32)))
    if new_capacity < n_alive:
        raise ValueError(
            f"new capacity {new_capacity} < alive count {n_alive}"
        )
    if new_capacity > state.capacity:
        raise ValueError(
            f"new capacity {new_capacity} > current {state.capacity}; "
            "use grow_capacity"
        )
    # stable sort by deadness: alive rows first, original order kept
    perm = jnp.argsort(jnp.logical_not(alive), stable=True)[:new_capacity]

    def take(x):
        return x[perm]

    return (
        GaussianModelState(
            params=jax.tree.map(take, state.params),
            alive=take(alive),
            stats=jax.tree.map(take, state.stats),
        ),
        perm,
    )


def compact_for_inference(state: GaussianModelState) -> GaussianModelState:
    """Shrink a loaded checkpoint to the smallest ladder capacity holding
    its alive population (forward-only consumers: eval CLI, viewer).

    Checkpoints carry the training capacity (1.3x growth headroom plus
    any post-prune dead slots); every per-capacity render cost —
    projection, SH eval, depth argsort, binning keys — scales with
    capacity, so a one-time host-side compaction buys 20-30% render
    latency at typical end-of-training occupancy for free. Dead slots
    have zero opacity and are never binned, so outputs are identical."""
    n_alive = int(jnp.sum(state.alive.astype(jnp.int32)))
    want = _round_up_capacity(max(n_alive, 1))
    if want >= state.capacity:
        return state
    return compact_capacity(state, want)[0]


def params_as_dict(params: GaussianParams) -> Dict[str, jnp.ndarray]:
    return {name: getattr(params, name) for name in PARAM_NAMES}


def params_from_dict(d: Dict[str, jnp.ndarray]) -> GaussianParams:
    return GaussianParams(**{name: d[name] for name in PARAM_NAMES})
