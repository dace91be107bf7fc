"""Adaptive density control: statistics, clone/split/prune, opacity reset.

Behavioral spec (``/root/reference/model/gaussian.py:130-349``):

- ``update_statistics``: for visible Gaussians (screen radius > 0) accumulate
  the absgrad norm scaled by max(H, W), bump observation counts, and track
  the max radius normalized by max(H, W).
- ``densify_and_prune`` every ``refine_every`` steps inside the refine
  window: Gaussians with mean screen-gradient >= ``densify_grad_thresh``
  are *cloned* (copy) if their max scale < ``densify_scale_thresh`` else
  *split* into ``num_splits`` samples drawn from the Gaussian itself with
  scales shrunk by ``0.8 * num_splits`` (the split parent is pruned).
  Pruning removes: opacity < ``min_opacity``, normalized max radius >
  ``prune_radii_ratio_thresh``, max scale > ``prune_scale_thresh`` — the
  opacity/scale checks also apply to the just-appended Gaussians. Adam
  moments: appended rows zeroed, pruned rows removed, step counts kept.
- ``reset_opacities`` every ``reset_opacities_every`` steps clamps opacities
  to ``min(opacity * 0.5, 2 * min_opacity)`` and zeroes the opacity group's
  Adam moments.

TPU redesign: everything operates on the fixed-capacity buffers. Clones and
splits are written into *free* slots found via cumsum ranking + scatter
(static shapes; XLA-compatible); "removal" just clears the alive bit. If the
free-slot budget would overflow, the function reports it and the host grows
capacity and retries (one recompile per growth).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.quaternion import quat_to_rotmat
from .gaussians import DensifyStats, GaussianModelState, GaussianParams, zero_stats
from .optimizer import AdamState, mask_moments


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    densify_grad_thresh: float
    densify_scale_thresh: float
    num_splits: int
    prune_radii_ratio_thresh: float
    prune_scale_thresh: float
    min_opacity: float


def update_statistics(
    stats: DensifyStats,
    radii: jnp.ndarray,  # [C] pixels
    absgrad: jnp.ndarray,  # [C, 2] pixel-unit absolute screen-grad sums
    height: int,
    width: int,
) -> DensifyStats:
    max_hw = float(max(height, width))
    radii_norm = radii / max_hw
    visible = radii > 0.0
    max_radii = jnp.where(
        visible, jnp.maximum(stats.max_radii, radii_norm), stats.max_radii
    )
    grads = jnp.linalg.norm(absgrad, axis=-1) * max_hw
    accum = stats.grad_norm_accum + jnp.where(visible, grads, 0.0)
    counts = stats.collecting_counts + visible.astype(jnp.float32)
    return DensifyStats(
        grad_norm_accum=accum, collecting_counts=counts, max_radii=max_radii
    )


def _scatter_set(base: jnp.ndarray, idx: jnp.ndarray, values) -> jnp.ndarray:
    """Scatter values at idx; out-of-range idx entries are dropped."""
    return base.at[idx].set(values, mode="drop")


def densify_and_prune(
    state: GaussianModelState,
    adam: AdamState,
    key: jnp.ndarray,
    cfg: DensifyConfig,
) -> Tuple[GaussianModelState, AdamState, Dict[str, jnp.ndarray], jnp.ndarray]:
    """One refine event. Returns (new_state, new_adam, info, overflow)."""
    params = state.params
    alive = state.alive
    stats = state.stats
    cap = state.capacity
    ns = cfg.num_splits
    arange = jnp.arange(cap, dtype=jnp.int32)

    scales = jnp.exp(params.log_scales)  # [C, 3]
    max_scale = jnp.max(scales, axis=-1)
    opac = jax.nn.sigmoid(params.logit_opacities)

    avg_grad = stats.grad_norm_accum / (stats.collecting_counts + 1e-8)
    avg_grad = jnp.nan_to_num(avg_grad, nan=0.0)
    high_grad = (avg_grad >= cfg.densify_grad_thresh) & alive
    big = max_scale >= cfg.densify_scale_thresh
    split_mask = big & high_grad
    clone_mask = (~big) & high_grad

    # prune mask over the *old* population (split parents are pruned too)
    low_op = opac < cfg.min_opacity
    large_radii = stats.max_radii > cfg.prune_radii_ratio_thresh
    large_scale = max_scale > cfg.prune_scale_thresh
    prune_old = (low_op | large_radii | large_scale | split_mask) & alive
    survivors = alive & ~prune_old

    free = ~survivors
    n_free = jnp.sum(free.astype(jnp.int32))
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    n_split = jnp.sum(split_mask.astype(jnp.int32))
    need = n_clone + ns * n_split
    overflow = need > n_free

    # rank r -> r-th free slot
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    table = jnp.full((cap,), cap, jnp.int32)
    table = _scatter_set(table, jnp.where(free, free_rank, cap), arange)

    def take_slot(ranks, valid):
        idx = jnp.where(valid, ranks, cap)
        return jnp.take(table, idx, mode="fill", fill_value=cap)

    src_of = jnp.full((cap,), cap, jnp.int32)
    is_clone_new = jnp.zeros((cap,), bool)
    is_split_new = jnp.zeros((cap,), bool)

    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    clone_tgt = take_slot(clone_rank, clone_mask)
    src_of = _scatter_set(src_of, clone_tgt, arange)
    is_clone_new = _scatter_set(is_clone_new, clone_tgt, True)

    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    for s in range(ns):
        r = n_clone + s * n_split + split_rank
        tgt = take_slot(r, split_mask)
        src_of = _scatter_set(src_of, tgt, arange)
        is_split_new = _scatter_set(is_split_new, tgt, True)

    is_new = is_clone_new | is_split_new
    src = jnp.where(is_new, src_of, arange)

    gathered: GaussianParams = jax.tree.map(lambda x: x[src], params)
    src_scales = jnp.exp(gathered.log_scales)

    # split transform: sample from the parent Gaussian, shrink scales
    eps = jax.random.normal(key, (cap, 3), jnp.float32)
    rot = quat_to_rotmat(gathered.quats)  # [C, 3, 3]
    offset = jnp.einsum("nij,nj->ni", rot, src_scales * eps)
    split_means = gathered.means + offset
    split_log_scales = jnp.log(
        jnp.maximum(src_scales / (0.8 * ns), 1e-12)
    )

    def merge(old, new_val):
        m = is_new.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new_val, old)

    sm = is_split_new.reshape((-1, 1))
    new_params = GaussianParams(
        means=merge(params.means, jnp.where(sm, split_means, gathered.means)),
        log_scales=merge(
            params.log_scales,
            jnp.where(sm, split_log_scales, gathered.log_scales),
        ),
        quats=merge(params.quats, gathered.quats),
        sh_0=merge(params.sh_0, gathered.sh_0),
        sh_rest=merge(params.sh_rest, gathered.sh_rest),
        logit_opacities=merge(
            params.logit_opacities, gathered.logit_opacities
        ),
    )

    # the reference applies the opacity/scale prune checks to appended rows
    new_opac = jax.nn.sigmoid(gathered.logit_opacities)
    new_max_scale = jnp.where(
        is_split_new,
        jnp.max(src_scales, axis=-1) / (0.8 * ns),
        jnp.max(src_scales, axis=-1),
    )
    new_low_op = is_new & (new_opac < cfg.min_opacity)
    new_large_scale = is_new & (new_max_scale > cfg.prune_scale_thresh)
    prune_new = new_low_op | new_large_scale
    alive_out = survivors | (is_new & ~prune_new)

    # Adam surgery: keep moments only for surviving old rows
    keep = survivors & ~is_new
    adam_out = mask_moments(adam, keep)

    # TB breakdown, incremental like the reference's prune_counts
    c0 = jnp.sum((low_op & alive).astype(jnp.int32)) + jnp.sum(
        new_low_op.astype(jnp.int32)
    )
    c1 = jnp.sum(((low_op | large_radii) & alive).astype(jnp.int32)) + jnp.sum(
        new_low_op.astype(jnp.int32)
    )
    c2 = jnp.sum(
        ((low_op | large_radii | large_scale) & alive).astype(jnp.int32)
    ) + jnp.sum(prune_new.astype(jnp.int32))

    info = {
        "split": n_split,
        "clone": n_clone,
        "prune_low_opacity": c0,
        "prune_large_radii": c1 - c0,
        "prune_large_scale": c2 - c1,
        "nbr_gaussians": jnp.sum(alive_out.astype(jnp.int32)),
    }

    new_state = GaussianModelState(
        params=new_params, alive=alive_out, stats=zero_stats(cap)
    )
    return new_state, adam_out, info, overflow


@functools.partial(jax.jit, static_argnames=("min_opacity",), donate_argnums=(0, 1))
def reset_opacities(
    state: GaussianModelState, adam: AdamState, min_opacity: float
) -> Tuple[GaussianModelState, AdamState]:
    """Clamp opacities down and zero the opacity group's Adam moments.
    Jitted (donated): called from the host loop every
    ``reset_opacities_every`` steps — eager ops here cost ~1 device RTT
    each on a remote-device link."""
    opac = jax.nn.sigmoid(state.params.logit_opacities)
    target = jnp.minimum(opac * 0.5, min_opacity * 2.0)
    target = jnp.clip(target, 1e-6, 1.0 - 1e-6)
    logit = jnp.log(target) - jnp.log1p(-target)
    new_params = dataclasses.replace(state.params, logit_opacities=logit)
    adam_out = mask_moments(
        adam, jnp.zeros_like(state.alive), group="logit_opacities"
    )
    new_state = dataclasses.replace(state, params=new_params)
    return new_state, adam_out
