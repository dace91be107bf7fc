"""Grouped Adam with densification-compatible moment surgery.

Behavioral spec: the reference builds one torch Adam over six named param
groups with distinct LRs (``/root/reference/model/gaussian.py:389-412``) and
performs optimizer-state surgery during density control: appended Gaussians
get zero moments, pruned rows are removed, and the per-group ``step`` count
is preserved (``/root/reference/model/gaussian.py:199-257``). On an
iteration where a group's parameter is re-created (densify: all six groups;
opacity reset: ``logit_opacities`` only), torch sees ``grad=None`` and skips
that group's update entirely — moments, step count, and weights untouched
(observed ordering at ``/root/reference/train.py:110-157``).

TPU redesign: functional Adam over the `GaussianParams` pytree; moments live
in identically-shaped capacity-padded buffers, so "surgery" is masked
zeroing; per-group step counters are scalars; per-group skips are traced
booleans so event steps don't need separate compilations. Matches torch
Adam defaults: betas (0.9, 0.999), eps 1e-8 added after the bias-corrected
sqrt.
"""

from __future__ import annotations

from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp

from .gaussians import PARAM_NAMES, GaussianParams

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-8


@flax.struct.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    steps: Dict[str, jnp.ndarray]  # per-group scalar int32


def init_adam_state(params: GaussianParams) -> AdamState:
    # distinct buffers for mu and nu (sharing one zeros tree breaks buffer
    # donation in the jitted train step)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    steps = {name: jnp.zeros((), jnp.int32) for name in PARAM_NAMES}
    return AdamState(mu=mu, nu=nu, steps=steps)


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],  # per-group learning rate (scalar)
    skips: Dict[str, jnp.ndarray] | None = None,  # per-group bool: skip update
) -> tuple[GaussianParams, AdamState]:
    new_params = {}
    new_mu = {}
    new_nu = {}
    new_steps = {}
    for name in PARAM_NAMES:
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = getattr(state.mu, name)
        nu = getattr(state.nu, name)
        step = state.steps[name]
        skip = (
            jnp.asarray(False)
            if skips is None or name not in skips
            else jnp.asarray(skips[name])
        )

        step1 = step + 1
        mu1 = BETA1 * mu + (1.0 - BETA1) * g
        nu1 = BETA2 * nu + (1.0 - BETA2) * g * g
        t = step1.astype(jnp.float32)
        mu_hat = mu1 / (1.0 - BETA1**t)
        nu_hat = nu1 / (1.0 - BETA2**t)
        upd = lrs[name] * mu_hat / (jnp.sqrt(nu_hat) + EPS)
        p1 = p - upd

        keep = skip
        new_params[name] = jnp.where(keep, p, p1)
        new_mu[name] = jnp.where(keep, mu, mu1)
        new_nu[name] = jnp.where(keep, nu, nu1)
        new_steps[name] = jnp.where(keep, step, step1)

    return (
        GaussianParams(**new_params),
        AdamState(
            mu=GaussianParams(**new_mu),
            nu=GaussianParams(**new_nu),
            steps=new_steps,
        ),
    )


def mask_moments(
    state: AdamState, keep_mask: jnp.ndarray, group: str | None = None
) -> AdamState:
    """Zero the Adam moments where ``keep_mask`` is False (surgery for
    densify/prune/opacity-reset). ``group=None`` applies to all groups."""

    def apply(tree: GaussianParams) -> GaussianParams:
        out = {}
        for name in PARAM_NAMES:
            x = getattr(tree, name)
            if group is not None and name != group:
                out[name] = x
            else:
                m = keep_mask.reshape((-1,) + (1,) * (x.ndim - 1))
                out[name] = jnp.where(m, x, 0.0)
        return GaussianParams(**out)

    return AdamState(mu=apply(state.mu), nu=apply(state.nu), steps=state.steps)


def permute_adam_state(state: AdamState, perm) -> AdamState:
    """Apply a row permutation/selection to the moment buffers (capacity
    compaction keeps moments aligned with their Gaussians)."""
    take = lambda x: x[perm]
    return AdamState(
        mu=jax.tree.map(take, state.mu),
        nu=jax.tree.map(take, state.nu),
        steps=state.steps,
    )


def grow_adam_state(state: AdamState, extra: int) -> AdamState:
    """Pad moment buffers for capacity growth (new rows zero)."""

    def pad(x):
        return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))

    return AdamState(
        mu=jax.tree.map(pad, state.mu),
        nu=jax.tree.map(pad, state.nu),
        steps=state.steps,
    )
