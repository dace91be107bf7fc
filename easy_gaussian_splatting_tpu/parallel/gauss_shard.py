"""Gaussian-sharded training: parameters, optimizer moments, and densify
statistics sharded across chips (ZeRO-style), combined with image-stripe
compute sharding.

This is the scaling path for scenes whose Gaussian population (10M+) does
not fit one chip's HBM next to its optimizer state:

- each chip *stores* 1/n of every per-Gaussian array (params, Adam mu/nu,
  densify statistics);
- for compute, parameters are ``all_gather``-ed over ICI (bandwidth-cheap
  relative to HBM capacity), and each chip renders its image stripe
  exactly like ``shard.py``;
- the backward produces full-population gradients per chip (for its
  stripe); a ``psum_scatter`` (reduce-scatter) simultaneously sums the
  stripe contributions and re-shards them, so each chip updates only its
  parameter shard — the collective cost is one all-gather + one
  reduce-scatter per step, the canonical ZeRO/FSDP exchange;
- densification runs DEVICE-RESIDENT and shard-local
  (:func:`make_sharded_densify_step`): each chip clones/splits/prunes
  within its own capacity shard (slot position carries no semantics, so
  filling shard-local free slots is equivalent to the reference's global
  append, ``/root/reference/model/gaussian.py:199-257``), with info
  counts and the overflow flag ``psum``-aggregated. No host gather: at
  the 10M-Gaussian scale a gather/reshard would move multi-GB over PCIe
  every ``refine_every`` steps.

Works with both the oracle and the production tiled Pallas renderer (the
per-chip intersection count rides the loss dict as ``isects``, see
``shard.py``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models.density import update_statistics
from ..models.gaussians import GaussianModelState
from ..models.loss import loss_dict
from ..models.optimizer import AdamState, adam_update
from ..models.render import CameraView
from ..training.config import Config


def shard_state(state, mesh):
    """Place a model/optimizer pytree with leading-axis sharding over the
    mesh (scalars replicated)."""
    from jax.sharding import NamedSharding

    axis = mesh.axis_names[0]

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, state)


def gather_state(state):
    """Bring a sharded pytree back to fully-replicated (host) layout."""
    return jax.tree.map(lambda x: jax.device_get(x), state)


def _stripe_dims(height: int, n_dev: int) -> int:
    if height % n_dev != 0:
        raise ValueError(
            f"height {height} must be divisible by mesh size {n_dev}"
        )
    return height // n_dev


def _mesh_axes(mesh):
    """(gauss_axis, tile_axis_or_None, n_tiles) for 1-D ("gauss",) and
    2-D ("gauss", "tiles") meshes."""
    axes = mesh.axis_names
    if len(axes) == 1:
        return axes[0], None, 1
    if len(axes) == 2:
        return axes[0], axes[1], mesh.devices.shape[1]
    raise ValueError(f"unsupported mesh axes {axes}")


def build_gauss_grads(
    cfg: Config,
    mesh,
    render_fn: Callable,
    height: int,
    width: int,
):
    """Per-chip ZeRO gradient exchange shared by the train step and the
    test-facing ``make_gauss_sharded_grad_fn``: all-gather the population,
    render + differentiate the chip's stripe, reduce-scatter the
    gradients. Runs INSIDE shard_map; returns
    ``(grads_shard, absgrad_shard, ld, radii_full, radii_shard)``.

    Supports 1-D ``(gauss,)`` meshes (n_gauss stripes) and 2-D
    ``(gauss, tiles)`` meshes: storage shards over ``gauss`` only, while
    every device of the grid renders a distinct stripe (stripe index =
    gauss_idx * n_tiles + tile_idx, matching the g-major image
    all-gather), so compute scales with the full device count and memory
    with the gauss axis. On multi-host topologies put ``tiles`` minor so
    the stripe gathers stay on ICI (see mesh.make_mesh2d)."""
    n_total = mesh.devices.size
    axis, tile_axis, n_tiles = _mesh_axes(mesh)
    all_axes = mesh.axis_names
    n_gauss = mesh.devices.shape[0]
    _stripe_dims(height, n_total)
    from .shard import (
        adaptive_row_bounds,
        effective_interleave,
        reassemble_adaptive,
        render_striped,
        reorder_striped,
    )

    k_slabs = effective_interleave(
        height, n_total, getattr(cfg, "stripe_interleave", 1)
    )
    partition = getattr(cfg, "stripe_partition", "adaptive")
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    def per_chip_grads(params_shard, alive_shard, w2c, K, image, mask,
                       sh_degree):
        # ---- gather the population for compute (ZeRO exchange, leg 1)
        params = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
            params_shard,
        )
        alive = jax.lax.all_gather(alive_shard, axis, axis=0, tiled=True)
        cap = alive.shape[0]
        shard_size = cap // n_gauss
        idx = jax.lax.axis_index(axis)
        if tile_axis is not None:
            idx = idx * n_tiles + jax.lax.axis_index(tile_axis)

        bounds_px = None
        if partition == "adaptive":
            bounds_px = jax.lax.stop_gradient(
                adaptive_row_bounds(params, alive, w2c, K, height, n_total)
            )

        def stripe_loss(params, absdummy):
            # adaptive or uniform/interleaved stripes (see shard.py);
            # full-image projection geometry so all chips see identical
            # conics/radii (see CameraView)
            if bounds_px is not None:
                y0 = bounds_px[idx].astype(jnp.float32)
                ylim = (bounds_px[idx + 1] - bounds_px[idx]).astype(
                    jnp.float32
                )
                camera = CameraView(
                    w2c=w2c, K=K, width=width, height=height,
                    full_height=height, y_offset=y0, y_limit=ylim,
                )
                out = render_fn(
                    params, alive, camera, sh_degree, background,
                    absdummy,
                )
                stripe_img, radii, nis = (
                    out.image, out.radii, out.num_isects
                )
                full = jax.lax.all_gather(
                    stripe_img, all_axes, axis=0, tiled=True
                )
                full = reassemble_adaptive(
                    full, bounds_px, n_total, height
                )
            else:
                stripe_img, radii, nis = render_striped(
                    render_fn, params, alive, w2c, K, width, height,
                    n_total, idx, k_slabs, sh_degree, background,
                    absdummy,
                )
                full = jax.lax.all_gather(
                    stripe_img, all_axes, axis=0, tiled=True
                )
                full = reorder_striped(
                    full, n_total, k_slabs, height, width
                )
            ld = loss_dict(
                full, image, mask, cfg.lambda_ssim,
                log_scales=params.log_scales, alive=alive,
                use_scale_regularization=cfg.use_scale_regularization,
                max_scale_ratio=cfg.max_scale_ratio,
                lambda_scale=cfg.lambda_scale,
            )
            return ld["total"], (ld, radii, nis)

        absdummy = jnp.zeros((cap, 2), jnp.float32)
        (_, (ld, radii, nis)), (grads, absgrad) = jax.value_and_grad(
            stripe_loss, argnums=(0, 1), has_aux=True
        )(params, absdummy)

        # ---- reduce-scatter (ZeRO exchange, leg 2): sum stripe
        # contributions and shard; normalize the redundant-loss factor
        # (see shard.py)
        def rs(g):
            if tile_axis is not None:
                g = jax.lax.psum(g, tile_axis)
            return jax.lax.psum_scatter(
                g, axis, scatter_dimension=0, tiled=True
            ) / float(n_total)

        grads_shard = jax.tree.map(rs, grads)
        absgrad_shard = rs(absgrad)
        radii_full = jax.lax.pmax(radii, all_axes)
        gauss_idx = jax.lax.axis_index(axis)
        radii_shard = jax.lax.dynamic_slice_in_dim(
            radii_full, gauss_idx * shard_size, shard_size
        )
        ld = jax.tree.map(lambda x: jax.lax.pmean(x, all_axes), ld)
        if nis is not None:
            # per-chip capacity watchdog channel (see shard.py)
            ld["isects"] = jax.lax.pmax(nis, all_axes).astype(jnp.float32)
        return grads_shard, absgrad_shard, ld, radii_full, radii_shard

    return per_chip_grads


def make_gauss_sharded_grad_fn(
    cfg: Config, mesh, render_fn: Callable, height: int, width: int
):
    """Jitted pre-Adam gradients of the gauss-sharded step, re-gathered to
    full (replicated) arrays for gradient-level equivalence tests."""
    axis = mesh.axis_names[0]
    grads_impl = build_gauss_grads(cfg, mesh, render_fn, height, width)

    def per_chip(params_shard, alive_shard, w2c, K, image, mask, sh_degree):
        grads_shard, absgrad_shard, ld, radii_full, _ = grads_impl(
            params_shard, alive_shard, w2c, K, image, mask, sh_degree
        )
        gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
        return (
            jax.tree.map(gather, grads_shard),
            gather(absgrad_shard),
            ld,
            radii_full,
        )

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def grad_fn(model, w2c, K, image, mask, *, sh_degree):
        fn = shard_map(
            functools.partial(per_chip, sh_degree=sh_degree),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return fn(model.params, model.alive, w2c, K, image, mask)

    return grad_fn


def make_gauss_sharded_train_step(
    cfg: Config,
    mesh,
    render_fn: Callable,
    height: int,
    width: int,
):
    """Train step over Gaussian-sharded state. State arrays come in with
    their leading (capacity) axis sharded over the mesh; camera/image
    inputs replicated."""
    axis = mesh.axis_names[0]
    grads_impl = build_gauss_grads(cfg, mesh, render_fn, height, width)
    static_lrs = {
        "log_scales": cfg.log_scales_lr,
        "quats": cfg.quats_lr,
        "sh_0": cfg.sh_0_lr,
        "sh_rest": cfg.sh_rest_lr,
        "logit_opacities": cfg.logit_opacities_lr,
    }

    def per_chip(params_shard, alive_shard, stats_shard, mu_shard, nu_shard,
                 steps, w2c, K, image, mask, lr_means, do_stats, skip_all,
                 skip_opac, *, sh_degree):
        grads_shard, absgrad_shard, ld, _, radii_shard = grads_impl(
            params_shard, alive_shard, w2c, K, image, mask, sh_degree
        )

        new_stats = update_statistics(
            stats_shard, radii_shard, absgrad_shard, height, width
        )
        stats_out = jax.tree.map(
            lambda a, b: jnp.where(do_stats, b, a), stats_shard, new_stats
        )

        lrs = {
            name: jnp.asarray(v, jnp.float32)
            for name, v in static_lrs.items()
        }
        lrs["means"] = lr_means
        skips = {
            name: (
                skip_all | skip_opac
                if name == "logit_opacities"
                else skip_all
            )
            for name in ("means",) + tuple(static_lrs)
        }
        adam_shard = AdamState(mu=mu_shard, nu=nu_shard, steps=steps)
        params_new, adam_new = adam_update(
            params_shard, grads_shard, adam_shard, lrs, skips
        )
        return (
            params_new, stats_out, adam_new.mu, adam_new.nu,
            adam_new.steps, ld,
        )

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def step(model: GaussianModelState, adam: AdamState, w2c, K, image,
             mask, lr_means, do_stats, skip_all, skip_opac, *, sh_degree):
        sharded = shard_map(
            functools.partial(per_chip, sh_degree=sh_degree),
            mesh=mesh,
            in_specs=(
                P(axis), P(axis), P(axis), P(axis), P(axis), P(),
                P(), P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
            check_vma=False,
        )
        params_new, stats_new, mu, nu, steps, ld = sharded(
            model.params, model.alive, model.stats, adam.mu, adam.nu,
            adam.steps, w2c, K, image, mask, lr_means, do_stats,
            skip_all, skip_opac,
        )
        model_new = GaussianModelState(
            params=params_new, alive=model.alive, stats=stats_new
        )
        return model_new, AdamState(mu=mu, nu=nu, steps=steps), ld

    return step

def make_sharded_densify_step(dcfg, mesh):
    """Device-resident densify/prune over Gaussian-sharded state.

    Reuses the single-device engine (``models/density.py``) per shard
    inside ``shard_map``: clone/split targets fill free slots of the
    parent's OWN shard (slot position carries no semantics — the
    reference appends at the end, ``/root/reference/model/
    gaussian.py:199-235``; any free slot is equivalent). The split-sample
    RNG key is folded per shard. Info counts are ``psum``-aggregated;
    overflow is global-any, so the host grows capacity when ANY shard
    runs out of free slots (shard-local imbalance can trigger growth
    earlier than a global engine would — capacity is cheap relative to a
    multi-GB host round trip every refine).
    """
    from ..models.density import densify_and_prune
    from ..models.gaussians import GaussianModelState as _State

    axis = mesh.axis_names[0]

    def per_chip(params, alive, stats, mu, nu, steps, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        state = _State(params=params, alive=alive, stats=stats)
        adam = AdamState(mu=mu, nu=nu, steps=steps)
        new_state, new_adam, info, overflow = densify_and_prune(
            state, adam, key, dcfg
        )
        info = {k: jax.lax.psum(v, axis) for k, v in info.items()}
        overflow = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
        return (
            new_state.params, new_state.alive, new_state.stats,
            new_adam.mu, new_adam.nu, new_adam.steps, info, overflow,
        )

    @jax.jit
    def step(model, adam, key):
        fn = shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(
                P(axis), P(axis), P(axis), P(axis), P(axis), P(), P(),
            ),
            out_specs=(
                P(axis), P(axis), P(axis), P(axis), P(axis), P(), P(), P(),
            ),
            check_vma=False,
        )
        params, alive, stats, mu, nu, steps, info, overflow = fn(
            model.params, model.alive, model.stats,
            adam.mu, adam.nu, adam.steps, key,
        )
        from ..models.gaussians import GaussianModelState as _S

        return (
            _S(params=params, alive=alive, stats=stats),
            AdamState(mu=mu, nu=nu, steps=steps),
            info,
            overflow,
        )

    return step


def grow_state_sharded(state, adam, new_capacity: int, mesh):
    """Grow capacity with PER-SHARD padding: each shard gains
    ``(new_capacity - capacity) / n_shards`` free slots, so shard-local
    densification stays balanced (a global end-pad would hand every free
    slot to the last shard). Device-resident; mirrors
    ``models.gaussians.grow_capacity`` padding (identity quats, zeros,
    dead alive bits; Adam moments zero)."""
    from ..models.gaussians import GaussianModelState as _State
    from ..models.gaussians import GaussianParams

    axis = mesh.axis_names[0]
    n = mesh.devices.shape[0]
    old = state.capacity
    if new_capacity % n != 0 or old % n != 0:
        raise ValueError(
            f"capacities {old}->{new_capacity} must be divisible by the "
            f"gauss mesh size {n}"
        )
    extra = new_capacity // n - old // n

    def per_chip(params, alive, stats, mu, nu):
        def pad(x):
            return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))

        def pad_params(p):
            return GaussianParams(
                means=pad(p.means),
                log_scales=pad(p.log_scales),
                quats=jnp.concatenate(
                    [
                        p.quats,
                        jnp.tile(
                            jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                            (extra, 1),
                        ),
                    ],
                    axis=0,
                ),
                sh_0=pad(p.sh_0),
                sh_rest=pad(p.sh_rest),
                logit_opacities=pad(p.logit_opacities),
            )

        return (
            pad_params(params),
            pad(alive),
            jax.tree.map(pad, stats),
            jax.tree.map(pad, mu),
            jax.tree.map(pad, nu),
        )

    @jax.jit
    def grow(model, adam):
        fn = shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(axis),) * 5,
            out_specs=(P(axis),) * 5,
            check_vma=False,
        )
        params, alive, stats, mu, nu = fn(
            model.params, model.alive, model.stats, adam.mu, adam.nu
        )
        return (
            _State(params=params, alive=alive, stats=stats),
            AdamState(mu=mu, nu=nu, steps=adam.steps),
        )

    return grow(state, adam)
