"""Sharded training step: image tile-rows across chips via shard_map.

Design (new scope vs the single-GPU reference; see SURVEY.md §5.7-5.8):
- Gaussian parameters are **replicated**; the image is sharded into
  horizontal stripes along the mesh's ``tiles`` axis.
- Each chip renders its stripe as a viewport window of the full image:
  projection (the fov-dependent EWA Jacobian clamp and the visibility
  cull) runs in full-image geometry so all chips see identical
  conics/radii, then screen means shift down by the stripe's first row
  (``CameraView.full_height``/``y_offset``); binning's exact ellipse/tile
  test then prunes Gaussians that do not touch the stripe.
- Stripes are ``all_gather``-ed (a few MB over ICI) so the loss (L1 +
  SSIM, whose windows cross stripe boundaries) is computed identically on
  every chip; the backward of the gather scatters the pixel cotangents
  back to the producing chip, and the parameter gradients and the absgrad
  densification statistics are summed across chips automatically by the
  shard_map transpose (replicated-in params -> psum of per-chip grads).
- Per-chip visibility differs (stripe culling), so the radii statistic is
  combined with ``pmax``.
- Works with BOTH renderers: the O(N*P) oracle and the production tiled
  Pallas path (each chip runs binning + the tile kernels on its stripe;
  the per-chip intersection count rides the loss dict as ``isects`` =
  pmax over chips, feeding the trainer's capacity watchdog exactly like
  the single-device step).

This gives data-parallel-free spatial scaling for one camera per step
(batch_size=1, matching the reference's training regime,
``/root/reference/train.py:36-43``).
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
from ..models.optimizer import adam_update
from ..models.render import CameraView
from ..training.config import Config
from .mesh import TILE_AXIS


def _check_height(height: int, n_dev: int) -> int:
    if height % n_dev != 0:
        raise ValueError(
            f"height {height} must be divisible by mesh size {n_dev}"
        )
    return height // n_dev


def build_sharded_grads(
    cfg: Config,
    mesh,
    render_fn: Callable,
    height: int,
    width: int,
):
    """The shard_map'd pre-Adam gradient computation shared by the train
    step and the (test-facing) ``make_sharded_grad_fn``.

    Returns ``fn(params, alive, absdummy, w2c, K, image, mask, sh_degree)
    -> ((grads, absgrad), ld, radii)`` where the gradients are the exact
    full-image gradients (psum of per-stripe contributions, normalized
    for the redundantly-computed loss)."""
    n_dev = mesh.devices.size
    stripe_h = _check_height(height, n_dev)
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    def per_chip_loss(params, alive, absdummy, w2c, K, image, mask, sh_degree):
        idx = jax.lax.axis_index(TILE_AXIS)
        y0 = (idx * stripe_h).astype(jnp.float32)
        # full-image projection geometry + stripe-local raster window:
        # keeps conics/radii identical on every chip (see CameraView)
        camera = CameraView(
            w2c=w2c, K=K, width=width, height=stripe_h,
            full_height=height, y_offset=y0,
        )
        out = render_fn(
            params, alive, camera, sh_degree, background, absdummy
        )
        # gather stripes -> identical full image on every chip
        full = jax.lax.all_gather(
            out.image, TILE_AXIS, axis=0, tiled=True
        )  # [H, W, 3]
        ld = loss_dict(
            full,
            image,
            mask,
            cfg.lambda_ssim,
            log_scales=params.log_scales,
            alive=alive,
            use_scale_regularization=cfg.use_scale_regularization,
            max_scale_ratio=cfg.max_scale_ratio,
            lambda_scale=cfg.lambda_scale,
        )
        radii = jax.lax.pmax(out.radii, TILE_AXIS)
        return ld["total"], (ld, radii, out.num_isects)

    def sharded_grads(params, alive, absdummy, w2c, K, image, mask,
                      sh_degree):
        (total, (ld, radii, nis)), grads = jax.value_and_grad(
            per_chip_loss, argnums=(0, 2), has_aux=True
        )(params, alive, absdummy, w2c, K, image, mask, sh_degree)
        # The loss is computed redundantly on every chip from the
        # gathered image, so the all_gather transpose reduce-scatters
        # n identical cotangents: each chip's gradient is n x its
        # stripe's true contribution. psum then over-counts by another
        # factor of n in total -> normalize (validated against the
        # single-device step in tests/test_parallel.py).
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, TILE_AXIS) / float(n_dev), grads
        )
        ld = jax.tree.map(lambda x: jax.lax.pmean(x, TILE_AXIS), ld)
        if nis is not None:
            # capacity watchdog channel: the binding constraint is the
            # fullest chip (each chip has its own isect_mult * C budget)
            ld["isects"] = jax.lax.pmax(nis, TILE_AXIS).astype(jnp.float32)
        return grads, ld, radii

    def apply(params, alive, absdummy, w2c, K, image, mask, sh_degree):
        fn = shard_map(
            functools.partial(sharded_grads, sh_degree=sh_degree),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return fn(params, alive, absdummy, w2c, K, image, mask)

    return apply


def make_sharded_grad_fn(
    cfg: Config, mesh, render_fn: Callable, height: int, width: int
):
    """Jitted pre-Adam gradients of the sharded step, for gradient-level
    equivalence tests against the single-device path."""
    grads_impl = build_sharded_grads(cfg, mesh, render_fn, height, width)

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def grad_fn(model, w2c, K, image, mask, *, sh_degree):
        capacity = model.params.means.shape[0]
        absdummy = jnp.zeros((capacity, 2), jnp.float32)
        (grads, absgrad), ld, radii = grads_impl(
            model.params, model.alive, absdummy, w2c, K, image, mask,
            sh_degree,
        )
        return grads, absgrad, ld, radii

    return grad_fn


def make_sharded_train_step(
    cfg: Config,
    mesh,
    render_fn: Callable,
    height: int,
    width: int,
):
    """Build a jitted, shard_map'd train step for a fixed image size.

    ``height`` must be divisible by the mesh size (pad images + mask the
    padded rows out via the mask channel)."""
    grads_impl = build_sharded_grads(cfg, mesh, render_fn, height, width)
    static_lrs = {
        "log_scales": cfg.log_scales_lr,
        "quats": cfg.quats_lr,
        "sh_0": cfg.sh_0_lr,
        "sh_rest": cfg.sh_rest_lr,
        "logit_opacities": cfg.logit_opacities_lr,
    }

    def step_impl(model, adam, w2c, K, image, mask, lr_means, do_stats,
                  skip_all, skip_opac, sh_degree):
        capacity = model.params.means.shape[0]
        absdummy = jnp.zeros((capacity, 2), jnp.float32)

        (grads, absgrad), ld, radii = grads_impl(
            model.params, model.alive, absdummy, w2c, K, image, mask,
            sh_degree,
        )

        new_stats = update_statistics(
            model.stats, radii, absgrad, height, width
        )
        stats = jax.tree.map(
            lambda a, b: jnp.where(do_stats, b, a), model.stats, new_stats
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
        params_new, adam_new = adam_update(
            model.params, grads, adam, lrs, skips
        )
        model_new = GaussianModelState(
            params=params_new, alive=model.alive, stats=stats
        )
        return model_new, adam_new, ld

    return jax.jit(
        step_impl,
        static_argnames=("sh_degree",),
        donate_argnums=(0, 1),
    )


def make_striped_isect_counter(
    mesh,
    tile_size: int,
    max_tiles_w: int,
    max_tiles_h: int,
    ov_frac: float = 0.125,
    small_budget: int | None = None,
    reduce: str = "max",
):
    """Mesh-aware intersection counter: bins each chip's image stripe
    (exactly as the sharded tiled step does, including bottom padding to
    a stripe multiple) and returns the per-chip MAX of [num_isects,
    num_overflow, *n_gt] — the quantities the per-chip capacities must
    cover. Used by the trainer's autotune/watchdog when ``mesh_shape`` is
    set. ``reduce="none"`` returns the UNreduced per-chip matrix
    [n_dev, 2 + len(BUDGET_CANDIDATES)] instead (stripe load-imbalance
    diagnostics — per-chip compute balance is the scaling gate,
    docs/PLAN.md)."""
    from ..ops.projection import CameraIntrinsics, project_gaussians
    from ..ops.rasterize_tiled import (
        SMALL_BUDGET,
        _ov_capacity,
        bin_gaussians,
        binning_extents,
        image_geometry,
    )

    if small_budget is None:
        small_budget = SMALL_BUDGET

    n_dev = mesh.devices.size
    axes = mesh.axis_names  # 1-D (tiles|gauss) or 2-D (gauss, tiles)

    @functools.partial(jax.jit, static_argnames=("height", "width"))
    def count(params, alive, w2c, K, *, height, width):
        hp = -(-height // n_dev) * n_dev
        stripe_h = hp // n_dev
        c = params.means.shape[0]

        def per_chip(params, alive, w2c, K):
            # row-major linear stripe index over the whole mesh grid
            idx = jax.lax.axis_index(axes[0])
            for ax, size in zip(axes[1:], mesh.devices.shape[1:]):
                idx = idx * size + jax.lax.axis_index(ax)
            y0 = (idx * stripe_h).astype(jnp.float32)
            scales = jnp.exp(params.log_scales)
            opac = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
                jnp.float32
            )
            # match the sharded render exactly: full-image projection,
            # stripe-local screen coordinates (see CameraView)
            intr = CameraIntrinsics.from_K(K, width, hp)
            proj = project_gaussians(
                params.means, params.quats, scales, w2c, intr
            )
            proj = proj._replace(
                means2d=proj.means2d
                - jnp.stack([jnp.zeros((), jnp.float32), y0])[None, :]
            )
            radii = jnp.where(opac > 0.0, proj.radii, 0.0)
            geom = image_geometry(stripe_h, width, tile_size)
            extents = binning_extents(proj.conics, opac, radii)
            binning = bin_gaussians(
                proj.means2d, extents, proj.depths, geom, max_tiles_w,
                max_tiles_h, conics=proj.conics, opacities=opac,
                ov_capacity=_ov_capacity(c, ov_frac),
                small_budget=small_budget,
            )
            local = jnp.concatenate(
                [
                    jnp.stack([binning.num_isects, binning.num_overflow]),
                    binning.n_gt,
                ]
            )
            if reduce == "none":
                return local[None, :]  # stacked over chips by out_specs
            return jax.lax.pmax(local, axes)

        fn = shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(axes) if reduce == "none" else P(),
            check_vma=False,
        )
        return fn(params, alive, w2c, K)

    return count
