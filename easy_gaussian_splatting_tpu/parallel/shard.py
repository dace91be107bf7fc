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


def effective_interleave(height: int, n_dev: int, want: int) -> int:
    """Largest k <= ``want`` with height divisible by n_dev*k: the slab
    count per chip for the interleaved stripe assignment (falls back
    gracefully instead of raising on awkward heights)."""
    k = max(1, int(want))
    while k > 1 and height % (n_dev * k) != 0:
        k -= 1
    return k


def render_striped(render_fn, params, alive, w2c, K, width, height,
                   n_dev, idx, k_slabs, sh_degree, background, absdummy):
    """Render one chip's share of the image as ``k_slabs`` interleaved
    slabs (chip ``idx`` owns global slabs ``idx, idx + n_dev, ...``) and
    return ``(image [stripe_h, W, 3], radii, num_isects)``.

    A single contiguous stripe per chip (k=1) wastes ~43% of an 8-chip
    mesh on object-centric scenes — the measured per-chip intersection
    spread was max/mean 1.73 because the top/bottom stripes see almost
    no content (docs/PLAN.md "Measured stripe load imbalance"). With the
    strided assignment each chip samples the vertical content profile
    k times at stride height/k, bounding the imbalance for smooth
    profiles at the cost of k smaller binning+raster passes per chip.
    ``num_isects`` is the per-slab MAX: each slab render owns a full
    isect_mult * C buffer, so that is the quantity the capacity
    watchdog must cover."""
    stripe_h = height // n_dev
    slab_h = stripe_h // k_slabs
    imgs, radii, nis = [], None, None
    for j in range(k_slabs):
        y0 = ((j * n_dev + idx) * slab_h).astype(jnp.float32)
        camera = CameraView(
            w2c=w2c, K=K, width=width, height=slab_h,
            full_height=height, y_offset=y0,
        )
        out = render_fn(
            params, alive, camera, sh_degree, background, absdummy
        )
        imgs.append(out.image)
        radii = out.radii if radii is None else jnp.maximum(
            radii, out.radii
        )
        if out.num_isects is not None:
            nis = out.num_isects if nis is None else jnp.maximum(
                nis, out.num_isects
            )
    image = imgs[0] if k_slabs == 1 else jnp.concatenate(imgs, axis=0)
    return image, radii, nis


def reorder_striped(full, n_dev, k_slabs, height, width):
    """Undo the chip-major row order of an all-gathered interleaved
    image: gathered rows are (chip i, slab j) blocks; global row order
    is slab-major (global slab = j * n_dev + i)."""
    if k_slabs == 1:
        return full
    slab_h = height // (n_dev * k_slabs)
    x = full.reshape((n_dev, k_slabs, slab_h) + full.shape[1:])
    x = jnp.swapaxes(x, 0, 1)
    return x.reshape((height,) + full.shape[1:])


def adaptive_row_bounds(params, alive, w2c, K, height, n_parts):
    """Content-adaptive contiguous partition of the image's PIXEL rows
    into ``n_parts`` chips: boundaries are the row quantiles of the
    projected Gaussian centers, so each chip's stripe carries ~1/n of
    the content regardless of where it concentrates. Returns
    [n_parts + 1] int32 pixel-row bounds (replicated — every chip
    computes the same value from replicated inputs; one cheap
    means-only projection + one [C] sort).

    Rationale (docs/PLAN.md "Measured stripe load imbalance"): uniform
    stripes waste ~43% of an 8-chip mesh on object-centric scenes
    (per-chip isect spread max/mean 1.73), and interleaved slab
    assignment REDUCES net throughput — slabs thinner than typical
    footprints duplicate binning work faster than they balance it
    (measured on the dryrun scene: k=1 max-chip 14.8k isects, k=2
    20.8k, k=8 68.5k = every chip bins everything). Adaptive contiguous
    pixel-row boundaries keep duplication at the k=1 level while
    equalizing load; the center distribution is a load proxy
    (footprint-weighted would be exact but needs full conics)."""
    r_cw = w2c[:3, :3]
    t_cw = w2c[:3, 3]
    pc = params.means @ r_cw.T + t_cw[None, :]
    z = pc[:, 2]
    ok = alive & (z > 1e-2)
    yc = K[1, 1] * pc[:, 1] / jnp.maximum(z, 1e-2) + K[1, 2]
    yc = jnp.clip(yc, 0.0, float(height - 1))
    yc = jnp.where(ok, yc, jnp.inf)  # invalid sort to the tail
    yc_sorted = jax.lax.sort(yc)
    n_ok = jnp.sum(ok, dtype=jnp.int32)
    q = (
        jnp.arange(1, n_parts, dtype=jnp.int32)
        * n_ok
        // jnp.int32(n_parts)
    )
    mids = yc_sorted[jnp.clip(q, 0, yc.shape[0] - 1)]
    mids = jnp.where(
        jnp.isfinite(mids), mids, 0.0
    ).astype(jnp.int32) + 1  # boundary just below the quantile center
    mids = jnp.clip(mids, 0, height)
    bounds = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            mids,
            jnp.full((1,), height, jnp.int32),
        ]
    )
    # monotone by construction (sorted quantiles); clamp defensively
    return jax.lax.cummax(bounds)


def reassemble_adaptive(gathered, bounds_px, n_dev, height):
    """Assemble the full image from ``n_dev`` adaptively-bounded chip
    windows: gathered is [n_dev * H, W, ...] chip-major, chip c's rows
    [0, bounds_px[c+1] - bounds_px[c]) hold global rows starting at
    bounds_px[c]. One H-row gather (differentiable; its transpose
    scatters the pixel cotangents back to the producing chip)."""
    r = jnp.arange(height, dtype=jnp.int32)
    c = jnp.clip(
        jnp.searchsorted(bounds_px, r, side="right") - 1, 0, n_dev - 1
    )
    idx = c * height + (r - bounds_px[c])
    return gathered[idx]


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
    _check_height(height, n_dev)
    k_slabs = effective_interleave(
        height, n_dev, getattr(cfg, "stripe_interleave", 1)
    )
    partition = getattr(cfg, "stripe_partition", "adaptive")
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    def per_chip_loss(params, alive, absdummy, w2c, K, image, mask,
                      sh_degree, bounds_px):
        idx = jax.lax.axis_index(TILE_AXIS)
        if bounds_px is not None:
            # content-adaptive contiguous stripe: static full-height
            # window at a traced offset, binning bounded by the traced
            # y_limit (see adaptive_tile_bounds)
            y0 = bounds_px[idx].astype(jnp.float32)
            ylim = (bounds_px[idx + 1] - bounds_px[idx]).astype(
                jnp.float32
            )
            camera = CameraView(
                w2c=w2c, K=K, width=width, height=height,
                full_height=height, y_offset=y0, y_limit=ylim,
            )
            out = render_fn(
                params, alive, camera, sh_degree, background, absdummy
            )
            stripe_img, radii, nis = out.image, out.radii, out.num_isects
            full = jax.lax.all_gather(
                stripe_img, TILE_AXIS, axis=0, tiled=True
            )  # [n_dev * H, W, 3]
            full = reassemble_adaptive(full, bounds_px, n_dev, height)
        else:
            # uniform (optionally interleaved) stripes; full-image
            # projection geometry keeps conics/radii identical per chip
            stripe_img, radii, nis = render_striped(
                render_fn, params, alive, w2c, K, width, height,
                n_dev, idx, k_slabs, sh_degree, background, absdummy,
            )
            # gather stripes -> identical full image on every chip
            full = jax.lax.all_gather(
                stripe_img, TILE_AXIS, axis=0, tiled=True
            )  # [H, W, 3]
            full = reorder_striped(full, n_dev, k_slabs, height, width)
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
        radii = jax.lax.pmax(radii, TILE_AXIS)
        return ld["total"], (ld, radii, nis)

    def sharded_grads(params, alive, absdummy, w2c, K, image, mask,
                      sh_degree):
        bounds_px = None
        if partition == "adaptive":
            bounds_px = jax.lax.stop_gradient(
                adaptive_row_bounds(params, alive, w2c, K, height, n_dev)
            )
        (total, (ld, radii, nis)), grads = jax.value_and_grad(
            per_chip_loss, argnums=(0, 2), has_aux=True
        )(params, alive, absdummy, w2c, K, image, mask, sh_degree,
          bounds_px)
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
    interleave: int = 1,
    partition: str = "adaptive",
):
    """Mesh-aware intersection counter: bins each chip's image stripe
    (exactly as the sharded tiled step does — including bottom padding to
    a stripe multiple and the ``interleave``-slab assignment) and returns
    the per-chip MAX of [num_isects, num_overflow, *n_gt] — the
    quantities the per-chip capacities must cover (per-slab max for
    interleaved stripes: each slab render owns its own buffers). Used by
    the trainer's autotune/watchdog when ``mesh_shape`` is set.
    ``reduce="none"`` returns the UNreduced per-chip matrix
    [n_dev, 2 + len(BUDGET_CANDIDATES)] instead, with entry 0 the
    per-chip SUM over slabs (the chip's total binning work — the
    load-balance diagnostic; per-chip compute balance is the scaling
    gate, docs/PLAN.md)."""
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
        # pad exactly like the sharded step does (trainer pads rows to a
        # multiple of n_dev * interleave)
        unit = n_dev * max(1, interleave)
        hp = -(-height // unit) * unit
        stripe_h = hp // n_dev
        k_slabs = effective_interleave(hp, n_dev, interleave)
        slab_h = stripe_h // k_slabs
        c = params.means.shape[0]

        def per_chip(params, alive, w2c, K):
            # row-major linear stripe index over the whole mesh grid
            idx = jax.lax.axis_index(axes[0])
            for ax, size in zip(axes[1:], mesh.devices.shape[1:]):
                idx = idx * size + jax.lax.axis_index(ax)
            scales = jnp.exp(params.log_scales)
            opac = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
                jnp.float32
            )
            # match the sharded render exactly: full-image projection,
            # stripe-local screen coordinates (see CameraView)
            intr = CameraIntrinsics.from_K(K, width, hp)
            proj0 = project_gaussians(
                params.means, params.quats, scales, w2c, intr
            )
            radii = jnp.where(opac > 0.0, proj0.radii, 0.0)
            extents = binning_extents(proj0.conics, opac, radii)

            def bin_window(y0, geom, y_lim):
                means2d = proj0.means2d - jnp.stack(
                    [jnp.zeros((), jnp.float32), y0]
                )[None, :]
                binning = bin_gaussians(
                    means2d, extents, proj0.depths, geom, max_tiles_w,
                    max_tiles_h, conics=proj0.conics, opacities=opac,
                    ov_capacity=_ov_capacity(c, ov_frac),
                    small_budget=small_budget,
                    y_limit=y_lim,
                )
                return jnp.concatenate(
                    [
                        jnp.stack(
                            [binning.num_isects, binning.num_overflow]
                        ),
                        binning.n_gt,
                    ]
                )

            if partition == "adaptive":
                bounds_px = adaptive_row_bounds(
                    params, alive, w2c, K, hp, n_dev
                )
                y0 = bounds_px[idx].astype(jnp.float32)
                y_lim = (bounds_px[idx + 1] - bounds_px[idx]).astype(
                    jnp.float32
                )
                local = bin_window(
                    y0, image_geometry(hp, width, tile_size), y_lim
                )
                nis_sum = local[0]
            else:
                geom = image_geometry(slab_h, width, tile_size)
                local = None
                nis_sum = None
                for j in range(k_slabs):
                    y0 = ((j * n_dev + idx) * slab_h).astype(jnp.float32)
                    # rasterize_tiled applies an implicit y_limit=height
                    # (excludes pad-band gaussians); match it exactly
                    cur = bin_window(
                        y0, geom, jnp.asarray(float(slab_h), jnp.float32)
                    )
                    local = (
                        cur if local is None else jnp.maximum(local, cur)
                    )
                    nis_sum = (
                        cur[0] if nis_sum is None else nis_sum + cur[0]
                    )
            if reduce == "none":
                # entry 0: total per-chip work (sum over slabs for the
                # interleaved mode) — the balance diagnostic; the rest
                # stay per-window maxima
                local = local.at[0].set(nis_sum)
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
