"""Sharded training step: image tile-rows across chips via shard_map.

Design (new scope vs the single-GPU reference; see SURVEY.md §5.7-5.8):
- Gaussian parameters are **replicated**; the image is sharded into
  horizontal stripes along the mesh's ``tiles`` axis.
- Each chip renders its stripe by shifting the principal point
  (``cy' = cy - y0``): a pinhole viewport crop is exactly equivalent to
  rendering the stripe, and frustum culling then prunes Gaussians that do
  not touch the stripe.
- Stripes are ``all_gather``-ed (a few MB over ICI) so the loss (L1 +
  SSIM, whose windows cross stripe boundaries) is computed identically on
  every chip; the backward of the gather scatters the pixel cotangents
  back to the producing chip, and the parameter gradients and the absgrad
  densification statistics are summed across chips automatically by the
  shard_map transpose (replicated-in params -> psum of per-chip grads).
- Per-chip visibility differs (stripe culling), so the radii statistic is
  combined with ``pmax``.

This gives data-parallel-free spatial scaling for one camera per step
(batch_size=1, matching the reference's training regime,
``/root/reference/train.py:36-43``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.density import update_statistics
from ..models.gaussians import GaussianModelState
from ..models.loss import loss_dict
from ..models.optimizer import adam_update
from ..models.render import CameraView
from ..training.config import Config
from .mesh import TILE_AXIS


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
    n_dev = mesh.devices.size
    if height % n_dev != 0:
        raise ValueError(
            f"height {height} must be divisible by mesh size {n_dev}"
        )
    stripe_h = height // n_dev
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    static_lrs = {
        "log_scales": cfg.log_scales_lr,
        "quats": cfg.quats_lr,
        "sh_0": cfg.sh_0_lr,
        "sh_rest": cfg.sh_rest_lr,
        "logit_opacities": cfg.logit_opacities_lr,
    }

    def per_chip_loss(params, alive, absdummy, w2c, K, image, mask, sh_degree):
        idx = jax.lax.axis_index(TILE_AXIS)
        y0 = (idx * stripe_h).astype(jnp.float32)
        K_local = K.at[1, 2].add(-y0)
        camera = CameraView(
            w2c=w2c, K=K_local, width=width, height=stripe_h
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
        return ld["total"], (ld, radii)

    def step_impl(model, adam, w2c, K, image, mask, lr_means, do_stats,
                  skip_all, skip_opac, sh_degree):
        capacity = model.params.means.shape[0]
        absdummy = jnp.zeros((capacity, 2), jnp.float32)

        def sharded_grads(params, alive, absdummy, w2c, K, image, mask):
            (total, (ld, radii)), grads = jax.value_and_grad(
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
            return grads, ld, radii

        grads_fn = shard_map(
            sharded_grads,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
        (grads, absgrad), ld, radii = grads_fn(
            model.params, model.alive, absdummy, w2c, K, image, mask
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
