"""The training loop and jitted train step.

Behavioral spec (``/root/reference/train.py:22-164``): single-camera steps,
forward + backward, then the scheduled side-work — checkpoint save, eval,
densify/prune + opacity reset inside the refine window, SH-degree upgrade,
means-LR decay, TensorBoard — then the optimizer step (skipped for params
re-created by densify/reset, see models/optimizer.py).

TPU redesign: the hot path is ONE jitted, donated function per (H, W,
active-SH-degree): render -> loss -> backward -> statistics -> grouped Adam.
Event steps (every ``refine_every``) call the separately-jitted densify with
traced skip flags suppressing that step's weight update. Data decode runs
ahead on prefetch threads; scalars are read back asynchronously.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import random
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.density import (
    DensifyConfig,
    densify_and_prune,
    reset_opacities,
    update_statistics,
)
from ..models.gaussians import (
    GaussianModelState,
    _round_up_capacity,
    compact_capacity,
    grow_capacity,
    init_gaussian_state,
)
from ..models.loss import loss_dict
from ..models.optimizer import (
    AdamState,
    adam_update,
    grow_adam_state,
    init_adam_state,
    permute_adam_state,
)
from ..models.render import CameraView, render
from ..ops.lr_schedule import log_lerp_schedule
from .config import Config

logger = logging.getLogger(__name__)

LR_GROUPS = ("log_scales", "quats", "sh_0", "sh_rest", "logit_opacities")


def get_render_fn(cfg: Config) -> Callable:
    """Select the renderer implementation. The tiled TPU renderer is the
    production path; the oracle is exact but O(N*P)."""
    if cfg.renderer == "tiled":
        from ..ops.rasterize_tiled import make_tiled_render_fn

        return make_tiled_render_fn(
            tile_size=cfg.tile_size,
            max_tiles_w=cfg.max_tiles,
            max_tiles_h=cfg.max_tiles,
            isect_mult=cfg.isect_mult,
            ov_frac=cfg.ov_frac,
            small_budget=cfg.small_budget,
        )
    return functools.partial(render, chunk=cfg.raster_chunk)


def tune_inference_cfg(
    cfg: Config, state, w2c, K, height: int, width: int,
    margin: float = 1.5,
) -> Config:
    """Right-size the binning parameters for a LOADED checkpoint.

    The run dir's ``config.yaml`` is dumped at STARTUP, so a reloaded
    config carries the pre-autotune defaults (isect_mult 3.0,
    small_budget 9, ov_frac 0.125). At an end-of-training population
    those are wildly oversized — measured on the round-5 1.62M-Gaussian
    checkpoint: the default sort domain is ~23M entries vs ~6M tuned,
    ~400 ms of resolution-independent per-frame cost in the viewer.
    Mirrors the trainer's startup autotune from one probe render at the
    given camera; ``margin`` (1.5) covers camera-to-camera variance
    since inference paths have no growth watchdog (overcounts only cost
    memory; undercounts cost silently truncated tiles)."""
    if cfg.renderer != "tiled":
        return cfg
    import numpy as np

    from ..ops.rasterize_tiled import (
        BUDGET_CANDIDATES,
        _ov_capacity,
        make_isect_counter,
        max_isect_cap,
    )

    counter = make_isect_counter(
        cfg.tile_size, cfg.max_tiles, cfg.max_tiles
    )
    vals = np.asarray(
        counter(
            state.params, state.alive,
            jnp.asarray(w2c, jnp.float32), jnp.asarray(K, jnp.float32),
            height=height, width=width,
        )
    )
    cap = state.capacity
    n = int(vals[0])
    max_mult = max_isect_cap(cfg.isect_hbm_budget_mb) / max(cap, 1)
    cfg.isect_mult = (
        math.floor(min(max(0.25, n * margin / cap), max_mult) * 1e3) / 1e3
    )
    m_cells = cfg.max_tiles * cfg.max_tiles
    best_dom = None
    for bb, need in zip(BUDGET_CANDIDATES, vals[2:]):
        if bb >= m_cells:
            continue
        ovf = round(max(0.01, min(1.0, int(need) * 2.0 / cap)), 3)
        dom = cap * bb + m_cells * _ov_capacity(cap, ovf)
        if best_dom is None or dom < best_dom:
            cfg.small_budget, cfg.ov_frac, best_dom = bb, ovf, dom
    logger.info(
        f"inference binning autotune: {n} isects at capacity {cap} -> "
        f"isect_mult {cfg.isect_mult}, small_budget {cfg.small_budget}, "
        f"ov_frac {cfg.ov_frac}"
    )
    return cfg


def make_train_step(cfg: Config, render_fn: Callable):
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

    @functools.partial(
        jax.jit,
        static_argnames=("height", "width", "sh_degree"),
        donate_argnames=("model", "adam"),
    )
    def train_step(
        model: GaussianModelState,
        adam: AdamState,
        w2c: jnp.ndarray,
        K: jnp.ndarray,
        image: jnp.ndarray,
        mask: jnp.ndarray,
        lr_means: jnp.ndarray,
        do_stats: jnp.ndarray,  # bool: inside the refine window
        skip_all: jnp.ndarray,  # bool: densify event this step
        skip_opac: jnp.ndarray,  # bool: opacity reset this step
        *,
        height: int,
        width: int,
        sh_degree: int,
    ):
        capacity = model.params.means.shape[0]
        camera = CameraView(w2c=w2c, K=K, width=width, height=height)
        absdummy = jnp.zeros((capacity, 2), jnp.float32)

        def loss_fn(params, absd):
            out = render_fn(
                params, model.alive, camera, sh_degree, background, absd
            )
            ld = loss_dict(
                out.image,
                image,
                mask,
                cfg.lambda_ssim,
                log_scales=params.log_scales,
                alive=model.alive,
                use_scale_regularization=cfg.use_scale_regularization,
                max_scale_ratio=cfg.max_scale_ratio,
                lambda_scale=cfg.lambda_scale,
            )
            if out.num_isects is not None:
                # capacity-watchdog channel: rides the async loss readback
                ld["isects"] = out.num_isects.astype(jnp.float32)
            return ld["total"], (ld, out.radii)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (_, (ld, radii)), (grads, absgrad) = grad_fn(model.params, absdummy)

        new_stats = update_statistics(
            model.stats, radii, absgrad, height, width
        )
        stats = jax.tree.map(
            lambda a, b: jnp.where(do_stats, b, a), model.stats, new_stats
        )

        lrs = {
            name: jnp.asarray(v, jnp.float32) for name, v in static_lrs.items()
        }
        lrs["means"] = lr_means
        skips = {
            name: (
                skip_all | skip_opac
                if name == "logit_opacities"
                else skip_all
            )
            for name in ("means",) + LR_GROUPS
        }
        params_new, adam_new = adam_update(
            model.params, grads, adam, lrs, skips
        )
        model_new = GaussianModelState(
            params=params_new, alive=model.alive, stats=stats
        )
        return model_new, adam_new, ld

    return train_step


def make_batched_train_step(cfg: Config, render_fn: Callable):
    """Multi-camera train step: renders/differentiates B views inside ONE
    jitted step (``lax.scan`` over the camera axis), applies a single
    Adam update with the MEAN gradient, and accumulates densification
    statistics per view exactly like B sequential reference steps
    (``/root/reference/train.py:93-157`` with batch_size=1 per view).

    This is gradient accumulation, not the reference's per-view Adam
    cadence — ``train()`` keeps batch 1 for schedule parity; the batched
    step amortizes per-step host dispatch/readback (dominant at small
    images on a remote-device link) and is the natural data-parallel
    unit for multi-chip camera batching. Camera tensors are stacked on a
    leading B axis (w2cs [B,4,4], Ks [B,3,3], images [B,H,W,3], masks
    [B,H,W])."""
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

    @functools.partial(
        jax.jit,
        static_argnames=("height", "width", "sh_degree"),
        donate_argnames=("model", "adam"),
    )
    def train_step(
        model: GaussianModelState,
        adam: AdamState,
        w2cs: jnp.ndarray,
        Ks: jnp.ndarray,
        images: jnp.ndarray,
        masks: jnp.ndarray,
        lr_means: jnp.ndarray,
        do_stats: jnp.ndarray,
        skip_all: jnp.ndarray,
        skip_opac: jnp.ndarray,
        *,
        height: int,
        width: int,
        sh_degree: int,
    ):
        capacity = model.params.means.shape[0]
        b = w2cs.shape[0]
        absdummy = jnp.zeros((capacity, 2), jnp.float32)

        def one_view(carry, xs):
            stats, grads_sum = carry
            w2c, K, image, mask = xs
            camera = CameraView(w2c=w2c, K=K, width=width, height=height)

            def loss_fn(params, absd):
                out = render_fn(
                    params, model.alive, camera, sh_degree, background,
                    absd,
                )
                ld = loss_dict(
                    out.image, image, mask, cfg.lambda_ssim,
                    log_scales=params.log_scales, alive=model.alive,
                    use_scale_regularization=cfg.use_scale_regularization,
                    max_scale_ratio=cfg.max_scale_ratio,
                    lambda_scale=cfg.lambda_scale,
                )
                if out.num_isects is not None:
                    ld["isects"] = out.num_isects.astype(jnp.float32)
                return ld["total"], (ld, out.radii)

            (_, (ld, radii)), (grads, absgrad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(model.params, absdummy)
            new_stats = update_statistics(
                stats, radii, absgrad, height, width
            )
            stats = jax.tree.map(
                lambda a, n: jnp.where(do_stats, n, a), stats, new_stats
            )
            grads_sum = jax.tree.map(jnp.add, grads_sum, grads)
            return (stats, grads_sum), ld

        zero_grads = jax.tree.map(jnp.zeros_like, model.params)
        (stats, grads_sum), lds = jax.lax.scan(
            one_view, (model.stats, zero_grads), (w2cs, Ks, images, masks)
        )
        grads = jax.tree.map(lambda g: g / float(b), grads_sum)
        # loss terms: mean over views; the capacity-watchdog channel
        # reports the WORST view
        ld = {
            k: (jnp.max(v) if k == "isects" else jnp.mean(v))
            for k, v in lds.items()
        }

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
            for name in ("means",) + LR_GROUPS
        }
        params_new, adam_new = adam_update(
            model.params, grads, adam, lrs, skips
        )
        model_new = GaussianModelState(
            params=params_new, alive=model.alive, stats=stats
        )
        return model_new, adam_new, ld

    return train_step


def make_grad_fn(cfg: Config, render_fn: Callable):
    """Jitted pre-Adam gradients of the single-device step — the rigorous
    comparison target for the sharded paths' gradient-equivalence tests
    (``tests/test_parallel.py``)."""
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    @functools.partial(
        jax.jit, static_argnames=("height", "width", "sh_degree")
    )
    def grad_fn(model, w2c, K, image, mask, *, height, width, sh_degree):
        capacity = model.params.means.shape[0]
        camera = CameraView(w2c=w2c, K=K, width=width, height=height)
        absdummy = jnp.zeros((capacity, 2), jnp.float32)

        def loss_fn(params, absd):
            out = render_fn(
                params, model.alive, camera, sh_degree, background, absd
            )
            ld = loss_dict(
                out.image, image, mask, cfg.lambda_ssim,
                log_scales=params.log_scales, alive=model.alive,
                use_scale_regularization=cfg.use_scale_regularization,
                max_scale_ratio=cfg.max_scale_ratio,
                lambda_scale=cfg.lambda_scale,
            )
            return ld["total"], (ld, out.radii)

        (_, (ld, radii)), (grads, absgrad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(model.params, absdummy)
        return grads, absgrad, ld, radii

    return grad_fn


def _dcfg(cfg: Config) -> DensifyConfig:
    return DensifyConfig(
        densify_grad_thresh=cfg.densify_grad_thresh,
        densify_scale_thresh=cfg.densify_scale_thresh,
        num_splits=cfg.num_splits,
        prune_radii_ratio_thresh=cfg.prune_radii_ratio_thresh,
        prune_scale_thresh=cfg.prune_scale_thresh,
        min_opacity=cfg.min_opacity,
    )


def make_densify_step(cfg: Config):
    dcfg = _dcfg(cfg)

    @jax.jit
    def densify_step(model, adam, key):
        return densify_and_prune(model, adam, key, dcfg)

    return densify_step


@dataclasses.dataclass
class TrainLoopState:
    """Host-side mutable training context."""

    model: GaussianModelState
    adam: AdamState
    active_sh_degree: int
    step: int = 0


def run_densify_with_growth(
    loop: TrainLoopState,
    densify_step,
    key,
    cfg: Config,
) -> Dict[str, int]:
    """Run a densify event; on free-slot overflow, grow capacity (pow2) and
    retry on the pre-event state."""
    while True:
        new_model, new_adam, info, overflow = densify_step(
            loop.model, loop.adam, key
        )
        if not bool(overflow):
            n = int(info["nbr_gaussians"])
            cap = loop.model.capacity
            # pre-emptive growth: keep >= 15% headroom for the next event
            if n > 0.85 * cap and cap < cfg.max_capacity:
                new_cap = min(cap * 2, cfg.max_capacity)
                logger.info(
                    f"growing capacity {cap} -> {new_cap} "
                    f"({n} gaussians alive)"
                )
                loop.model = grow_capacity(new_model, new_cap)
                loop.adam = grow_adam_state(new_adam, new_cap - cap)
            else:
                # heavy pruning leaves dead slots that every per-capacity
                # cost (binning grid, sort domain, argsorts) still pays
                # for — compact alive rows to the front and shrink. Only
                # compact when the 1.3x-headroom target is at most HALF
                # the current capacity: a x2 growth lands at ~43%
                # occupancy and a softer threshold oscillates
                # grow<->compact every few densify events (measured: a
                # recompile pair every ~3 min at 800px — the dominant
                # whole-run cost before this hysteresis).
                want = (
                    _round_up_capacity(int(n * 1.3))
                    if cfg.shrink_capacity
                    else cap
                )
                if want * 2 <= cap:
                    logger.info(
                        f"compacting capacity {cap} -> {want} "
                        f"({n} gaussians alive)"
                    )
                    loop.model, perm = compact_capacity(new_model, want)
                    loop.adam = permute_adam_state(new_adam, perm)
                else:
                    loop.model, loop.adam = new_model, new_adam
            return {k: int(v) for k, v in info.items()}
        cap = loop.model.capacity
        if cap >= cfg.max_capacity:
            logger.warning(
                f"densify overflow at max capacity {cap}; dropping excess"
            )
            loop.model, loop.adam = new_model, new_adam
            return {k: int(v) for k, v in info.items()}
        new_cap = min(cap * 2, cfg.max_capacity)
        logger.info(f"densify overflow: growing capacity {cap} -> {new_cap}")
        loop.model = grow_capacity(loop.model, new_cap)
        loop.adam = grow_adam_state(loop.adam, new_cap - cap)


def run_sharded_densify_with_growth(
    loop: TrainLoopState,
    sharded_densify_step,
    key,
    cfg: Config,
    mesh,
) -> Dict[str, int]:
    """Device-resident densify under the gauss mesh. On free-slot
    overflow of ANY shard, grow capacity per-shard
    (``grow_state_sharded``) and retry — shard-local imbalance can
    trigger growth earlier than the global engine, which is the price of
    never gathering multi-GB state to the host. Capacity compaction is
    skipped under the mesh (it would need a global permutation)."""
    from ..parallel.gauss_shard import grow_state_sharded

    n_shards = mesh.devices.shape[0]

    def _aligned(cap: int) -> int:
        return cap - cap % n_shards

    while True:
        new_model, new_adam, info, overflow = sharded_densify_step(
            loop.model, loop.adam, key
        )
        if not bool(overflow):
            n = int(info["nbr_gaussians"])
            cap = loop.model.capacity
            new_cap = _aligned(min(cap * 2, cfg.max_capacity))
            if n > 0.85 * cap and new_cap > cap:
                logger.info(
                    f"growing capacity {cap} -> {new_cap} "
                    f"({n} gaussians alive, {n_shards} shards)"
                )
                loop.model, loop.adam = grow_state_sharded(
                    new_model, new_adam, new_cap, mesh
                )
            else:
                loop.model, loop.adam = new_model, new_adam
            return {k: int(v) for k, v in info.items()}
        cap = loop.model.capacity
        new_cap = _aligned(min(cap * 2, cfg.max_capacity))
        if new_cap <= cap:
            logger.warning(
                f"densify overflow at max capacity {cap}; dropping excess"
            )
            loop.model, loop.adam = new_model, new_adam
            return {k: int(v) for k, v in info.items()}
        logger.info(
            f"densify overflow: growing capacity {cap} -> {new_cap} "
            f"({n_shards} shards)"
        )
        loop.model, loop.adam = grow_state_sharded(
            loop.model, loop.adam, new_cap, mesh
        )


def train(
    cfg: Config, scene=None, resume_from: Optional[str] = None
) -> TrainLoopState:
    """Full training run. Returns the final loop state (also checkpointed).

    ``resume_from``: path to a checkpoint saved with optimizer state —
    training continues from its step (a capability the reference lacks,
    SURVEY.md §5.4)."""
    from ..evaluation.evaluator import Evaluator
    from ..scene.scene import Scene, prefetch_frames
    from ..utils.checkpoint import load_checkpoint, save_checkpoint
    from ..utils.tb import create_tb_writer, tb_report

    if scene is None:
        scene = Scene(
            cfg.data,
            cfg.data_format,
            cfg.output,
            cfg.total_iterations,
            cfg.eval,
            cfg.eval_split_ratio,
            cfg.eval_in_val,
            cfg.eval_in_test,
            cfg.use_masks,
            cfg.mask_expand_pixels,
            cfg.white_background,
            blender_init_points=cfg.blender_init_points,
        )

    if resume_from is not None:
        model, sh_deg, start_step, adam = load_checkpoint(Path(resume_from))
        if adam is None:
            # warm-start: params/step/sh-degree restore exactly; Adam
            # moments re-estimate within ~100 steps (bias correction
            # restarts). Exact resume needs save_optimizer_state: true.
            logger.warning(
                f"checkpoint {resume_from} has no optimizer state — "
                "resuming with FRESH Adam moments (warm start, not an "
                "exact continuation)"
            )
            adam = init_adam_state(model.params)
        logger.info(
            f"resumed from {resume_from} at step {start_step} "
            f"({int(model.num_alive())} gaussians)"
        )
        loop = TrainLoopState(
            model=model, adam=adam, active_sh_degree=sh_deg, step=start_step
        )
    else:
        capacity = cfg.initial_capacity if cfg.initial_capacity > 0 else None
        model = init_gaussian_state(
            scene.pc.xyzs, scene.pc.rgbs, cfg.sh_degree, capacity=capacity
        )
        logger.info(
            f"initialized {scene.pc.nbr_points} gaussians "
            f"(capacity {model.capacity})"
        )
        adam = init_adam_state(model.params)
        loop = TrainLoopState(
            model=model,
            adam=adam,
            active_sh_degree=(
                0 if cfg.sh_degree_interval != 0 else cfg.sh_degree
            ),
        )

    render_fn = get_render_fn(cfg)
    train_step = make_train_step(cfg, render_fn)

    # optional multi-chip mesh:
    #   "tiles:N"           — image stripes sharded, params replicated
    #   "gauss:N"           — ZeRO-style: params/optimizer/stats sharded
    #   "gauss:G,tiles:T"   — 2-D: storage sharded over G, stripes over G*T
    mesh = None
    mesh_mode = ""
    sharded_steps = {}
    if cfg.mesh_shape:
        from ..parallel.mesh import make_mesh, make_mesh2d

        parts = dict(
            p.split(":") for p in cfg.mesh_shape.split(",")
        )
        if set(parts) == {"gauss", "tiles"}:
            mesh_mode = "gauss"
            mesh = make_mesh2d(int(parts["gauss"]), int(parts["tiles"]))
        elif set(parts) in ({"tiles"}, {"gauss"}):
            mesh_mode = next(iter(parts))
            mesh = make_mesh(
                int(parts[mesh_mode]),
                axis=mesh_mode if mesh_mode == "gauss" else "tiles",
            )
        else:
            raise ValueError(f"invalid mesh_shape: {cfg.mesh_shape}")
        logger.info(
            f"training on a {mesh.devices.size}-device mesh "
            f"{dict(zip(mesh.axis_names, mesh.devices.shape))}"
        )
        if mesh_mode == "gauss":
            from ..parallel.gauss_shard import shard_state

            loop.model = shard_state(loop.model, mesh)
            loop.adam = shard_state(loop.adam, mesh)

        def get_sharded_step(h, w):
            if (h, w) not in sharded_steps:
                if mesh_mode == "gauss":
                    from ..parallel.gauss_shard import (
                        make_gauss_sharded_train_step,
                    )

                    sharded_steps[(h, w)] = make_gauss_sharded_train_step(
                        cfg, mesh, render_fn, h, w
                    )
                else:
                    from ..parallel.shard import make_sharded_train_step

                    sharded_steps[(h, w)] = make_sharded_train_step(
                        cfg, mesh, render_fn, h, w
                    )
            return sharded_steps[(h, w)]

    # intersection-capacity watchdog for the tiled renderer: if the binned
    # intersection count approaches isect_mult * capacity, deep tiles would
    # be silently truncated — grow the multiplier and rebuild the step.
    # Under a mesh, capacities are per-chip and each chip bins only its
    # stripe, so the counter is the mesh-aware per-stripe MAX.
    isect_counter = None
    overflow_steps = 0  # steps whose gradient was zeroed by isect overflow
    if cfg.renderer == "tiled":

        def _make_counter():
            if mesh is not None:
                from ..parallel.shard import make_striped_isect_counter

                return make_striped_isect_counter(
                    mesh, cfg.tile_size, cfg.max_tiles, cfg.max_tiles,
                    ov_frac=cfg.ov_frac, small_budget=cfg.small_budget,
                    interleave=cfg.stripe_interleave,
                    partition=cfg.stripe_partition,
                )
            from ..ops.rasterize_tiled import make_isect_counter

            return make_isect_counter(
                cfg.tile_size, cfg.max_tiles, cfg.max_tiles,
                ov_frac=cfg.ov_frac, small_budget=cfg.small_budget,
            )

        isect_counter = _make_counter()

    def autotune_isect_mult(data):
        """Size the intersection capacity from the first frame's real
        count (the capacity drives the gather/scatter costs); the watchdog
        still grows it if later frames need more."""
        nonlocal render_fn, train_step, isect_counter
        if isect_counter is None:
            return
        vals = np.asarray(
            isect_counter(
                loop.model.params,
                loop.model.alive,
                jnp.asarray(data["w2c"]),
                jnp.asarray(data["K"]),
                height=data["height"],
                width=data["width"],
            )
        )
        n, n_ov = int(vals[0]), int(vals[1])
        cap = loop.model.capacity
        from ..ops.rasterize_tiled import max_isect_cap

        max_mult = max_isect_cap(cfg.isect_hbm_budget_mb) / max(cap, 1)
        # 1.2x headroom (A/B: 1.3 -> 1.15 saved ~9 ms/step at 1M by
        # shrinking every per-row cost; 1.2 keeps slack for
        # camera-to-camera variance, growth triggers at 90%)
        # FLOOR to 3 decimals: round() can exceed max_mult and re-cross the
        # int32 addressing bound the clamp exists for
        want = math.floor(min(max(0.25, n * 1.2 / cap), max_mult) * 1e3) / 1e3
        # choose the small-population budget + overflow fraction jointly
        # to minimize the binning sort domain C*b + M*ov_capacity — the
        # dominant cost at large N. The overflow population is pure
        # sort-domain/fusion overhead when unused (ov_capacity keeps a
        # 128-slot floor regardless), so the autotune may shrink ov_frac
        # well below the config default.
        from ..ops.rasterize_tiled import BUDGET_CANDIDATES, _ov_capacity

        m_cells = cfg.max_tiles * cfg.max_tiles
        want_b, want_ov, best_dom = cfg.small_budget, cfg.ov_frac, None
        for bb, need in zip(BUDGET_CANDIDATES, vals[2:]):
            if bb >= m_cells:
                continue
            # 2x headroom over the measured overflow population
            ovf = round(max(0.01, min(1.0, int(need) * 2.0 / cap)), 3)
            dom = cap * bb + m_cells * _ov_capacity(cap, ovf)
            if best_dom is None or dom < best_dom:
                want_b, want_ov, best_dom = bb, ovf, dom
        if (
            want != cfg.isect_mult
            or want_ov != cfg.ov_frac
            or want_b != cfg.small_budget
        ):
            logger.info(
                f"isect autotune: {n} intersections / {n_ov} overflow on "
                f"the first frame -> isect_mult {cfg.isect_mult} -> "
                f"{want}, ov_frac {cfg.ov_frac} -> {want_ov}, "
                f"small_budget {cfg.small_budget} -> {want_b}"
            )
            cfg.isect_mult = want
            cfg.ov_frac = want_ov
            cfg.small_budget = want_b
            render_fn = get_render_fn(cfg)
            train_step = make_train_step(cfg, render_fn)
            isect_counter = _make_counter()
            sharded_steps.clear()
            evaluator.invalidate(render_fn)

    def maybe_grow_isect_mult(n: int, at_step: int) -> None:
        """Grow the intersection capacity when the binned count nears it.
        Fed per-sampled-step from the train step's own binning (the
        'isects' loss-dict channel — no extra binning pass) and once per
        densify event right after the population jump."""
        nonlocal render_fn, train_step, overflow_steps
        cap = cfg.isect_mult * loop.model.capacity
        if n > cap:
            overflow_steps += 1
            logger.warning(
                f"step {at_step}: {n} intersections exceeded capacity "
                f"{cap:.0f} — that step's gradient was zeroed "
                f"({overflow_steps} overflow steps total)"
            )
            if tb_writer is not None:
                tb_report(
                    tb_writer, at_step,
                    {"train/overflow_steps": overflow_steps},
                )
        if n > 0.9 * cap:
            # bound growth by the per-intersection HBM budget (~320 B per
            # slot: feature matrix [16, icap] f32 + backward gradient
            # rows [icap, 128] bf16) so repeated doublings cannot OOM the
            # chip; capped steps keep zeroing overflowed gradients, which
            # is lossy but recoverable
            from ..ops.rasterize_tiled import max_isect_cap

            max_mult = max_isect_cap(cfg.isect_hbm_budget_mb) / max(
                loop.model.capacity, 1
            )
            want_mult = (
                math.floor(min(cfg.isect_mult * 2, max_mult) * 1e3) / 1e3
            )
            if want_mult <= cfg.isect_mult:
                logger.warning(
                    f"intersections {n} near capacity {cap:.0f} but "
                    f"isect_mult {cfg.isect_mult} is at the HBM budget "
                    f"({cfg.isect_hbm_budget_mb} MB) — not growing"
                )
                return
            cfg.isect_mult = want_mult
            logger.info(
                f"intersections {n} near capacity {cap:.0f}: raising "
                f"isect_mult to {cfg.isect_mult} (recompile)"
            )
            render_fn = get_render_fn(cfg)
            train_step = make_train_step(cfg, render_fn)
            sharded_steps.clear()
            evaluator.invalidate(render_fn)

    def check_isect_capacity(data):
        nonlocal render_fn, train_step, isect_counter, autotuned
        if isect_counter is None:
            return
        vals = np.asarray(
            isect_counter(
                loop.model.params,
                loop.model.alive,
                jnp.asarray(data["w2c"]),
                jnp.asarray(data["K"]),
                height=data["height"],
                width=data["width"],
            )
        )
        n, n_ov = int(vals[0]), int(vals[1])
        # RE-TIGHTEN an oversized capacity: the startup autotune ran on
        # the initial (tiny) population; after capacity growth the same
        # isect_mult can be 10x too large, taxing every per-row cost in
        # binning and the backward reduction (measured 240 -> 38 ms/step
        # at the 800^2 hard-scene regime). 2x hysteresis vs the 1.3x
        # sizing target avoids grow/shrink thrash; the rebuild lands at
        # a densify event where a recompile is often due anyway.
        want_tight = max(0.25, n * 1.2 / max(loop.model.capacity, 1))
        if cfg.isect_mult > 2.0 * want_tight:
            logger.info(
                f"isect_mult {cfg.isect_mult} oversized for "
                f"{n} intersections at capacity {loop.model.capacity} — "
                "re-running the binning autotune"
            )
            autotuned = False  # main loop re-runs autotune_isect_mult
            return
        from ..ops.rasterize_tiled import _ov_capacity

        ov_cap = _ov_capacity(loop.model.capacity, cfg.ov_frac)
        if n_ov > 0.85 * ov_cap:
            cfg.ov_frac = round(min(1.0, cfg.ov_frac * 2.0), 3)
            logger.info(
                f"{n_ov} overflow gaussians near capacity {ov_cap}: "
                f"raising ov_frac to {cfg.ov_frac} (recompile)"
            )
            render_fn = get_render_fn(cfg)
            train_step = make_train_step(cfg, render_fn)
            isect_counter = _make_counter()
            sharded_steps.clear()
            evaluator.invalidate(render_fn)
        maybe_grow_isect_mult(n, loop.step)

    densify_step = make_densify_step(cfg)
    sharded_densify_step = None  # built lazily under a gauss mesh
    means_lr = log_lerp_schedule(
        cfg.means_lr_init, cfg.means_lr_final, cfg.means_lr_schedule_max_steps
    )
    evaluator = Evaluator(cfg.eval_render_num, render_fn)
    key = jax.random.PRNGKey(cfg.random_seed)

    tb_writer = None
    if cfg.output is not None:
        tb_path = Path(cfg.output) / "tensorboard"
        logger.info(f"monitor training status: tensorboard --logdir {tb_path}")
        tb_writer = create_tb_writer(str(tb_path))

    viewer = None
    if cfg.view_online and cfg.output is not None:
        from ..viewer.integration import construct_training_viewer

        viewer = construct_training_viewer(loop, cfg, Path(cfg.output))

    save_iters = set(cfg.save_model_iterations)
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    # background precompiler: capacity growths and SH-degree bumps give
    # the jitted step a new signature; warm the next executable on a
    # compile thread (host-side) while the chip keeps training, so the
    # eventual rebuild is a compilation-cache hit instead of a stall
    precompiler = None
    if mesh is None:
        from .precompile import StepPrecompiler

        precompiler = StepPrecompiler(make_train_step, get_render_fn)

    # device-resident dataset cache: one upload at startup, per-step frame
    # fetch becomes a jitted on-device slice (streamed per-step transfers
    # serialize multi-MB uploads with every step — dominant on remote-
    # device links). Under a mesh the TRAIN split is uploaded
    # stripe-PADDED (rows to a multiple of the device count; pad rows
    # masked out), so sharded steps take device-resident frames with no
    # per-step host padding/upload. Falls back to streaming when the
    # split exceeds the HBM budget.
    frame_cache = None
    eval_cache = None
    if cfg.data_device_cache:
        from ..scene.device_cache import build_cache

        frame_cache = build_cache(
            scene, "train", cfg.data_device_cache_mb,
            num_workers=max(1, cfg.dataloader_workers),
            pad_rows_to=(
                mesh.devices.size * max(1, cfg.stripe_interleave)
                if mesh is not None
                else 1
            ),
        )
        if scene.nbr_data("eval") > 0 and frame_cache is not None:
            # eval renders single-device full frames: keep it UNPADDED
            # (padded mask rows would count as ground truth in PSNR)
            eval_cache = build_cache(
                scene, "eval", cfg.data_device_cache_mb,
                num_workers=max(1, cfg.dataloader_workers),
            )

    t_start = time.time()
    last_loss = float("nan")
    profiler_active = False
    autotuned = False
    # async loss readback: a blocking float() per sampled step costs ~3
    # device round trips on a remote-device link; instead start an async
    # device->host copy and convert a few samples later, reporting to TB
    # with the ORIGINAL step. Drained fully at loop end.
    pending_losses: list = []

    def _drain_losses(min_pending: int) -> None:
        nonlocal last_loss
        while len(pending_losses) > min_pending:
            old_step, old_ld = pending_losses.pop(0)
            losses = {k: float(v) for k, v in old_ld.items()}
            n_isects = losses.pop("isects", None)
            last_loss = losses["total"]
            if tb_writer is not None:
                tb_report(tb_writer, old_step, {"train/loss": losses})
            if n_isects is not None:
                if tb_writer is not None:
                    tb_report(
                        tb_writer, old_step,
                        {"train/num_isects": n_isects},
                    )
                maybe_grow_isect_mult(int(n_isects), old_step)
    # wall-time buckets for the host loop (EGS_TPU_LOOP_TIMING=1 logs the
    # breakdown every 100 steps — separates device work from host stalls)
    import collections as _collections
    import os as _os

    loop_timing = _os.environ.get("EGS_TPU_LOOP_TIMING") == "1"
    buckets: Dict[str, float] = _collections.defaultdict(float)
    t_prev = time.perf_counter()

    def _bucket(name: str) -> None:
        nonlocal t_prev
        if loop_timing:
            now = time.perf_counter()
            buckets[name] += now - t_prev
            t_prev = now

    if frame_cache is not None:
        shuffled = list(range(scene.nbr_data("train")))
        random.shuffle(shuffled)
        data_iter = (frame_cache.get(i) for i in shuffled)
    else:
        data_iter = prefetch_frames(
            scene, "train", shuffle=True, num_workers=cfg.dataloader_workers
        )
    for data in data_iter:
        _bucket("data")
        if loop.step >= cfg.total_iterations:
            # resumed runs start mid-schedule; the index tiling still
            # spans the full budget
            break
        loop.step += 1
        step = loop.step
        all_tb_info: Dict[str, Any] = {}

        if not autotuned:
            autotune_isect_mult(data)
            autotuned = True

        # optional profiler window (steps 10 .. 10+profile_steps)
        if cfg.profile_steps > 0 and cfg.output is not None:
            if step == 10 and not profiler_active:
                jax.profiler.start_trace(str(Path(cfg.output) / "profile"))
                profiler_active = True
            elif profiler_active and step == 10 + cfg.profile_steps:
                jax.profiler.stop_trace()
                profiler_active = False
                logger.info(
                    f"profiler trace written to {Path(cfg.output)/'profile'}"
                )

        in_refine = cfg.refine_start < step <= cfg.refine_stop
        densify_now = (
            in_refine and (step - cfg.refine_start) % cfg.refine_every == 0
        )
        reset_now = (
            in_refine
            and (step - cfg.refine_start) % cfg.reset_opacities_every == 0
        )

        if mesh is not None:
            # pad rows to a stripe multiple; padded rows are masked out.
            # With the device cache on, frames arrive already padded and
            # device-resident (zero per-step host work).
            n_dev = mesh.devices.size * max(1, cfg.stripe_interleave)
            h = data["height"]
            hp = -(-h // n_dev) * n_dev
            if getattr(data["image"], "shape", (0,))[0] == hp:
                image = data["image"]
                mask_arr = data["mask"]
            else:
                image = np.zeros((hp, data["width"], 3), np.float32)
                image[:h] = data["image"]
                mask_arr = np.ones((hp, data["width"]), np.float32)
                mask_arr[:h] = data["mask"]
            sstep = get_sharded_step(hp, data["width"])
            loop.model, loop.adam, ld = sstep(
                loop.model,
                loop.adam,
                jnp.asarray(data["w2c"]),
                jnp.asarray(data["K"]),
                jnp.asarray(image),
                jnp.asarray(mask_arr),
                np.float32(means_lr(step)),
                np.bool_(in_refine),
                np.bool_(densify_now),
                np.bool_(reset_now),
                sh_degree=loop.active_sh_degree,
            )
        else:
            loop.model, loop.adam, ld = train_step(
                loop.model,
                loop.adam,
                jnp.asarray(data["w2c"]),
                jnp.asarray(data["K"]),
                jnp.asarray(data["image"]),
                jnp.asarray(data["mask"]),
                np.float32(means_lr(step)),
                np.bool_(in_refine),
                np.bool_(densify_now),
                np.bool_(reset_now),
                height=data["height"],
                width=data["width"],
                sh_degree=loop.active_sh_degree,
            )
        _bucket("dispatch")

        log_now = (
            step == 1
            or step % cfg.log_every == 0
            or step % cfg.eval_every == 0
            or (in_refine and (step - cfg.refine_start) % cfg.refine_every == 0)
        )
        if log_now or step % 10 == 0:
            for v in ld.values():
                v.copy_to_host_async()
            pending_losses.append((step, ld))
            _drain_losses(min_pending=3)
        _bucket("loss_sync")

        # checkpoint
        if step in save_iters and cfg.output is not None:
            save_checkpoint(
                Path(cfg.output) / "checkpoints" / f"iterations_{step}.npz",
                loop.model,
                loop.active_sh_degree,
                step,
                adam=loop.adam if cfg.save_optimizer_state else None,
            )

        _bucket("ckpt")

        # eval
        if scene.nbr_data("eval") > 0 and (
            step == 1 or step % cfg.eval_every == 0
        ):
            metrics = evaluator.evaluate(
                scene,
                "eval",
                loop.model,
                loop.active_sh_degree,
                background,
                num_workers=cfg.dataloader_workers,
                cache=eval_cache,
            )
            for k, v in metrics.items():
                if "render" in k:
                    all_tb_info[f"render/{k}"] = v
                elif k in (
                    "psnr", "ssim", "lpips", "lpips_proxy", "fps",
                    "latency_ms", "latency_device_ms",
                ):
                    all_tb_info[f"eval/{k}"] = v
            logger.info(
                "eval @ step %d: %s", step,
                ", ".join(
                    f"{k}={v:.4f}" for k, v in metrics.items()
                    if isinstance(v, float)
                ),
            )
        _bucket("eval")

        # refine events
        if densify_now:
            check_isect_capacity(data)
            key, sub = jax.random.split(key)
            if mesh_mode == "gauss":
                # device-resident shard-local densify (no host gather:
                # at 10M Gaussians a gather/reshard would move multi-GB
                # over PCIe every refine_every steps)
                if sharded_densify_step is None:
                    from ..parallel.gauss_shard import (
                        make_sharded_densify_step,
                    )

                    sharded_densify_step = make_sharded_densify_step(
                        _dcfg(cfg), mesh
                    )
                info = run_sharded_densify_with_growth(
                    loop, sharded_densify_step, sub, cfg, mesh
                )
            else:
                info = run_densify_with_growth(loop, densify_step, sub, cfg)
            all_tb_info["train/densify"] = {
                "split": info["split"],
                "clone": info["clone"],
            }
            all_tb_info["train/prune"] = {
                "low_opacity": info["prune_low_opacity"],
                "large_radii": info["prune_large_radii"],
                "large_scale": info["prune_large_scale"],
            }
            all_tb_info["train/nbr_gaussians"] = info["nbr_gaussians"]
            if precompiler is not None:
                cap_now = loop.model.capacity
                # predict the next pre-emptive doubling (threshold 0.85 in
                # run_densify_with_growth; warm from 0.55 for headroom).
                # If an SH bump lands before the growth likely does, warm
                # the upgraded degree too — the growth-time step will use
                # whichever is active.
                if (
                    info["nbr_gaussians"] > 0.55 * cap_now
                    and cap_now < cfg.max_capacity
                ):
                    next_cap = min(cap_now * 2, cfg.max_capacity)
                    sh_targets = {loop.active_sh_degree}
                    if (
                        cfg.sh_degree_interval != 0
                        and loop.active_sh_degree < cfg.sh_degree
                        and cfg.sh_degree_interval <= 2 * cfg.refine_every
                    ):
                        sh_targets.add(loop.active_sh_degree + 1)
                    for sh_t in sorted(sh_targets):
                        precompiler.warm(
                            cfg, loop.model, loop.adam,
                            data["height"], data["width"], sh_t, next_cap,
                        )
        _bucket("densify")
        if reset_now:
            loop.model, loop.adam = reset_opacities(
                loop.model, loop.adam, cfg.min_opacity
            )

        # SH degree upgrade
        if (
            precompiler is not None
            and cfg.sh_degree_interval != 0
            and loop.active_sh_degree < cfg.sh_degree
            and step % cfg.sh_degree_interval
            == max(1, cfg.sh_degree_interval - 60)
        ):
            precompiler.warm(
                cfg, loop.model, loop.adam, data["height"], data["width"],
                loop.active_sh_degree + 1, loop.model.capacity,
            )
        if (
            cfg.sh_degree_interval != 0
            and step % cfg.sh_degree_interval == 0
        ):
            loop.active_sh_degree = min(
                loop.active_sh_degree + 1, cfg.sh_degree
            )

        if tb_writer is not None and log_now:
            tb_report(tb_writer, step, all_tb_info)

        _bucket("other")
        if step % 100 == 0:
            elapsed = time.time() - t_start
            logger.info(
                f"step {step}/{cfg.total_iterations} "
                f"loss={last_loss:.5f} "
                f"({step / elapsed:.2f} it/s)"
            )
            if loop_timing and buckets:
                total = sum(buckets.values())
                parts = " ".join(
                    f"{k}={v*1e3/100:.1f}ms" for k, v in sorted(
                        buckets.items(), key=lambda kv: -kv[1]
                    )
                )
                logger.info(
                    f"loop timing (per step over last 100): {parts} "
                    f"total={total*1e3/100:.1f}ms"
                )
                buckets.clear()

        if viewer is not None:
            viewer.update_render_image()

    _drain_losses(min_pending=0)
    if precompiler is not None:
        precompiler.shutdown()
    if tb_writer is not None:
        tb_writer.close()
    return loop
