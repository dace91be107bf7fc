"""Background pre-compilation of predictable train-step recompiles.

Every capacity growth, SH-degree upgrade, or binning-capacity retune gives
the jitted train step a new (shape, static-arg) signature, and XLA
compiles it synchronously on first use — stalling the training loop for
seconds (tens of seconds over a remote-device link; measured as the
dominant whole-run cost in ``docs/PLAN.md`` "Loop findings"). The events
are PREDICTABLE — capacity doubles when the population nears the buffer,
SH bumps on a fixed schedule — so this module traces + compiles the next
executable on a background thread while the chip keeps training. XLA
compilation runs host-side (PJRT AOT), so it never contends with device
execution; the warmed executable lands in the persistent compilation
cache, turning the eventual foreground rebuild into a cache hit.

The reference has no analog: torch+CUDA kernels have no shape
specialization to recompile (`/root/reference/model/gaussian.py` grows
tensors freely); this is the TPU-native answer to keeping XLA's
static-shape model out of the wall-clock.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import logging
import time
from typing import Callable

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _specs_with_capacity(tree, old_c: int, new_c: int):
    """ShapeDtypeStruct pytree of ``tree`` with every capacity-major
    leading dim ``old_c`` rewritten to ``new_c``."""

    def f(x):
        shape = tuple(x.shape)
        if len(shape) >= 1 and shape[0] == old_c:
            shape = (new_c,) + shape[1:]
        return jax.ShapeDtypeStruct(shape, x.dtype)

    return jax.tree.map(f, tree)


class StepPrecompiler:
    """One background compile worker + a dedup set of warmed signatures."""

    def __init__(self, make_step: Callable, get_render: Callable):
        # make_step(cfg, render_fn) -> jitted step; get_render(cfg) -> fn
        self._make_step = make_step
        self._get_render = get_render
        self._pool = concurrent.futures.ThreadPoolExecutor(
            2, thread_name_prefix="egs-precompile"
        )
        self._done = set()

    def warm(self, cfg, model, adam, height: int, width: int,
             sh_degree: int, capacity: int):
        """Queue a background trace+compile of the train step at
        ``capacity`` (other statics snapshot ``cfg`` now). Returns the
        submitted future, or None if this signature was already queued."""
        key = (
            capacity, height, width, sh_degree, cfg.isect_mult,
            cfg.ov_frac, cfg.small_budget, cfg.tile_size, cfg.max_tiles,
        )
        if key in self._done:
            return None
        self._done.add(key)
        cfg_snap = dataclasses.replace(cfg)
        old_c = model.params.means.shape[0]
        model_spec = _specs_with_capacity(model, old_c, capacity)
        adam_spec = _specs_with_capacity(adam, old_c, capacity)
        return self._pool.submit(
            self._compile, cfg_snap, model_spec, adam_spec,
            height, width, sh_degree, capacity,
        )

    def _compile(self, cfg, model_spec, adam_spec, height, width,
                 sh_degree, capacity):
        try:
            t0 = time.perf_counter()
            step = self._make_step(cfg, self._get_render(cfg))
            f32 = jax.numpy.float32
            sds = jax.ShapeDtypeStruct
            step.lower(
                model_spec,
                adam_spec,
                sds((4, 4), f32),
                sds((3, 3), f32),
                sds((height, width, 3), f32),
                sds((height, width), f32),
                sds((), f32),
                sds((), np.bool_),
                sds((), np.bool_),
                sds((), np.bool_),
                height=height,
                width=width,
                sh_degree=sh_degree,
            ).compile()
            logger.info(
                f"precompiled train step for capacity {capacity}, "
                f"sh {sh_degree} in {time.perf_counter() - t0:.1f}s "
                "(background)"
            )
        except Exception as e:  # never break training from the warmer
            logger.warning(
                f"background precompile (capacity {capacity}, "
                f"sh {sh_degree}) failed: {e}"
            )

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
