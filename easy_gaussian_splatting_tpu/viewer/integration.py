"""Viewer <-> model integration.

Behavioral spec (``/root/reference/train.py:167-186``,
``/root/reference/launch_viewer.py``, ``/root/reference/utils.py:28-45``):
build a render closure over the Gaussian model for arbitrary viewer
cameras, load ``cameras.json``, and construct the Viewer (training mode
wraps the closure in DelayRender)."""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import List

import numpy as np

from .camera import CameraState
from .server import Viewer

logger = logging.getLogger(__name__)


def load_camera_states(path: Path) -> List[CameraState]:
    camera_states = []
    with open(Path(path) / "cameras.json", "r") as f:
        for cam in json.load(f):
            c2w = np.eye(4)
            c2w[:3, :3] = np.array(cam["rotation"])
            c2w[:3, 3] = np.array(cam["position"])
            w2c = np.linalg.inv(c2w)
            K = np.array(
                [
                    [cam["fx"], 0, cam["width"] / 2],
                    [0, cam["fy"], cam["height"] / 2],
                    [0, 0, 1],
                ],
                np.float32,
            )
            camera_states.append(
                CameraState(w2c, K, cam["width"], cam["height"])
            )
    return camera_states


def make_gs_render_func(get_state, get_sh_degree, background, render_fn,
                        cfg=None, base_pixels=None):
    """Render closure over (possibly training) model state. ``get_state`` /
    ``get_sh_degree`` are callables so the training loop's latest state is
    picked up (the reference reads the live module the same way).

    The render is jitted per (width, height, sh_degree, capacity) —
    running the render graph eagerly would dispatch hundreds of ops
    one-by-one over a remote-device link (~1 RTT each).

    With ``cfg`` + ``base_pixels`` (the offline viewer path), the
    intersection capacity is RE-SCALED per resolution: intersection
    counts scale ~linearly with pixels, and the per-icap costs (feature
    pack gather, kernel chunk walk) are paid at the STATIC capacity —
    without scaling, a 180p interaction frame carries the full-res
    buffers (measured ~25 ms of dead per-frame cost at a 2.1M-Gaussian
    checkpoint). 1.5x headroom over the linear estimate; undercounts
    cost only truncated tiles in a moving preview frame."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models.render import CameraView

    @functools.lru_cache(maxsize=8)
    def _jitted(width: int, height: int, sh_degree: int):
        rf = render_fn
        if (
            cfg is not None
            and base_pixels
            and getattr(cfg, "renderer", "") == "tiled"
        ):
            import dataclasses

            from ..training.trainer import get_render_fn

            scale = min(1.0, width * height / base_pixels * 1.5 + 0.05)
            c2 = dataclasses.replace(
                cfg, isect_mult=max(0.25, cfg.isect_mult * scale)
            )
            rf = get_render_fn(c2)

        @jax.jit
        def run(params, alive, w2c, K, absd):
            return rf(
                params,
                alive,
                CameraView(w2c=w2c, K=K, width=width, height=height),
                sh_degree,
                background,
                absd,
            ).image

        return run

    def gs_render_func(camera_state: CameraState) -> np.ndarray:
        state = get_state()
        sh = int(get_sh_degree())
        cap = getattr(camera_state, "sh_cap", None)
        if cap is not None:
            # interactive degradation: the client caps the SH degree
            # while the camera moves (a large share of per-frame compute
            # at 1M+ Gaussians is degree-3 SH evaluation)
            sh = min(sh, int(cap))
        run = _jitted(
            int(camera_state.width),
            int(camera_state.height),
            sh,
        )
        img = run(
            state.params,
            state.alive,
            jnp.asarray(camera_state.w2c, jnp.float32),
            jnp.asarray(camera_state.K, jnp.float32),
            jnp.zeros((state.capacity, 2), jnp.float32),
        )
        return np.asarray(img)

    return gs_render_func


def construct_training_viewer(loop, cfg, output_dir: Path) -> Viewer:
    import jax.numpy as jnp

    from ..training.trainer import get_render_fn

    camera_states = load_camera_states(output_dir)
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    render_func = make_gs_render_func(
        lambda: loop.model,
        lambda: loop.active_sh_degree,
        background,
        get_render_fn(cfg),
    )
    return Viewer(
        render_func,
        camera_states,
        in_training_mode=True,
        video_output_dir=output_dir / "videos",
    )
