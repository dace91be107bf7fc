"""Differentiable forward render of a Gaussian model for one camera.

Behavioral spec: mirrors ``GaussianModel.forward`` (``/root/reference/model/
gaussian.py:351-374``): activations (exp scales, sigmoid opacities, SH
concat), a single rasterization call with the active SH degree and a
background color, and a [0,1] clamp on the rendered image. The returned
``radii`` and the absgrad cotangent channel feed ``update_statistics``
(``/root/reference/model/gaussian.py:188-197``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.projection import CameraIntrinsics, project_gaussians
from ..ops.rasterize_ref import rasterize
from ..ops.sh import eval_sh_color_flat
from .gaussians import GaussianParams


class CameraView(NamedTuple):
    """One camera: world->camera transform + intrinsics. Width/height are
    static Python ints (per-resolution jit specialization).

    ``full_height``/``y_offset`` select a horizontal stripe of a larger
    viewport (the multi-chip image-sharding path): projection — the EWA
    Jacobian frustum clamp and the visibility cull — runs in the FULL
    image's geometry so every chip sees identical conics/radii, then the
    screen means are shifted down by ``y_offset`` rows and only
    ``height`` rows are rasterized. This keeps the sharded render exactly
    equal to the monolithic one (stripe-local projection would shift the
    fov-dependent clamp, tests/test_parallel.py)."""

    w2c: jnp.ndarray  # [4, 4]
    K: jnp.ndarray  # [3, 3]
    width: int
    height: int  # rasterized rows (the stripe height when sharded)
    full_height: int | None = None  # projection viewport rows (None: height)
    y_offset: jnp.ndarray | None = None  # stripe's first row (traced ok)
    # adaptive stripes: only rows [0, y_limit) of the window receive
    # content (traced row count; the tiled rasterizer skips binning
    # beyond it, parallel/shard.py's adaptive partition)
    y_limit: jnp.ndarray | None = None


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [H, W, 3] clamped to [0, 1]
    alpha: jnp.ndarray  # [H, W]
    radii: jnp.ndarray  # [C] screen radii in pixels, 0 => culled
    # binned intersection count (tiled rasterizer only; None for the
    # oracle) — the trainer's capacity watchdog reads it from the loss
    # dict at no extra cost
    num_isects: jnp.ndarray | None = None


def render(
    params: GaussianParams,
    alive: jnp.ndarray,  # [C] bool
    camera: CameraView,
    sh_degree: int,
    background: jnp.ndarray,  # [3]
    absgrad_dummy: jnp.ndarray,  # [C, 2] zeros; cotangent = absgrad
    chunk: int = 256,
    rasterizer=None,  # (m2d, conics, colors, opac, depths, bg, absdummy,
    # H, W, radii=...) -> (img, alpha); default: the oracle
) -> RenderOutput:
    scales = jnp.exp(params.log_scales)
    opacities = jax.nn.sigmoid(params.logit_opacities) * alive.astype(jnp.float32)

    proj_h = (
        camera.full_height if camera.full_height is not None else camera.height
    )
    intr = CameraIntrinsics.from_K(camera.K, camera.width, proj_h)
    proj = project_gaussians(params.means, params.quats, scales, camera.w2c, intr)
    if camera.y_offset is not None:
        # stripe rendering: shift to stripe-local rows (see CameraView)
        proj = proj._replace(
            means2d=proj.means2d
            - jnp.stack(
                [jnp.zeros((), jnp.float32), camera.y_offset]
            )[None, :]
        )

    # SH color along the camera->Gaussian direction, columnwise [N] math
    # with traced-scalar camera components. (An earlier fori-loop
    # microbenchmark attributed ~8-11 ms to the dirs form; top-level A/B
    # of the full train step shows all forms within noise — the looped
    # harness let XLA hoist work in some variants. Kept columnwise to
    # match the projection code's idiom.)
    r_cw = camera.w2c[:3, :3]
    t_cw = camera.w2c[:3, 3]
    cam = [
        -(r_cw[0, j] * t_cw[0] + r_cw[1, j] * t_cw[1] + r_cw[2, j] * t_cw[2])
        for j in range(3)
    ]
    dirs = jnp.stack(
        [params.means[:, j] - cam[j] for j in range(3)], axis=1
    )
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    # FLAT SH coefficients: rank-2 intermediates keep the VJP's
    # coefficient cotangent lane-padded (2.8x) instead of the rank-3
    # pad/add fusion XLA lays out at 42.7x expansion (ops/sh.py docs)
    c = params.sh_0.shape[0]
    colors = eval_sh_color_flat(
        sh_degree,
        params.sh_0.reshape(c, 3),
        params.sh_rest.reshape(c, -1),
        dirs,
    )  # [C, 3]

    opac_eff = opacities * (proj.radii > 0.0).astype(jnp.float32)
    if rasterizer is None:
        rasterizer = functools.partial(rasterize, chunk=chunk)
    kw = {}
    if camera.y_limit is not None:
        kw["y_limit"] = camera.y_limit
    out = rasterizer(
        proj.means2d,
        proj.conics,
        colors,
        opac_eff,
        proj.depths,
        background,
        absgrad_dummy,
        camera.height,
        camera.width,
        radii=proj.radii,
        **kw,
    )
    img, alpha = out[0], out[1]
    num_isects = out[2] if len(out) > 2 else None
    img = jnp.clip(img, 0.0, 1.0)
    return RenderOutput(
        image=img, alpha=alpha, radii=proj.radii, num_isects=num_isects
    )
