"""Evaluator: render the eval split, average PSNR/SSIM/LPIPS, measure FPS.

Behavioral spec (``/root/reference/eval.py:22-73``): iterate the eval
dataloader, apply the same mask compositing as the loss
(``render = mask*gt + (1-mask)*render``), accumulate PSNR/SSIM/LPIPS,
time the renders for FPS, and keep ``eval_render_num`` random GT|render
side-by-side images for TensorBoard."""

from __future__ import annotations

import logging
import random
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianModelState
from ..models.loss import composite_mask
from ..models.render import CameraView
from .metrics import psnr, ssim
from .lpips import lpips_fn_or_none

logger = logging.getLogger(__name__)


class Evaluator:
    def __init__(self, eval_render_num: int, render_fn: Callable):
        self.eval_render_num = eval_render_num
        self.render_fn = render_fn
        self.lpips = lpips_fn_or_none()
        self._jitted = {}

    def _step_fn(self, height: int, width: int, sh_degree: int):
        key = (height, width, sh_degree)
        if key not in self._jitted:

            @jax.jit
            def run(params, alive, w2c, K, background, image, mask):
                camera = CameraView(w2c=w2c, K=K, width=width, height=height)
                absd = jnp.zeros((params.means.shape[0], 2), jnp.float32)
                out = self.render_fn(
                    params, alive, camera, sh_degree, background, absd
                )
                comp = composite_mask(out.image, image, mask)
                m_psnr = psnr(comp, image)
                m_ssim = ssim(image, comp)
                return out.image, comp, m_psnr, m_ssim

            self._jitted[key] = run
        return self._jitted[key]

    def evaluate(
        self,
        scene,
        split: str,
        model: GaussianModelState,
        sh_degree: int,
        background: jnp.ndarray,
        num_workers: int = 3,
    ) -> Dict[str, Any]:
        from ..scene.scene import prefetch_frames

        n = scene.nbr_data(split)
        metrics: Dict[str, Any] = {"psnr": 0.0, "ssim": 0.0, "lpips": 0.0}
        render_indexes = list(range(n))
        if len(render_indexes) > self.eval_render_num:
            render_indexes = random.sample(
                render_indexes, k=self.eval_render_num
            )
        render_count = 0
        cost = 0.0
        for i, data in enumerate(
            prefetch_frames(scene, split, num_workers=num_workers)
        ):
            run = self._step_fn(data["height"], data["width"], sh_degree)
            w2c = jnp.asarray(data["w2c"])
            K = jnp.asarray(data["K"])
            image = jnp.asarray(data["image"])
            mask = jnp.asarray(data["mask"])
            if i == 0:
                # warm-up: exclude jit compilation from the FPS measurement
                run(
                    model.params, model.alive, w2c, K, background, image,
                    mask,
                )[0].block_until_ready()
            t0 = time.time()
            render_img, comp, m_psnr, m_ssim = run(
                model.params, model.alive, w2c, K, background, image, mask
            )
            render_img.block_until_ready()
            cost += time.time() - t0
            metrics["psnr"] += float(m_psnr)
            metrics["ssim"] += float(m_ssim)
            if self.lpips is not None:
                metrics["lpips"] += float(self.lpips(np.asarray(comp), data["image"]))
            if i in render_indexes:
                render_count += 1
                side = np.concatenate(
                    [data["image"], np.asarray(render_img)], axis=1
                )
                metrics[f"render_{render_count}"] = side

        for k in ("psnr", "ssim", "lpips"):
            metrics[k] /= max(n, 1)
        metrics["fps"] = n / cost if cost > 0 else 0.0
        return metrics
