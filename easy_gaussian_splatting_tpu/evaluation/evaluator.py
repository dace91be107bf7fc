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
from .lpips import get_lpips

logger = logging.getLogger(__name__)


class Evaluator:
    def __init__(self, eval_render_num: int, render_fn: Callable):
        self.eval_render_num = eval_render_num
        self.render_fn = render_fn
        self.lpips = get_lpips()  # "vgg" (pretrained) or "proxy" (seeded)
        self._jitted = {}

    def invalidate(self, render_fn: Callable | None = None) -> None:
        """Drop the jitted render closures (optionally swapping in a new
        render function). The trainer calls this whenever it rebuilds its
        renderer (isect-capacity / overflow autotune recompiles), since the
        closures capture the old one."""
        if render_fn is not None:
            self.render_fn = render_fn
        self._jitted.clear()

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

    def _loop_fn(self, height: int, width: int, sh_degree: int):
        """Jitted render chain with a data dependency between iterations
        (each camera is perturbed by the previous render), so remote
        dispatch caching cannot serve repeats and the device must execute
        every render serially. The iteration count is a TRACED fori_loop
        bound — one executable serves every chain length, so the metric
        costs one compile per renderer, not one per length. Differencing
        two loop lengths cancels the fixed dispatch/link cost — the basis
        of ``latency_device_ms`` (CLAUDE.md tunnel-timing rules)."""
        key = (height, width, sh_degree, "lat")
        if key not in self._jitted:

            @jax.jit
            def run(params, alive, w2c, K, background, n_iters):
                absd = jnp.zeros((params.means.shape[0], 2), jnp.float32)

                def body(_i, carry):
                    w2c_c, acc = carry
                    camera = CameraView(
                        w2c=w2c_c, K=K, width=width, height=height
                    )
                    out = self.render_fn(
                        params, alive, camera, sh_degree, background, absd
                    )
                    v = out.image[0, 0, 0]
                    w2c_n = w2c_c.at[0, 3].add(1e-12 * v + 1e-7)
                    return w2c_n, acc + v

                _, acc = jax.lax.fori_loop(
                    0, n_iters, body, (w2c, jnp.float32(0.0))
                )
                return acc

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
        cache=None,
    ) -> Dict[str, Any]:
        from ..scene.scene import prefetch_frames

        n = scene.nbr_data(split)
        # proxy-weight LPIPS values are NOT comparable to published
        # LPIPS-VGG numbers (/root/reference/eval.py:27); segregate the
        # metric name so dashboards/logs can never conflate the two
        lpips_key = "lpips" if self.lpips.kind == "vgg" else "lpips_proxy"
        metrics: Dict[str, Any] = {"psnr": 0.0, "ssim": 0.0, lpips_key: 0.0}
        render_indexes = list(range(n))
        if len(render_indexes) > self.eval_render_num:
            render_indexes = random.sample(
                render_indexes, k=self.eval_render_num
            )
        # Dispatch ALL frames first, fetch once at the end: per-frame
        # float()/block_until_ready costs ~3 device round trips per frame
        # on a remote-device link (measured ~1.4 s/frame on the axon
        # tunnel); batched dispatch + one fused metric fetch amortizes it.
        psnrs = []
        ssims = []
        lpips_pairs = []
        renders = []
        t0 = None
        last_args = None
        if cache is not None:
            # device-resident split: per-frame fetch is a jitted on-device
            # slice (no host->device image transfers inside the FPS window)
            frames_iter = (cache.get(i) for i in range(n))
        else:
            frames_iter = prefetch_frames(
                scene, split, num_workers=num_workers
            )
        for i, data in enumerate(frames_iter):
            run = self._step_fn(data["height"], data["width"], sh_degree)
            w2c = jnp.asarray(data["w2c"])
            K = jnp.asarray(data["K"])
            image = jnp.asarray(data["image"])
            mask = jnp.asarray(data["mask"])
            if i == 0:
                # warm-up: exclude jit compilation from the FPS measurement
                # (force with a host fetch — block_until_ready can return
                # before remote execution completes on tunnel devices)
                np.asarray(
                    run(
                        model.params, model.alive, w2c, K, background,
                        image, mask,
                    )[2]
                )
                t0 = time.perf_counter()
            last_args = (
                model.params, model.alive, w2c, K, background, image, mask,
            )
            render_img, comp, m_psnr, m_ssim = run(*last_args)
            psnrs.append(m_psnr)
            ssims.append(m_ssim)
            lpips_pairs.append((comp, image))
            if i in render_indexes:
                # keep device arrays; the multi-MB device->host fetches
                # happen after the FPS window closes (below)
                renders.append((data["image"], render_img))

        if psnrs:
            vals = np.asarray(jnp.stack(psnrs + ssims))  # one fused fetch
            cost = time.perf_counter() - t0 if t0 is not None else 0.0
            metrics["psnr"] = float(vals[: len(psnrs)].sum())
            metrics["ssim"] = float(vals[len(psnrs):].sum())
        else:
            cost = 0.0
        # LPIPS after the timed render window (it's a separate VGG pass,
        # not part of render FPS): dispatch all frames, one fused fetch
        lpips_vals = [
            self.lpips.device_fn(comp, gt) for comp, gt in lpips_pairs
        ]
        if lpips_vals:
            metrics[lpips_key] = float(
                np.asarray(jnp.stack(lpips_vals)).sum()
            )
        for render_count, (gt, render_img) in enumerate(renders, start=1):
            side = np.concatenate(
                [np.asarray(gt), np.asarray(render_img)], axis=1
            )
            metrics[f"render_{render_count}"] = side

        for k in ("psnr", "ssim", lpips_key):
            metrics[k] /= max(n, 1)
        # fps is pipelined THROUGHPUT (all frames dispatched, one fused
        # fetch forces the chain). latency_ms is the blocking wall time of
        # ONE render end-to-end (median of 3) — the number comparable to
        # per-frame timing; on a remote-device link it includes the link
        # round trip, so it upper-bounds on-device latency.
        metrics["fps"] = n / cost if cost > 0 else 0.0
        if n > 0 and last_args is not None:
            times = []
            for rep in range(3):
                # perturb an input per repetition: identical (executable,
                # args) dispatches can be served from a cache on the
                # tunnel device (CLAUDE.md timing rules), which would make
                # this report ~link RTT instead of render latency
                args = list(last_args)
                args[2] = args[2] + jnp.float32(1e-6) * (rep + 1)
                t1 = time.perf_counter()
                np.asarray(run(*args)[2])
                times.append(time.perf_counter() - t1)
            metrics["latency_ms"] = float(np.median(times) * 1e3)
            # true ON-DEVICE per-frame render latency (the number
            # comparable to the reference's per-frame FPS timing,
            # /root/reference/eval.py:40-43,70): time a jitted 6-render
            # chain and a 2-render chain (data-dependent iterations, so
            # nothing can be cached or overlapped away) and difference —
            # the fixed dispatch + link round trip cancels, leaving 4x
            # the pure device render time.
            h_, w_ = last_args[5].shape[0], last_args[5].shape[1]
            sh_ = sh_degree
            params_, alive_, w2c_, K_, bg_ = (
                last_args[0], last_args[1], last_args[2], last_args[3],
                last_args[4],
            )
            lf = self._loop_fn(h_, w_, sh_)
            loop_times = {}
            for n_it in (2, 6):
                # warm-up, then 2 timed reps with distinct data (the
                # executable is shared across lengths; n_iters is traced)
                np.asarray(
                    lf(params_, alive_, w2c_, K_, bg_, jnp.int32(n_it))
                )
                reps = []
                for rep in range(2):
                    w2c_r = w2c_ + jnp.float32(1e-6) * (rep + 1)
                    t1 = time.perf_counter()
                    np.asarray(
                        lf(params_, alive_, w2c_r, K_, bg_,
                           jnp.int32(n_it))
                    )
                    reps.append(time.perf_counter() - t1)
                loop_times[n_it] = min(reps)
            dev = max(loop_times[6] - loop_times[2], 0.0) / 4.0
            metrics["latency_device_ms"] = float(dev * 1e3)
        return metrics
