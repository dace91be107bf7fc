"""LPIPS (VGG backbone) — gated on locally-available weights.

Behavioral spec: the reference uses torchmetrics
``LearnedPerceptualImagePatchSimilarity("vgg", normalize=True)``
(``/root/reference/eval.py:27``), which needs torchvision's pretrained
VGG16 features plus LPIPS linear heads. This environment has no torchvision
and no network egress, so those weights cannot be obtained here.

Mechanism: if ``EGS_TPU_LPIPS_WEIGHTS`` points at an ``.npz`` with the VGG16
conv weights (keys ``conv{i}_w``/``conv{i}_b`` for the 13 convs, torch OIHW
layout) and linear head weights (``lin{0..4}_w``), a pure-JAX LPIPS is
built; otherwise LPIPS is reported as unavailable and the evaluator skips
it (logged once)."""

from __future__ import annotations

import functools
import logging
import os
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)

# VGG16 feature architecture (conv channel plan + pooling positions);
# LPIPS taps the activations after each relu block.
VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
LPIPS_TAPS = (1, 3, 6, 9, 12)  # conv indexes after which features are tapped
# ImageNet normalization used by LPIPS with normalize=True ([0,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def lpips_fn_or_none() -> Optional[Callable]:
    path = os.environ.get("EGS_TPU_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        logger.warning(
            "LPIPS weights unavailable (set EGS_TPU_LPIPS_WEIGHTS to a VGG16+"
            "linear-head .npz to enable); reporting lpips=0"
        )
        return None
    weights = dict(np.load(path))

    import jax
    import jax.numpy as jnp

    def conv(x, w, b):
        # x [1, C, H, W]; w torch OIHW
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + jnp.asarray(b)[None, :, None, None]

    def features(x):
        feats = []
        conv_i = 0
        for item in VGG16_PLAN:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID",
                )
            else:
                x = conv(x, weights[f"conv{conv_i}_w"], weights[f"conv{conv_i}_b"])
                x = jax.nn.relu(x)
                if conv_i in LPIPS_TAPS:
                    feats.append(x)
                conv_i += 1
        return feats

    @jax.jit
    def lpips(a, b):
        # a, b: [H, W, 3] in [0, 1]
        def prep(img):
            img = img * 2.0 - 1.0  # normalize=True maps [0,1] -> [-1,1]
            img = (img - _SHIFT) / _SCALE
            return jnp.moveaxis(img, -1, 0)[None]

        fa, fb = features(prep(a)), features(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=1, keepdims=True), 1e-10
            )
            nb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=1, keepdims=True), 1e-10
            )
            diff = (na - nb) ** 2
            w = jnp.asarray(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(diff * w, axis=1))
        return total

    def run(a: np.ndarray, b: np.ndarray) -> float:
        return float(lpips(a.astype(np.float32), b.astype(np.float32)))

    logger.info(f"LPIPS enabled with weights from {path}")
    return run
