"""Image quality metrics in JAX.

Behavioral spec (``/root/reference/eval.py:25-27,54-56``): PSNR and SSIM
with ``data_range=1.0`` (torchmetrics defaults), plus LPIPS (VGG,
normalize=True). SSIM is shared with the loss (``ops/ssim.py``). LPIPS
lives in ``lpips.py`` (pretrained weights via EGS_TPU_LPIPS_WEIGHTS, or a
deterministic seeded proxy otherwise).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import ssim  # re-exported for evaluator use

__all__ = ["psnr", "ssim"]


def psnr(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0
) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the whole image (all channels)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
