"""SSIM in JAX (11x11 Gaussian window, sigma=1.5, valid padding).

Behavioral spec: the reference's loss and evaluator both use torchmetrics'
``StructuralSimilarityIndexMeasure(data_range=1.0)`` with default settings
(``/root/reference/model/gaussian.py:420,450-453``, ``/root/reference/
eval.py:25``): Gaussian kernel 11x11 with sigma 1.5, k1=0.01, k2=0.03,
no padding (mean over the valid map). Convolutions run on the TPU MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel2d(kernel_size: int, sigma: float) -> np.ndarray:
    ax = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    g = g / g.sum()
    k2d = np.outer(g, g)
    return k2d.astype(np.float32)


def _depthwise_valid_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x: [C, H, W]; kernel: [kh, kw]. Valid (no padding) depthwise conv."""
    c = x.shape[0]
    k = jnp.broadcast_to(kernel[None, None], (c, 1) + kernel.shape)
    return jax.lax.conv_general_dilated(
        x[None],  # [1, C, H, W]
        k,  # [C, 1, kh, kw]
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=c,
    )[0]


def ssim(
    img_a: jnp.ndarray,  # [H, W, C] in [0, data_range]
    img_b: jnp.ndarray,  # [H, W, C]
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM between two images. Differentiable."""
    kernel = jnp.asarray(_gaussian_kernel2d(kernel_size, sigma))
    a = jnp.moveaxis(img_a, -1, 0)  # [C, H, W]
    b = jnp.moveaxis(img_b, -1, 0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_a = _depthwise_valid_conv(a, kernel)
    mu_b = _depthwise_valid_conv(b, kernel)
    mu_aa = _depthwise_valid_conv(a * a, kernel)
    mu_bb = _depthwise_valid_conv(b * b, kernel)
    mu_ab = _depthwise_valid_conv(a * b, kernel)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
