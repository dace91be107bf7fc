"""Training loss: (1-l)*L1 + l*(1-SSIM) with mask compositing, plus the
optional scale-anisotropy regularizer.

Behavioral spec (``/root/reference/model/gaussian.py:415-453,376-386``):
- mask compositing ``render = mask*gt + (1-mask)*render`` so masked pixels
  contribute zero gradient (object-removal training);
- ``total = (1-lambda_ssim)*L1 + lambda_ssim*(1-SSIM)``;
- optional ``scale_reg = mean(max(max_scale/min_scale, R) - R)`` added with
  weight ``lambda_scale`` (over alive Gaussians).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.ssim import ssim


def composite_mask(
    render_img: jnp.ndarray,  # [H, W, 3]
    gt_img: jnp.ndarray,  # [H, W, 3]
    mask: jnp.ndarray,  # [H, W]; 1 = masked-out object
) -> jnp.ndarray:
    m = mask[..., None]
    return m * gt_img + (1.0 - m) * render_img


def scale_regularization(
    log_scales: jnp.ndarray,  # [C, 3]
    alive: jnp.ndarray,  # [C] bool
    max_scale_ratio: float,
) -> jnp.ndarray:
    scales = jnp.exp(log_scales)
    ratio = jnp.max(scales, axis=-1) / jnp.min(scales, axis=-1)
    excess = jnp.maximum(ratio, max_scale_ratio) - max_scale_ratio
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(alive, excess, 0.0)) / n_alive


def loss_dict(
    render_img: jnp.ndarray,
    gt_img: jnp.ndarray,
    mask: jnp.ndarray,
    lambda_ssim: float,
    log_scales: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    use_scale_regularization: bool = False,
    max_scale_ratio: float = 10.0,
    lambda_scale: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    render_img = composite_mask(render_img, gt_img, mask)
    l1 = jnp.mean(jnp.abs(render_img - gt_img))
    ssim_loss = 1.0 - ssim(gt_img, render_img)
    out = {"l1": l1, "ssim": ssim_loss}
    total = (1.0 - lambda_ssim) * l1 + lambda_ssim * ssim_loss
    if use_scale_regularization:
        reg = scale_regularization(log_scales, alive, max_scale_ratio)
        out["scale_reg"] = reg
        total = total + lambda_scale * reg
    out["total"] = total
    return out
