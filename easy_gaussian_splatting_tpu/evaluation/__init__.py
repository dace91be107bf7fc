"""Evaluation: PSNR/SSIM/LPIPS metrics and the evaluator loop."""

from .metrics import psnr
from .evaluator import Evaluator

__all__ = ["psnr", "Evaluator"]
