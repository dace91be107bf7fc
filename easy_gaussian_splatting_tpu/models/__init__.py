"""Model layer: Gaussian parameter pytrees, rendering, density control,
grouped Adam, and the training loss."""

from .gaussians import GaussianParams, GaussianModelState, init_gaussian_state
from .render import render, RenderOutput

__all__ = [
    "GaussianParams",
    "GaussianModelState",
    "init_gaussian_state",
    "render",
    "RenderOutput",
]
