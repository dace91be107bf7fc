"""Training: config system, jitted train step, and the training loop."""

from .config import Config, load_config
from .trainer import train

__all__ = ["Config", "load_config", "train"]
