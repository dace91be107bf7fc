"""Global state and logging.

Behavioral spec (``/root/reference/utils.py:12-25``): seed python/numpy RNGs
and configure a timestamped console logger (the reference uses loguru +
torch seeding/cuda device selection; here: stdlib logging, and device
selection is jax-managed).
"""

from __future__ import annotations

import logging
import random
import sys

import numpy as np

_FORMAT = "%(asctime)s | %(levelname)-5s | %(message)s"
_DATEFMT = "%m%d-%H:%M:%S"
_configured = False


def configure_logging(level: int = logging.DEBUG) -> None:
    global _configured
    root = logging.getLogger()
    if _configured:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root.addHandler(handler)
    root.setLevel(level)
    # keep noisy third-party loggers at INFO
    logging.getLogger("jax").setLevel(logging.INFO)
    logging.getLogger("PIL").setLevel(logging.INFO)
    logging.getLogger("matplotlib").setLevel(logging.WARNING)
    _configured = True


def set_global_state(seed: int, device: str | None = None) -> None:
    """Seed host RNGs and configure logging. ``device`` is accepted for
    config compatibility; jax manages devices itself."""
    random.seed(seed)
    np.random.seed(seed)
    configure_logging()


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
