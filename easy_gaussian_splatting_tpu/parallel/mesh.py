"""Device mesh construction."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None, axis: str = TILE_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices. The single axis shards
    image tile-rows (spatial parallelism: the 3DGS analog of sequence
    parallelism — see SURVEY.md §5.7)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices[:n_devices]), (axis,))
