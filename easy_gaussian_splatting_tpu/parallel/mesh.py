"""Device mesh construction (1-D and 2-D, single- and multi-host)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


TILE_AXIS = "tiles"
GAUSS_AXIS = "gauss"


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


def make_mesh2d(n_gauss: int, n_tiles: int) -> Mesh:
    """2-D ``(gauss, tiles)`` mesh over ``n_gauss * n_tiles`` devices.

    The ``gauss`` axis shards Gaussian storage (params + Adam moments +
    densify stats, ZeRO-style) and the ``gauss x tiles`` product shards
    image stripes — every device renders a distinct stripe, so compute
    scales with the full device count while memory scales with
    ``n_gauss``. On multi-host topologies ``jax.devices()`` orders local
    devices contiguously per process, so the MINOR (``tiles``) axis stays
    within a host whenever ``n_tiles`` divides the local device count —
    the bandwidth-hungry stripe all-gathers then ride ICI while only the
    (per-step-rare) gauss-axis param exchange crosses DCN."""
    devices = jax.devices()
    need = n_gauss * n_tiles
    if need > len(devices):
        raise ValueError(
            f"requested {n_gauss}x{n_tiles} devices, have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(n_gauss, n_tiles)
    return Mesh(grid, (GAUSS_AXIS, TILE_AXIS))
