"""Checkpoint IO: array-based checkpoints with metadata.

Behavioral spec (``/root/reference/utils.py:48-87``, ``train.py:112-117``):
checkpoints live at ``<output>/checkpoints/iterations_<N>.*``; load picks
the max-iteration file unless one is named; optimizer state is stripped by
default.

TPU redesign (and a fix of the reference's no-resume gap, SURVEY.md §5.4):
instead of pickling a live module we store plain arrays + a JSON header in
an ``.npz`` — portable, safe to load, and optionally including the Adam
moments and step counters so training can actually resume.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import (
    GaussianModelState,
    GaussianParams,
    PARAM_NAMES,
    zero_stats,
)
from ..models.optimizer import AdamState

logger = logging.getLogger(__name__)


def save_checkpoint(
    path: Path,
    state: GaussianModelState,
    active_sh_degree: int,
    step: int,
    adam: Optional[AdamState] = None,
) -> None:
    """Save model arrays (+ optionally optimizer state) to ``path``."""
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for name in PARAM_NAMES:
        arrays[f"params/{name}"] = np.asarray(getattr(state.params, name))
    arrays["alive"] = np.asarray(state.alive)
    meta: Dict[str, Any] = {
        "format": "easy_gaussian_splatting_tpu/v1",
        "active_sh_degree": int(active_sh_degree),
        "step": int(step),
        "has_optimizer": adam is not None,
    }
    if adam is not None:
        for name in PARAM_NAMES:
            arrays[f"adam/mu/{name}"] = np.asarray(getattr(adam.mu, name))
            arrays[f"adam/nu/{name}"] = np.asarray(getattr(adam.nu, name))
        meta["adam_steps"] = {k: int(v) for k, v in adam.steps.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    logger.info(f"saved checkpoint to {path}")


def load_checkpoint(
    path: Path,
) -> Tuple[GaussianModelState, int, int, Optional[AdamState]]:
    """Load a checkpoint. Returns (state, active_sh_degree, step, adam)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
        params = GaussianParams(
            **{name: jnp.asarray(z[f"params/{name}"]) for name in PARAM_NAMES}
        )
        alive = jnp.asarray(z["alive"])
        state = GaussianModelState(
            params=params, alive=alive, stats=zero_stats(alive.shape[0])
        )
        adam = None
        if meta.get("has_optimizer"):
            mu = GaussianParams(
                **{n: jnp.asarray(z[f"adam/mu/{n}"]) for n in PARAM_NAMES}
            )
            nu = GaussianParams(
                **{n: jnp.asarray(z[f"adam/nu/{n}"]) for n in PARAM_NAMES}
            )
            steps = {
                k: jnp.asarray(v, jnp.int32)
                for k, v in meta["adam_steps"].items()
            }
            adam = AdamState(mu=mu, nu=nu, steps=steps)
    return state, meta["active_sh_degree"], meta["step"], adam


def find_checkpoint(run_dir: Path, iterations: Optional[int] = None) -> Path:
    """Pick ``iterations_<N>.npz`` under ``<run_dir>/checkpoints``: the named
    iteration if given, else the max."""
    cpt_dir = run_dir / "checkpoints"
    candidates = sorted(cpt_dir.glob("iterations_*.npz"))
    if iterations is not None:
        target = cpt_dir / f"iterations_{iterations}.npz"
        if not target.exists():
            raise ValueError(
                f"cannot find checkpoint for iteration {iterations}"
            )
        return target
    if not candidates:
        raise ValueError(f"no checkpoint found under {cpt_dir}")
    return max(candidates, key=lambda p: int(p.stem.split("_")[1]))
