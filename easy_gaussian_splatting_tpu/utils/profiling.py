"""Profiling / tracing utilities.

The reference has no tracing at all (SURVEY.md §5.1 — only wall-clock FPS
in the evaluator). TPU-native replacement: ``jax.profiler`` traces viewable
in TensorBoard / Perfetto, plus a lightweight step timer that reports
percentile step latencies.
"""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path
from typing import Dict, List

import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin /
    Perfetto). Wrap a handful of training steps, not the whole run."""
    import jax

    logdir = str(logdir)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {logdir}")


class StepTimer:
    """Collects per-step wall-clock latencies and reports percentiles."""

    def __init__(self) -> None:
        self._durations: List[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self._durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = np.asarray(self._durations) * 1e3
        return {
            "steps": float(len(d)),
            "mean_ms": float(d.mean()),
            "p50_ms": float(np.percentile(d, 50)),
            "p90_ms": float(np.percentile(d, 90)),
            "p99_ms": float(np.percentile(d, 99)),
            "it_per_s": float(1e3 / d.mean()),
        }

    def log_summary(self, prefix: str = "step timing") -> None:
        s = self.summary()
        if s:
            logger.info(
                f"{prefix}: mean={s['mean_ms']:.1f}ms "
                f"p50={s['p50_ms']:.1f}ms p90={s['p90_ms']:.1f}ms "
                f"({s['it_per_s']:.2f} it/s over {int(s['steps'])} steps)"
            )
