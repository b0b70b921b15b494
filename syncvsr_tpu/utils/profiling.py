"""Profiling/observability (SURVEY.md §5: the reference has none; here:
jax.profiler trace hooks + per-step timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion and EMA."""

    def __init__(self, warmup: int = 2, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self.count = 0
        self.avg_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.count += 1
        if self.count > self.warmup:
            self.avg_ms = dt if self.avg_ms is None else (
                self.ema * self.avg_ms + (1 - self.ema) * dt)

    @property
    def steps_per_sec(self) -> float:
        return 1000.0 / self.avg_ms if self.avg_ms else 0.0


def annotate(name: str):
    """Named trace region for kernels/steps (shows up in xprof)."""
    return jax.profiler.TraceAnnotation(name)
