"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference only logs per-iteration wall time via paired CUDA events
(`train.py:46-47,124,172`). TPU-native equivalents:

- `trace(logdir)` — context manager around `jax.profiler` capturing a
  Perfetto/TensorBoard trace of device execution;
- `StepTimer` — EMA wall-clock step timing + the BASELINE throughput
  counter rays/s/chip (H*W*batch / step time);
- `annotate` — TraceAnnotation wrapper so train phases show up in traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a device trace under `logdir` (no-op if logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA step timing + rays/s counter."""

    def __init__(self, pixels_per_step: int, ema: float = 0.9):
        self.pixels = pixels_per_step
        self.ema_alpha = ema
        self.ema_dt: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema_dt = dt if self.ema_dt is None else (
            self.ema_alpha * self.ema_dt + (1 - self.ema_alpha) * dt
        )
        return dt

    @property
    def rays_per_s(self) -> float:
        return self.pixels / self.ema_dt if self.ema_dt else 0.0

    @property
    def steps_per_s(self) -> float:
        return 1.0 / self.ema_dt if self.ema_dt else 0.0
