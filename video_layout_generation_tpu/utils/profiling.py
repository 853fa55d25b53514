"""Profiling / tracing subsystem.

The reference's only perf instrumentation was wall-clock load/comp splits
(src/trainer.py:174-177; kept in utils/meters.StepTimer). This adds the
TPU-native tooling on top (SURVEY.md §5 'Tracing'):

- ``trace(logdir)``: context manager capturing a jax.profiler trace
  (viewable in TensorBoard's profile plugin / xprof).
- ``annotate(name)``: TraceAnnotation for host-side phases.
- ``Throughput``: frames/sec (or samples/sec) counter with EMA smoothing.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """EMA items/sec counter; call update(n_items) per step."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate = 0.0
        self._last = None

    def update(self, n_items: int) -> float:
        now = time.time()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = n_items / dt
            self.rate = (inst if self.rate == 0.0
                         else self.alpha * inst
                         + (1 - self.alpha) * self.rate)
        self._last = now
        return self.rate
