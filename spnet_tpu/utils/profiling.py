"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock FPS prints around
predict calls (`/root/reference/spnet/callbacks.py:137-141`,
`evaluate_spnet.py:64-68`; SURVEY.md §5).  Those counters exist here too
(train/loop.py), plus proper device profiling:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable XPlane trace of the jitted steps.
  * `Throughput` — rolling images/sec meter for the hot loop.
  * `annotate(name)` — named TraceAnnotation so train/eval phases are
    visible in the trace timeline.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "logs/profile"):
    """Capture a device trace for everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Rolling throughput meter: call update(n_items) per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def update(self, n_items: int) -> None:
        now = time.time()
        self._events.append((now, n_items))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rate(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        items = sum(n for _, n in self._events[1:])
        return items / dt if dt > 0 else 0.0
