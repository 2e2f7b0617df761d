"""Profiling / tracing hooks.

The reference's only observability is wall-clock accounting
(T_sample/T_update, smpl_sim/agents/agent_humanoid.py:196-225; perf_counter
loops in examples/benchmark.py:87-94). The TPU build adds first-class
profiler integration on top of the same wall-clock metrics:

  * `trace(logdir)`       — context manager around jax.profiler.trace
                            (XPlane/perfetto traces viewable in XProf/
                            TensorBoard), annotating the enclosed steps.
  * `annotate(name)`      — TraceAnnotation for narrow regions.
  * `Timer`               — T_sample/T_update-style accumulator with
                            blocking-aware stop (block_until_ready).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the host timeline)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer; `stop(x)` blocks on x first so device
    work is charged to the right bucket (the reference's T_sample/T_update)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0: float | None = None

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, block_on: Any = None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        self._t0 = None
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False
