"""Profiling / tracing hooks (the reference has none; SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with device sync on read."""

    def __init__(self):
        self._t0 = None
        self.last_ms = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        self.last_ms = (time.perf_counter() - self._t0) * 1e3
        return self.last_ms
