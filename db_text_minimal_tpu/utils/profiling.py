"""Profiling: jax.profiler traces + per-step timing.

The reference had only ad-hoc wall-clock prints (SURVEY.md §5: ``@timer`` at
``src/utils.py:51-60``, prints in ``src/test.py:57-60``). Here: a context
manager producing TensorBoard-loadable device traces, and a step timer that
reports images/sec (the BASELINE metric)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``with trace("logs/profile"):`` captures a jax.profiler trace viewable
    in TensorBoard / Perfetto; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter: ``tick(batch_size)`` per step, read
    ``images_per_sec``."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.steps = 0
        self.images = 0
        self.start = None

    def tick(self, batch_size: int) -> None:
        self.steps += 1
        if self.steps == self.warmup:
            self.start = time.perf_counter()
        elif self.steps > self.warmup:
            self.images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self.start is None or self.images == 0:
            return 0.0
        return self.images / (time.perf_counter() - self.start)
