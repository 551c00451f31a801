"""Profiling hooks (greenfield vs the reference, which has none —
SURVEY.md §5): jax.profiler traces plus simple per-step wall timing."""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step timing with compile-step exclusion."""

    def __init__(self, skip_first=1):
        self.skip_first = skip_first
        self.times = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip_first:
            self.times.append(dt)

    @property
    def mean(self):
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def summary(self):
        if not self.times:
            return "no steps timed"
        return (f"steps={len(self.times)} mean={self.mean*1e3:.2f}ms "
                f"min={min(self.times)*1e3:.2f}ms max={max(self.times)*1e3:.2f}ms")
