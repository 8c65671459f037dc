"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

Wraps jax.profiler: `trace(dir)` context for full device traces viewable in
TensorBoard/Perfetto, `annotate(name)` for stage ranges (preprocess / encode /
decode), and a lightweight `StepTimer` for host-side steps/sec accounting that
feeds the metrics tracker."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Device trace over the enclosed block.  No-op when log_dir is None (so
    callers can thread a --profile-dir flag unconditionally)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range that shows up in the device trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def save_device_memory_profile(path: str):
    jax.profiler.save_device_memory_profile(path)


class StepTimer:
    """Rolling steps/sec + stage breakdown (host wall clock)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._stage_acc: dict[str, float] = {}
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with annotate(name):
            yield
        self._stage_acc[name] = self._stage_acc.get(name, 0.0) + time.perf_counter() - t0

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    def stage_summary(self) -> dict[str, float]:
        out = dict(self._stage_acc)
        self._stage_acc = {}
        return out
