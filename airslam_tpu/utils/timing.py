"""Timers and profiling.

Replaces the reference's gettimeofday macros (include/timer.h:16-25) and the
per-frame chrono prints (demo/visual_odometry.cpp:49-58), plus structured
device profiling via ``jax.profiler`` (absent in the reference)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class Timer:
    """Accumulating named section timer."""

    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        lines = []
        for name, vals in sorted(self.records.items()):
            n = len(vals)
            total = sum(vals)
            lines.append(
                f"{name:30s} n={n:5d} total={total:8.3f}s mean={total / n * 1e3:8.2f}ms"
            )
        return "\n".join(lines)

    def mean(self, name: str) -> float:
        vals = self.records.get(name, [])
        return sum(vals) / len(vals) if vals else 0.0


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context: inspect with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
