"""Profiling: jax.profiler traces + step timers.

TPU-native replacement for nerfstudio's @profiler.time_function layer
(reference NeRAF_pipeline.py:166,231,261,291): a context manager that writes
an xplane trace viewable in TensorBoard, and a lightweight section timer
whose aggregates land in the metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace around a block (TensorBoard xplane)."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer: timer.section('name') contexts."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {f"{k}_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}
