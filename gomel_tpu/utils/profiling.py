"""Profiling helpers: jax.profiler traces + lightweight timers.

The reference has no tracing/profiling subsystem (SURVEY.md §5); this wraps
``jax.profiler`` so any pipeline call can be captured for TensorBoard/XProf
and adds a process-local hierarchical timer for host-side stages.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating host-side stage timer (single-writer; host code is
    single-threaded like the reference's)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 6), "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }
