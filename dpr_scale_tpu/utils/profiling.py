"""Profiling: jax.profiler traces + per-stage wall-clock accounting.

The reference has no tracing beyond ad-hoc latency dicts
(citadel_retrieval_task.py:45,111-113; SURVEY.md §5 calls for wiring
jax.profiler from the start). Usage:

    with trace_if("/tmp/trace"):             # no-op when dir is falsy
        run_training()

    timer = StageTimer()
    with timer.stage("encode"):
        ...
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str], host_tracer_level: int = 2):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)
    when ``trace_dir`` is set; otherwise a no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir, create_perfetto_link=False):
        yield


class StageTimer:
    """Accumulating wall-clock per named stage (device work must be
    block_until_ready'd by the caller for accurate numbers)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def __str__(self) -> str:
        return " ".join(
            f"{k}={v['total_s']:.2f}s/{v['count']}x" for k, v in self.summary().items()
        )
