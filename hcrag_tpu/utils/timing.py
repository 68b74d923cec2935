"""Tracing / profiling subsystem.

The reference has only ad-hoc `time.time()` spans (SURVEY §5.1).  This module
provides the real instrumentation the TPU build needs:

  * `StageTimer` — named wall-clock spans with nesting, aggregation, and a
    report table; used by the engine/pipeline for per-stage latency.
  * `trace_to` — context manager around `jax.profiler` for device-level
    traces viewable in TensorBoard/XProf.
  * `device_time` — accurate device-step timing (blocks on results, excludes
    dispatch overhead on repeat runs).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class StageTimer:
    """Hierarchical named wall-clock spans."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack: List[str] = []

    @contextlib.contextmanager
    def span(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        start = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.totals[full] += time.perf_counter() - start
            self.counts[full] += 1

    def report(self) -> str:
        lines = ["stage                                    total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:40s} {t:8.3f} {c:7d} {1000 * t / c:9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]}
            for k in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


#: Process-wide default timer (opt-in use).
GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace_to(logdir: str, *, host_tracer_level: int = 2):
    """Capture a jax profiler trace (TensorBoard 'Profile' / XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call of a device function, post-warmup, fully
    synchronized."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - start) / iters
