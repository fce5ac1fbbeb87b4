"""Phase timers + profiler hooks.

The reference has no tracing at all (SURVEY.md §5.1: commented-out couts and
an unused CppAD speed harness). Here: lightweight wall-clock phase timers
for the host-side control path and a thin wrapper over `jax.profiler` for
device traces of the batched solve.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    """Accumulating named wall-clock timers (host side, control-rate code)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": self.totals[name] / max(self.counts[name], 1) * 1e3,
            }
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block (view in
    TensorBoard / xprof). Usage:

        with device_trace("/tmp/trace"):
            batch_solve(...)  # traced on-device
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
