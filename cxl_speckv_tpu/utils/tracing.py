"""Tracing / profiling.

The reference has no tracer — only `std::chrono` wall-clock sampling folded
into running averages (`speculative_prefetcher.cpp:30,69-79`,
`cache_engine.cpp:65-79`, SURVEY.md section 5). This module upgrades that:

- `PhaseTimer`: the same running-average latency surface, per named phase,
  with p50/p95 percentiles over a bounded window.
- `trace_context`: real device-level tracing via `jax.profiler.trace` (view
  with TensorBoard / xprof), plus `annotate` for named trace spans.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class _Phase:
    count: int = 0
    total_s: float = 0.0
    window: deque = field(default_factory=lambda: deque(maxlen=512))

    def record(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.window.append(dt)

    def summary(self) -> dict:
        w = sorted(self.window)
        n = len(w)
        return {
            "count": self.count,
            "total_s": self.total_s,
            "avg_ms": (self.total_s / self.count * 1e3) if self.count else 0.0,
            "p50_ms": w[n // 2] * 1e3 if n else 0.0,
            "p95_ms": w[min(n - 1, int(n * 0.95))] * 1e3 if n else 0.0,
        }


class PhaseTimer:
    """Named-phase wall-clock accounting with percentile summaries."""

    def __init__(self):
        self._phases: dict[str, _Phase] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self._phases.setdefault(name, _Phase()).record(time.monotonic() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._phases.setdefault(name, _Phase()).record(seconds)

    def summary(self) -> dict[str, dict]:
        return {name: p.summary() for name, p in self._phases.items()}

    def reset(self) -> None:
        self._phases.clear()


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Device-level profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named span visible in the device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
