"""Tracing and per-phase timing.

The reference's only instrumentation is a wall-clock line in time.csv
(localhap.cpp:383-388). Here: named phase timers with a
candidates-scored counter (the BASELINE metric), plus an optional
jax.profiler trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Iterator, Optional


@dataclass
class PhaseStats:
    seconds: float = 0.0
    calls: int = 0


class Profiler:
    """Accumulating named phase timers + counters."""

    def __init__(self) -> None:
        self.phases: Dict[str, PhaseStats] = {}
        self.counters: Dict[str, float] = {}

    def reset(self) -> None:
        self.phases.clear()
        self.counters.clear()

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            stats = self.phases.setdefault(name, PhaseStats())
            stats.seconds += time.perf_counter() - t0
            stats.calls += 1

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def candidates_per_second(self) -> Optional[float]:
        scored = self.counters.get("candidates_scored", 0.0)
        secs = self.phases.get("score", PhaseStats()).seconds
        if scored and secs:
            return scored / secs
        return None

    def report(self) -> str:
        lines = []
        for name in sorted(self.phases):
            s = self.phases[name]
            lines.append("%-20s %8.3fs  x%d" % (name, s.seconds, s.calls))
        for name in sorted(self.counters):
            lines.append("%-20s %g" % (name, self.counters[name]))
        cps = self.candidates_per_second()
        if cps:
            lines.append("%-20s %.1f/s" % ("candidates_scored", cps))
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace capture when log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL = Profiler()
