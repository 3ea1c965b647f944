"""Profiling & observability.

The reference's three ad-hoc mechanisms (SURVEY §5) become:
  - Stopwatch (optics/Stopwatch.hpp)            → Stopwatch (perf_counter laps)
  - OpenCL event profiling (`Total time = ns`)  → stage_timer ctx + jax
    profiler trace spans (jax.profiler.TraceAnnotation)
  - per-slice events/s printf counters          → ThroughputMeter
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import jax


class Stopwatch:
    """restart/lap/elapsed in seconds (Stopwatch.hpp:13-60)."""

    def __init__(self):
        self.restart()

    def restart(self) -> None:
        self._start = time.perf_counter()
        self._laps: List[float] = []
        self._last = self._start

    def lap(self) -> float:
        now = time.perf_counter()
        d = now - self._last
        self._laps.append(d)
        self._last = now
        return d

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def elapsed_laps(self) -> List[float]:
        return list(self._laps)


@contextlib.contextmanager
def stage_timer(name: str, sink: Optional[Dict[str, float]] = None,
                sync: bool = False):
    """Wall-time a pipeline stage, visible in jax profiler traces too."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        if sync:
            pass  # caller must block_until_ready on its outputs for accuracy
        dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a full XLA profiler trace (open with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """events/s counter — the engine's first-class metric (SURVEY §5)."""

    def __init__(self):
        self.events = 0
        self.slices = 0
        self._sw = Stopwatch()

    def add_slice(self, n_events: int) -> None:
        self.events += int(n_events)
        self.slices += 1

    @property
    def events_per_s(self) -> float:
        dt = self._sw.elapsed()
        return self.events / dt if dt > 0 else 0.0

    def report(self) -> str:
        return json.dumps({
            "events": self.events, "slices": self.slices,
            "elapsed_s": round(self._sw.elapsed(), 4),
            "events_per_s": round(self.events_per_s, 1),
        })
