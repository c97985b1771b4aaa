"""Structured run logging and profiling hooks.

The reference emits three bare INFO lines (src/PanDepth.cpp:3454,
:4879); production deployments need more (SURVEY.md §5): per-phase
wall clock, reads in/filtered, events, and throughput, plus an optional
``jax.profiler`` trace for device-side analysis
(``PANDEPTH_PROFILE=<dir>``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import sys
import time
from typing import Dict, Optional

_VERBOSE = os.environ.get("PANDEPTH_VERBOSE", "") not in ("", "0")


def set_verbose(v: bool) -> None:
    global _VERBOSE
    _VERBOSE = v


def verbose() -> bool:
    return _VERBOSE


@dataclasses.dataclass
class RunStats:
    reads_seen: int = 0
    events: int = 0
    phases: Dict[str, float] = dataclasses.field(default_factory=dict)
    t0: float = dataclasses.field(default_factory=time.perf_counter)

    def note_phase(self, name: str, seconds: float) -> None:
        self.phases[name] = self.phases.get(name, 0.0) + seconds

    def summary(self) -> str:
        wall = time.perf_counter() - self.t0
        parts = [f"wall={wall:.2f}s"]
        if self.reads_seen:
            parts.append(f"reads={self.reads_seen}")
            parts.append(f"reads/s={self.reads_seen / wall:.0f}")
        if self.events:
            parts.append(f"events={self.events}")
        for k, v in sorted(self.phases.items()):
            parts.append(f"{k}={v:.2f}s")
        return " ".join(parts)

    def emit(self) -> None:
        if _VERBOSE:
            print(f"INFO: {self.summary()}", file=sys.stderr)


@contextlib.contextmanager
def phase(stats: Optional[RunStats], name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if stats is not None:
            stats.note_phase(name, dt)
        if _VERBOSE:
            print(f"INFO: phase {name}: {dt:.3f}s", file=sys.stderr)


@contextlib.contextmanager
def maybe_profile():
    """jax.profiler trace when PANDEPTH_PROFILE=<dir> is set."""
    out = os.environ.get("PANDEPTH_PROFILE")
    if not out:
        yield
        return
    import jax

    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
