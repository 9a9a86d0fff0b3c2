"""Per-stage timing + counters — the observability layer.

Replaces the reference's `TicToc` chrono stopwatch (`include/tictoc.h`, used
by Scan Context) and the commented-out per-stage `std::chrono` timers in the
mapping handler (`mapOptmization.cpp:461-501`), plus the `rostopic hz`
health-check discipline (README.md:308-322) — as a first-class module:

- `StageTimer`: named stages, EMA + max + count, one-line report
- `RateMonitor`: per-topic rate estimation with expected-rate health flags
- `trace()`: context manager around jax profiler traces for kernel-level work
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@dataclass
class StageStats:
    count: int = 0
    total: float = 0.0
    max: float = 0.0
    ema: float = 0.0
    last_dt: float = 0.0

    def update(self, dt: float, alpha: float = 0.1):
        self.count += 1
        self.total += dt
        self.max = max(self.max, dt)
        self.ema = dt if self.count == 1 else (1 - alpha) * self.ema + alpha * dt
        self.last_dt = dt


class StageTimer:
    """Usage:
        with timer.stage("register"):
            out = jax.block_until_ready(step(...))
    """

    def __init__(self):
        self.stats: Dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stats[name].update(time.perf_counter() - t0)

    def record(self, name: str, dt: float):
        self.stats[name].update(dt)

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats.items()):
            mean = s.total / max(s.count, 1)
            lines.append(f"{name:>24s}: n={s.count:5d} mean={mean * 1e3:8.2f}ms "
                         f"ema={s.ema * 1e3:8.2f}ms max={s.max * 1e3:8.2f}ms")
        return "\n".join(lines)

    def last(self) -> dict:
        """Most recent duration per stage (seconds) — per-step logging."""
        return {k: v.last_dt for k, v in self.stats.items()}

    def as_dict(self) -> dict:
        return {k: {"count": v.count, "mean_ms": v.total / max(v.count, 1) * 1e3,
                    "max_ms": v.max * 1e3}
                for k, v in self.stats.items()}


@dataclass
class RateMonitor:
    """`rostopic hz` equivalent: track arrival rate of a stream and flag when
    it departs from the expected rate (README.md:308-322 records ~10 Hz on 7
    topics as the health check)."""

    expected_hz: float
    tolerance: float = 0.3        # fraction
    window: int = 50
    _stamps: list = field(default_factory=list)

    def tick(self, stamp: Optional[float] = None):
        self._stamps.append(time.time() if stamp is None else stamp)
        if len(self._stamps) > self.window:
            self._stamps.pop(0)

    @property
    def hz(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        span = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / span if span > 0 else 0.0

    @property
    def healthy(self) -> bool:
        if len(self._stamps) < max(3, self.window // 5):
            return True            # not enough data to judge
        return abs(self.hz - self.expected_hz) <= self.tolerance * self.expected_hz


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace around a region (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
