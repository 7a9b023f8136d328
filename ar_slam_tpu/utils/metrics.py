"""Observability: stage timers, metrics collection, profiler hooks.

The reference's only observability is stdout progress prints
(minimizer_progress_to_stdout, ar_slam_util.cpp:1012) and RCLCPP log
streams.  Here: structured per-stage wall timings, engine metrics counters,
and ``jax.profiler`` trace capture around device work (xprof-compatible,
SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger(__name__)


class Metrics:
    """Accumulating counters + stage timings."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.timings: dict[str, list[float]] = defaultdict(list)

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = dict(self.counters)
        for name, vals in self.timings.items():
            out[f"{name}_s"] = round(sum(vals), 4)
            out[f"{name}_calls"] = len(vals)
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax profiler trace (viewable in xprof/tensorboard) around
    the enclosed device work; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", log_dir)
