"""Tracing / profiling helpers (aux subsystem, SURVEY.md §5).

The reference instruments with ad-hoc wall-clock decorators
(src/pose_estimation.py:9-17) and a dormant enable_timer flag (Utils.py:58).
TPU-native equivalents: jax.profiler traces viewable in TensorBoard /
Perfetto, plus a per-stage wall-clock aggregator for the frame loop.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall-clock stats for the frame loop."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        return {
            k: {"total_s": round(v, 4), "n": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 2)}
            for k, v in sorted(self.totals.items())
        }

    def log(self):
        for k, v in self.summary().items():
            logging.info(f"[stage] {k}: {v['mean_ms']}ms x{v['n']}")


@contextlib.contextmanager
def device_trace(log_dir="/tmp/sixdof_trace"):
    """jax.profiler trace context: `with device_trace(): step()` then open the
    dump in TensorBoard's profile plugin or Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logging.info(f"device trace written to {log_dir}")


@contextlib.contextmanager
def annotate(name):
    """Named region visible in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
