"""Profiling / tracing utilities.

The reference hand-rolls `perf_counter` buckets named prepare / forward /
post_process / nms (reference: libs/worker_v2.py:799,979,1022,1091,1127) and
a per-iteration wall-clock meter. This module keeps those bucket names so
perf baselines line up, and adds TPU-native tracing:

  * ``PhaseTimer``  -- accumulating wall-clock buckets + summary string.
  * ``annotate``    -- jax.profiler.TraceAnnotation context (named regions
                       visible in a captured TPU trace).
  * ``trace``       -- capture a jax profiler trace (tensorboard format) for
                       a code block when a directory is configured.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; device-sync aware."""

    def __init__(self, sync=False):
        self.buckets = defaultdict(list)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.buckets[name].append(time.perf_counter() - start)

    def add(self, name, seconds):
        self.buckets[name].append(seconds)

    def summary(self):
        parts = []
        for name, vals in self.buckets.items():
            parts.append(f"{name}: total {sum(vals):.3f}s "
                         f"mean {sum(vals) / max(len(vals), 1) * 1e3:.1f}ms "
                         f"(n={len(vals)})")
        return " | ".join(parts)

    def reset(self):
        self.buckets = defaultdict(list)


def annotate(name):
    """Named region in the device trace (no-op overhead when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(trace_dir=None):
    """Capture a profiler trace into ``trace_dir`` if given, else no-op."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
