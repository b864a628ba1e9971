"""Tracing / profiling utilities.

The reference has near-none (a stub layer profiler, yolo.py:164-167, and an
eval FPS print).  This framework makes observability first-class:

* ``StageTimer`` — per-stage wall-clock accounting for pipeline drivers.
* ``trace`` — context manager wrapping ``jax.profiler.TraceAnnotation`` so
  stages show up in TPU profiler timelines.
* ``device_trace`` — capture an XLA profile directory around a callable.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; thread-safe enough for the
    single-producer pipeline loops."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def report(self) -> str:
        lines = [f"{'stage':<28}{'count':>8}{'mean ms':>12}{'total s':>10}"]
        for k, s in self.summary().items():
            lines.append(f"{k:<28}{s['count']:>8}{s['mean_ms']:>12.2f}{s['total_s']:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profile (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
