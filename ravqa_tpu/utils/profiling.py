"""Profiling & observability (first-class, unlike the reference's
commented-out line_profiler hooks and disabled psutil dumps — SURVEY.md §5).

- trace(): context manager around jax.profiler.trace -> TensorBoard-viewable
  xplane dumps (the TPU replacement for nvprof/GPUtil).
- device_memory_stats(): per-device HBM usage (replaces cuda_stats.py).
- annotate(): jax.profiler.TraceAnnotation passthrough for host-side spans.
- StepTimer: throughput/latency accounting that forces a device fetch, since
  dispatch time lies (especially through remote-tunnel backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace: `with trace('/tmp/prof'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes). Empty entries if the backend
    doesn't expose them (CPU)."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            s = d.memory_stats() or {}
            stats = {k: int(v) for k, v in s.items()
                     if "bytes" in k or "size" in k}
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out


class StepTimer:
    """Wall-clock step timing that synchronizes via host fetch.

    usage:
        t = StepTimer()
        for batch in ...:
            out = step(batch)
            t.tick(out["loss"])   # fetches the scalar -> true sync point
        print(t.summary())
    """

    def __init__(self):
        self.times: list[float] = []
        self._last = time.perf_counter()

    def tick(self, sync_value=None) -> float:
        if sync_value is not None:
            np.asarray(sync_value)  # device -> host fetch forces completion
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        return dt

    def summary(self, skip_first: int = 1) -> dict:
        ts = self.times[skip_first:] or self.times
        if not ts:
            return {}
        return {"steps": len(ts),
                "mean_s": float(np.mean(ts)),
                "p50_s": float(np.percentile(ts, 50)),
                "p95_s": float(np.percentile(ts, 95)),
                "steps_per_s": float(1.0 / np.mean(ts))}
