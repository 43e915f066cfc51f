"""Profiling/observability helpers.

The reference has no first-party profiler (SURVEY.md §5.1: Lightning's
profiler is commented out; eval_fps.py is the de-facto tool). Here:
  * ``trace``: context manager around jax.profiler for TensorBoard-viewable
    XLA traces,
  * ``StepTimer``: lightweight wall-clock step statistics with percentile
    summaries (the replacement for Lightning's simple profiler),
  * ``log_compile_stats``: inspect a lowered/compiled function's cost
    analysis (FLOPs / bytes accessed) straight from XLA.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-phase wall times; summary() gives mean/p50/p99."""

    def __init__(self) -> None:
        self._times: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, ts in self._times.items():
            arr = np.asarray(ts)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p99_ms": float(np.percentile(arr, 99) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def reset(self) -> None:
        self._times.clear()


def log_compile_stats(compiled) -> dict:
    """FLOP/memory cost analysis of a jax compiled function."""
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {
            "flops": analysis.get("flops"),
            "bytes_accessed": analysis.get("bytes accessed"),
        }
    except Exception:
        return {}
