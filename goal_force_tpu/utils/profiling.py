"""Profiling/timing harness.

The reference has no profiling at all (SURVEY §5 — tqdm bars only). Here:
  - timeit(fn, *args): block_until_ready wall-clock timing with warmup
  - trace(path): jax.profiler trace context
  - top_ops(trace_dir): parse the chrome-trace events out of a profile and aggregate
    device-op durations — answers "where did the milliseconds go" without TensorBoard.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Callable, Dict, List, Tuple

import jax


def timeit(fn: Callable, *args, reps: int = 3, warmup: int = 1, **kwargs) -> float:
    """Median-free mean wall-clock seconds per call (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def top_ops(log_dir: str, k: int = 25) -> List[Tuple[str, float, int]]:
    """Aggregate (name, total_ms, count) from the newest trace.json.gz under log_dir."""
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True),
                   key=os.path.getmtime)
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep device lanes only (XLA ops); host python events have cat 'python'
        name = ev.get("name", "")
        totals[name] += ev["dur"] / 1000.0
        counts[name] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return [(name, ms, counts[name]) for name, ms in ranked]
