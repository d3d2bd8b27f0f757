"""Profiling utilities (the reference has none beyond wall-clock timing in
its MetricLogger, SURVEY.md §5; here: jax.profiler traces + a device-op
summary parser for quick hot-spot attribution)."""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_steps()``."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top_k: int = 15,
                    n_iters: int = 1) -> Dict[str, float]:
    """Aggregate device-op time by source line from the newest trace in
    ``log_dir``; returns {source_line: ms_per_iter}."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not device_pids:  # CPU-platform trace: one '/host:CPU' process
        device_pids = {p for p, n in pids.items() if "CPU" in n}
    agg: Dict[str, float] = collections.Counter()
    for e in tr["traceEvents"]:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or e["name"].startswith("jit_")):
            continue
        src = str((e.get("args") or {}).get("source", "?"))
        agg[src] += e.get("dur", 0) / 1e3 / n_iters
    return dict(sorted(agg.items(), key=lambda kv: -kv[1])[:top_k])


class StepTimer:
    """Wall-clock per-step timer with warmup skip (MetricLogger-compatible
    numbers for quick throughput reports)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._t: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
