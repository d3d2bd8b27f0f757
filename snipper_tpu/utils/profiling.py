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
    """Aggregate device-op SELF time by source line from the newest trace
    in ``log_dir``; returns {source_line: ms_per_iter}.

    TPU traces nest heavily on the 'XLA Ops' lane (fusions contain their
    constituent ops, ~90% of events overlap a parent), so raw duration
    sums double-count ~1.8x; self time (duration minus direct children)
    sums exactly to device busy time. Only the 'XLA Ops' thread lane is
    read — 'Steps'/'XLA Modules' lanes duplicate whole steps/modules."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    pids = {e["pid"]: (e.get("args") or {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not device_pids:  # CPU-platform trace: one '/host:CPU' process
        device_pids = {p for p, n in pids.items() if "CPU" in n}
    op_lanes = {(e["pid"], e["tid"]) for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and (e.get("args") or {}).get("name") == "XLA Ops"
                and e["pid"] in device_pids}
    # Nesting only holds WITHIN one (pid, tid) lane: events on different
    # lanes run concurrently (multi-core/multi-device) and must not be
    # treated as parent/child — bucket per lane, then aggregate.
    lanes: Dict[tuple, list] = collections.defaultdict(list)
    for e in tr["traceEvents"]:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or e["name"].startswith("jit_")):
            continue
        if op_lanes and (e["pid"], e["tid"]) not in op_lanes:
            continue
        a = e.get("args") or {}
        # TPU traces carry op-metadata "source" (file:line); CPU traces
        # only the HLO op name — fall back so the summary is never all-"?".
        src = str(a.get("source") or a.get("hlo_op") or e["name"])
        lanes[(e["pid"], e["tid"])].append((e["ts"], -e.get("dur", 0), src))
    agg: Dict[str, float] = collections.Counter()
    for evs in lanes.values():
        evs.sort()
        stack = []  # (end_ts, src) of currently-open enclosing events
        for ts, neg_dur, src in evs:
            dur = -neg_dur
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:  # direct child: subtract from the parent's self time
                agg[stack[-1][1]] -= dur / 1e3 / n_iters
            agg[src] += dur / 1e3 / n_iters
            stack.append((ts + dur, src))
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
