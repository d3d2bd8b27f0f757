"""Unit tests for the trace summarizer (utils/profiling.py).

The reference has no profiling subsystem (SURVEY.md §5 — wall-clock only);
these pin OUR parser's two non-obvious behaviors against a hand-built
trace: (1) nested device events are attributed by SELF time (a fusion's
children subtract from it — raw sums double-count ~1.8x on real TPU
traces), and (2) only the 'XLA Ops' thread lane is read ('Steps' /
'XLA Modules' lanes duplicate whole steps and would triple-count).
"""

import gzip
import json
import os

from snipper_tpu.utils.profiling import summarize_trace


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, name, tid=None, tname=None):
    if tid is None:
        return {"ph": "M", "pid": pid, "name": "process_name",
                "args": {"name": name}}
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": tname}}


def test_self_time_subtracts_direct_children(tmp_path):
    evs = [
        _meta(3, "/device:TPU:0"),
        _meta(3, None, tid=3, tname="XLA Ops"),
        # parent fusion 10 ms with one nested child of 4 ms -> self 6 ms
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 10_000,
         "name": "fusion.1", "args": {"source": "a.py:1"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 2_000, "dur": 4_000,
         "name": "dot.2", "args": {"source": "b.py:2"}},
        # disjoint sibling 3 ms
        {"ph": "X", "pid": 3, "tid": 3, "ts": 20_000, "dur": 3_000,
         "name": "add.3", "args": {"source": "a.py:1"}},
    ]
    top = summarize_trace(_write_trace(tmp_path, evs))
    assert abs(top["a.py:1"] - 9.0) < 1e-9   # 6 self + 3 sibling
    assert abs(top["b.py:2"] - 4.0) < 1e-9
    # self times sum exactly to device busy time (no double counting)
    assert abs(sum(top.values()) - 13.0) < 1e-9


def test_non_op_lanes_and_other_processes_are_ignored(tmp_path):
    evs = [
        _meta(3, "/device:TPU:0"),
        _meta(701, "/host:CPU"),
        _meta(3, None, tid=1, tname="Steps"),
        _meta(3, None, tid=3, tname="XLA Ops"),
        # Steps-lane event named by step number (the "0".."5" artifact)
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 50_000, "name": "0"},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 5_000,
         "name": "conv.1", "args": {"source": "c.py:3"}},
        # host-process event must not appear either
        {"ph": "X", "pid": 701, "tid": 9, "ts": 0, "dur": 7_000,
         "name": "python", "args": {}},
    ]
    top = summarize_trace(_write_trace(tmp_path, evs))
    assert top == {"c.py:3": 5.0}


def test_concurrent_lanes_do_not_nest_across_lanes(tmp_path):
    # Two 'XLA Ops' lanes (multi-core/multi-device): a 10 ms op on lane A
    # overlapping a 6 ms op on lane B are CONCURRENT, not parent/child —
    # total must be 16 ms, not 10-6=4 ms (ADVICE r4 medium).
    evs = [
        _meta(3, "/device:TPU:0"),
        _meta(3, None, tid=3, tname="XLA Ops"),
        _meta(3, None, tid=4, tname="XLA Ops"),
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 10_000,
         "name": "fusion.1", "args": {"source": "a.py:1"}},
        {"ph": "X", "pid": 3, "tid": 4, "ts": 1_000, "dur": 6_000,
         "name": "dot.2", "args": {"source": "b.py:2"}},
    ]
    top = summarize_trace(_write_trace(tmp_path, evs))
    assert abs(top["a.py:1"] - 10.0) < 1e-9
    assert abs(top["b.py:2"] - 6.0) < 1e-9


def test_thread_meta_without_args_does_not_crash(tmp_path):
    # A thread_name metadata event missing 'args' must be skipped, not
    # raise KeyError and kill the summary (ADVICE r4 low).
    evs = [
        _meta(3, "/device:TPU:0"),
        {"ph": "M", "pid": 3, "tid": 9, "name": "thread_name"},
        _meta(3, None, tid=3, tname="XLA Ops"),
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 2_000,
         "name": "conv.1", "args": {"source": "c.py:3"}},
    ]
    assert summarize_trace(_write_trace(tmp_path, evs)) == {"c.py:3": 2.0}


def test_cpu_trace_falls_back_to_hlo_op_names(tmp_path):
    # CPU-platform traces: one '/host:CPU' process, no thread_name metadata
    # for an 'XLA Ops' lane, no 'source' arg -> fall back to hlo_op
    evs = [
        _meta(701, "/host:CPU"),
        {"ph": "X", "pid": 701, "tid": 1, "ts": 0, "dur": 2_000,
         "name": "f.1", "args": {"hlo_op": "slice_reduce_fusion"}},
    ]
    top = summarize_trace(_write_trace(tmp_path, evs))
    assert top == {"slice_reduce_fusion": 2.0}


def test_n_iters_divides_and_top_k_truncates(tmp_path):
    evs = [_meta(3, "/device:TPU:0"), _meta(3, None, tid=3, tname="XLA Ops")]
    for i in range(5):
        evs.append({"ph": "X", "pid": 3, "tid": 3, "ts": i * 10_000,
                    "dur": (i + 1) * 1_000, "name": f"op.{i}",
                    "args": {"source": f"s{i}.py:1"}})
    top = summarize_trace(_write_trace(tmp_path, evs), top_k=2, n_iters=2)
    assert list(top) == ["s4.py:1", "s3.py:1"]
    assert abs(top["s4.py:1"] - 2.5) < 1e-9


def test_empty_dir_returns_empty(tmp_path):
    assert summarize_trace(str(tmp_path)) == {}
