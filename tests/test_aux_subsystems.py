"""Tests for auxiliary subsystems: preemption guard, multi-host gather
(single-process, faked-peer, and real two-process), and aux-loss
weighting."""

import os
import signal

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.losses.criterion import SetCriterion, loss_weight_dict
from snipper_tpu.parallel.multihost import all_gather_objects, merge_eval_results
from snipper_tpu.train.preemption import PreemptionGuard


def test_preemption_guard_catches_sigterm():
    guard = PreemptionGuard()
    try:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.should_stop
    finally:
        guard.restore()


def test_all_gather_single_process():
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    assert merge_eval_results([{"x": 1}, {"x": 2}]) == [{"x": 1}, {"x": 2}]


def test_all_gather_two_process_padding(monkeypatch):
    """The multi-process leg (length exchange, pad-to-max, per-row slice)
    with a faked peer: payloads of UNEQUAL pickle length in both orders,
    so the pad/truncate logic is exercised from each side."""
    import pickle

    from jax.experimental import multihost_utils

    def run_as_process0(obj0, obj1):
        p1 = pickle.dumps(obj1)

        def fake_allgather(x):
            x = np.asarray(x)
            if x.dtype == np.int64:          # the length exchange
                return np.stack([x, np.array([len(p1)], np.int64)])
            row1 = np.zeros_like(x)          # the padded byte gather
            row1[: len(p1)] = np.frombuffer(p1, np.uint8)
            return np.stack([x, row1])

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            fake_allgather)
        try:
            return all_gather_objects(obj0)
        finally:
            monkeypatch.undo()

    small = {"rank": "small"}
    big = {"rank": "big", "payload": list(range(500))}
    assert run_as_process0(small, big) == [small, big]   # peer longer
    assert run_as_process0(big, small) == [big, small]   # peer shorter


@pytest.mark.slow
def test_all_gather_objects_two_real_processes():
    """The same gather over a REAL two-process group: each subprocess gets
    one CPU device and a gloo coordination service (the TPU-native analog
    of the reference's NCCL ``init_process_group``, util/misc.py:400-439),
    so ``jax.process_count() == 2`` with no monkeypatching — the length
    exchange, padding, and rank ordering run over actual collectives."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"

    worker = os.path.join(os.path.dirname(__file__), "_mp_gather_worker.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    procs = [subprocess.Popen([sys.executable, worker, addr, str(i), "2"],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    for i, out in enumerate(outs):
        assert f"worker {i} OK" in out, out


def test_aux_losses_present_and_weighted():
    """Each aux decoder layer re-runs matching + all losses except heatmap
    (reference models/model.py:535-544) and shares base coefficients."""
    cfg = Config(num_queries=6, num_kpts=5, max_persons=3, num_frames=2,
                 num_future_frames=0, dec_layers=3)
    crit = SetCriterion(cfg)
    rng = np.random.default_rng(0)
    B, n, T, K, M = 2, 6, 2, 5, 3
    out = {
        "pred_logits": jnp.asarray(rng.standard_normal((B, n, T, 2)), jnp.float32),
        "pred_kpts2d": jnp.asarray(rng.uniform(0, 1, (B, n, T, K, 3)), jnp.float32),
        "pred_depth": jnp.asarray(rng.uniform(0, 1, (B, n, T, K, 1)), jnp.float32),
        "aux_logits": jnp.asarray(rng.standard_normal((2, B, n, T, 2)), jnp.float32),
        "aux_kpts2d": jnp.asarray(rng.uniform(0, 1, (2, B, n, T, K, 3)), jnp.float32),
        "aux_depth": jnp.asarray(rng.uniform(0, 1, (2, B, n, T, K, 1)), jnp.float32),
    }
    kpts = np.zeros((B, M, T, K, 3), np.float32)
    kpts[:, 0] = rng.uniform(0.2, 0.8, (B, T, K, 3))
    kpts[:, 0, ..., 2] = 1.0
    tgt = {"kpts2d": jnp.asarray(kpts),
           "depth": jnp.asarray(np.zeros((B, M, T, K, 2), np.float32)),
           "valid": jnp.asarray(np.array([[True, False, False]] * B))}
    total, losses, _ = crit(out, tgt)
    # aux keys exist for each of the 2 aux layers, heatmap excluded
    assert "loss_root_0" in losses and "loss_root_1" in losses
    assert "loss_heatmap_0" not in losses
    assert "loss_heatmap" not in losses  # no heatmaps passed
    # total equals the manual weighted sum
    w = loss_weight_dict(cfg)
    manual = 0.0
    for k, v in losses.items():
        base = k.rsplit("_", 1)
        coef = w.get(k, w.get(base[0]) if base[-1].isdigit() else None)
        manual += (coef or 0.0) * float(v)
    np.testing.assert_allclose(float(total), manual, rtol=1e-5)


def test_presets_cover_reference_checkpoint_matrix():
    """One preset per shipped reference checkpoint: {T=1, T=4, T=4+2} x
    {enc6/dec6, enc2/dec4} (reference README.md:30-37), plus recipes."""
    got = set()
    for name in ("canonical_t1", "canonical_t4", "canonical_t4_f2",
                 "light_t1", "light_t4", "light_t4_f2"):
        c = getattr(Config, name)()
        got.add((c.num_frames, c.num_future_frames,
                 c.enc_layers, c.dec_layers))
        assert c.hidden_dim == 384 and c.num_queries == 60
    assert got == {(1, 0, 6, 6), (4, 0, 6, 6), (4, 2, 6, 6),
                   (1, 0, 2, 4), (4, 0, 2, 4), (4, 2, 2, 4)}
    # recipe presets keep the reference geometry
    assert Config.jta_forecast().max_depth == 60.0
    assert Config.panoptic().num_queries == 20


def test_preset_registry_derivation():
    """PRESETS is derived from Config's staticmethods: exactly the nine
    presets, every entry buildable + valid (a stray helper staticmethod on
    Config would leak into the CLI registry — this pins the set)."""
    from snipper_tpu.config import PRESETS

    assert set(PRESETS) == {
        "canonical_t4", "canonical_t4_f2", "canonical_t1",
        "light_t4_f2", "light_t4", "light_t1",
        "jta_forecast", "panoptic", "tiny"}
    for name in PRESETS:
        assert isinstance(getattr(Config, name)(), Config)


def test_config_validate():
    """validate(): presets all pass; bad combinations produce readable
    errors naming the offending field (no mid-trace shape errors)."""
    import pytest

    for name in ("canonical_t4", "canonical_t4_f2", "canonical_t1",
                 "light_t1", "light_t4", "light_t4_f2", "jta_forecast",
                 "panoptic", "tiny"):
        getattr(Config, name)().validate()

    for bad, match in (
            (dict(hidden_dim=100, nheads=8), "divisible by nheads"),
            (dict(hidden_dim=96, nheads=8, num_kpts=15), "heatmap taps"),
            (dict(num_frames=0), "num_frames"),
            (dict(deform_impl="cuda"), "deform_impl"),
            (dict(seq_min_gap=5, seq_max_gap=2), "seq_min_gap"),
            (dict(nheads=8, tp_size=3), "tp_size"),
            (dict(nheads=0), "nheads"),
            (dict(tp_size=0), "tp_size"),
            (dict(tp_size=-1), "tp_size"),
            (dict(dp_size=0), "dp_size"),
            (dict(sampling_margin=0), "sampling_margin"),
            (dict(dtype="float16"), "dtype")):
        with pytest.raises(ValueError, match=match):
            Config().replace(**bad).validate()


def test_cli_bool_flags_reject_unrecognized_values():
    """'--aux_loss yes' must error, not silently parse as False."""
    import argparse

    import pytest

    from snipper_tpu.cli.common import _strict_bool

    assert _strict_bool("true") is True and _strict_bool("0") is False
    with pytest.raises(argparse.ArgumentTypeError):
        _strict_bool("yes")
