"""End-to-end CLI smoke tests (tiny preset, synthetic data, CPU mesh).

The reference's integration entry points are its CLIs (main.py / eval.py /
inference.py); these exercise ours the same way: a real train epoch with
checkpointing + log.txt, then final evaluation restoring that checkpoint.
"""

import json
import os
import sys

import pytest


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path, monkeypatch):
    out = str(tmp_path / "run")
    from snipper_tpu.cli import train as train_cli

    # SNIPPER_COMPILATION_CACHE is applied via jax.config (process-global,
    # not restored by monkeypatch) — snapshot and restore so later tests
    # don't silently write compile-cache entries into this tmp dir
    import jax

    cache_flags = ("jax_compilation_cache_dir",
                   "jax_persistent_cache_min_compile_time_secs",
                   "jax_persistent_cache_min_entry_size_bytes")
    prev = {name: getattr(jax.config, name) for name in cache_flags}
    monkeypatch.setenv("SNIPPER_COMPILATION_CACHE",
                       str(tmp_path / "ccache"))
    try:
        _run_main(train_cli, [
            "train", "--preset", "tiny", "--synthetic", "--epochs", "1",
            "--steps_per_epoch", "4", "--no-mixed_precision",  # f32: bf16
            # is emulated (slow) on the CPU mesh; the default mp path is
            # covered by test_mixed_precision_matches_f32_losses
            "--profile_dir", str(tmp_path / "trace"),
            "--profile_steps", "1",
            "--output_dir", out], monkeypatch)
    finally:
        monkeypatch.delenv("SNIPPER_COMPILATION_CACHE")
        for name, val in prev.items():
            jax.config.update(name, val)

    # per-epoch artifacts: checkpoint + JSON-lines log (reference
    # main.py:260-339)
    log = os.path.join(out, "log.txt")
    assert os.path.exists(log)
    rec = json.loads(open(log).readline())
    assert "train_loss_total" in rec and rec["epoch"] == 0
    ckpts = os.listdir(os.path.join(out, "ckpts"))
    assert any(c.startswith("checkpoint") for c in ckpts)
    # --profile_dir captured a device trace of the steady-state steps
    import glob

    assert glob.glob(str(tmp_path / "trace" /
                         "plugins/profile/*/*.trace.json.gz"))
    # SNIPPER_COMPILATION_CACHE populated the persistent XLA cache
    assert os.listdir(tmp_path / "ccache")

    from snipper_tpu.cli import eval as eval_cli

    ck = os.path.join(out, "ckpts", sorted(ckpts)[0])
    eout = str(tmp_path / "eval")
    _run_main(eval_cli, [
        "eval", "--preset", "tiny", "--synthetic", "--resume", ck,
        "--output_dir", eout], monkeypatch)
    assert os.path.exists(eout)

    # resume TRAINING from the epoch-0 checkpoint: optimizer state + step
    # restore and the loop continues at epoch 1 (reference main.py:242-248).
    # "--resume auto" resolves to the newest checkpoint under
    # {output_dir}/ckpts (the preemption auto-restart convenience,
    # checkpoint.py::latest_checkpoint) — here checkpoint0000
    _run_main(train_cli, [
        "train", "--preset", "tiny", "--synthetic", "--epochs", "2",
        "--steps_per_epoch", "4", "--no-mixed_precision",
        "--resume", "auto", "--output_dir", out], monkeypatch)
    epochs_logged = [json.loads(ln)["epoch"] for ln in open(log)]
    assert 1 in epochs_logged, epochs_logged
    assert any(c.startswith("checkpoint0001")
               for c in os.listdir(os.path.join(out, "ckpts")))


@pytest.mark.slow
def test_fast_profiles_through_eval_and_infer_cli(tmp_path, monkeypatch):
    """--fast on the eval/infer CLIs: the checkpoint loads under the full
    config, the tree transform applies, and the profile architecture runs
    end to end (flax's strict param checking makes a wrong transform fail
    loudly). The TPU-scale equivalent is the round-5 measured sweep
    (BASELINE.md 'Fast serving profiles')."""
    import jax
    import numpy as np

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.checkpoint import save_checkpoint

    _, params = init_model(Config.tiny(), jax.random.PRNGKey(11))
    ck = save_checkpoint(str(tmp_path / "ckpts"), {"params": params}, 0)

    from snipper_tpu.cli import eval as eval_cli

    eout = str(tmp_path / "eval_fast")
    _run_main(eval_cli, [
        "eval", "--preset", "tiny", "--synthetic", "--synthetic_samples",
        "2", "--num_workers", "0", "--resume", ck, "--fast", "p2,r48",
        "--output_dir", eout], monkeypatch)
    stats = json.load(open(os.path.join(eout, "eval_stats.json")))
    assert "loss_total" in stats

    # frames for the infer leg (tiny T=2, gap 2 -> 2 snippets over 5)
    from PIL import Image

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (40, 60, 3), np.uint8,
                                     endpoint=True)).save(
            frames / f"{i:03d}.jpg")

    from snipper_tpu.cli import infer as infer_cli

    iout = str(tmp_path / "infer_fast")
    _run_main(infer_cli, [
        "infer", "--preset", "tiny", "--data_dir", str(frames),
        "--seq_gap", "2", "--resume", ck, "--fast", "p2,r48",
        "--output_dir", iout], monkeypatch)
    assert os.path.exists(os.path.join(iout, "tracks.pkl"))
