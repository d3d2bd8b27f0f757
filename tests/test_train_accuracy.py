"""Train-to-accuracy proof (VERDICT r3 #1): the framework LEARNS.

Every component is parity-tested in isolation; this test demonstrates the
end-to-end claim none of them cover — that training through the real CLI
loop produces a model whose *eval-harness metrics* recover the ground
truth. A subtly broken matcher-to-loss gradient path, target
normalization, or postprocess decode would pass every unit test and still
train to garbage; this is the one test that would catch it (the
reference's only analogous proof is its train->eval loop,
``engine.py:19-84`` + ``:87-213``).

Protocol: overfit the tiny preset on 8 fixed synthetic samples (the
standard overfit sanity check — synthetic persons render with 1/depth
apparent size, so 2D location, tracking, forecasting AND depth are all
inferable from pixels), 400 optimizer steps with the real StepLR schedule
through ``cli.train``, then run ``cli.eval`` on the same set from the
saved checkpoint and assert the 3D metrics (MPJPE / pelvis-aligned MPJPE /
3DPCK@0.15m, current and future frames) recover the GT, against a
random-init eval as the floor.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _run_eval(outdir, monkeypatch, resume=None):
    from snipper_tpu.cli import eval as eval_cli

    argv = ["eval", "--preset", "tiny", "--synthetic",
            "--synthetic_samples", "8", "--synthetic_distinct", "8",
            "--overfit", "--batch_size", "8", "--num_workers", "0",
            "--dropout", "0.0", "--output_dir", outdir]
    if resume:
        argv += ["--resume", resume]
    monkeypatch.setattr(sys, "argv", argv)
    eval_cli.main()
    with open(os.path.join(outdir, "eval_stats.json")) as f:
        return json.load(f)


def test_train_cli_recovers_eval_accuracy(tmp_path, monkeypatch):
    from snipper_tpu.cli import train as train_cli

    train_dir = str(tmp_path / "train")

    # floor: random-init eval on the same fixed set
    stats0 = _run_eval(str(tmp_path / "eval_init"), monkeypatch)
    assert stats0["3dpck"] < 0.2, stats0

    # 400 optimizer steps (25/epoch x 16 epochs), StepLR 10x drop at
    # epoch 10 (step 250); f32 on the CPU mesh (bf16 is emulated = slow
    # here; the bf16-mp default is exercised by the on-TPU repeat recorded
    # in NOTES_r4.md). LR boosted vs the canonical 1e-4 — this is a
    # hundreds-of-steps overfit, not a 40-epoch hybrid-data recipe.
    monkeypatch.setattr(sys, "argv", [
        "train", "--preset", "tiny", "--synthetic",
        "--synthetic_samples", "200", "--synthetic_distinct", "8",
        "--overfit", "--epochs", "16", "--lr_drop", "10",
        "--lr", "0.001", "--lr_backbone", "0.0005", "--dropout", "0.0",
        "--no-mixed_precision", "--num_workers", "0", "--eval_every", "16",
        "--output_dir", train_dir])
    train_cli.main()

    ckpts = sorted(os.listdir(os.path.join(train_dir, "ckpts")))
    assert ckpts, "no checkpoint written"
    ckpt = os.path.join(train_dir, "ckpts", ckpts[-1])

    # the per-epoch eval leg of the train CLI ran once (epoch 16) and the
    # log carries its stats
    log_lines = [json.loads(line) for line in
                 open(os.path.join(train_dir, "log.txt"))]
    assert any("test_3dpck" in line for line in log_lines)

    stats = _run_eval(str(tmp_path / "eval_trained"), monkeypatch,
                      resume=ckpt)

    # measured on this protocol (prototype runs): 3dpck ~0.89,
    # pel_mpjpe ~0.078 m, mpjpe_root ~0.06 m at step 400 — the bounds
    # below leave slack for seed/platform variance while staying far from
    # the random-init floor (3dpck 0.0, pel_mpjpe ~4 m)
    assert stats["3dpck"] >= 0.70, stats
    assert stats["future_3dpck"] >= 0.70, stats
    assert stats["pel_mpjpe_joint"] <= 0.12, stats
    assert stats["mpjpe_root"] <= 0.25, stats
    assert stats["mpjpe_joint"] <= 0.30, stats
    # training moved every metric decisively off the floor
    assert stats["3dpck"] > stats0["3dpck"] + 0.5, (stats0, stats)
    assert stats["pel_mpjpe_joint"] < stats0["pel_mpjpe_joint"] * 0.1, (
        stats0, stats)
    print("train-to-accuracy:", {k: round(v, 4) for k, v in stats.items()
                                 if not k.startswith("loss")})
