"""Serving export: jax.export StableHLO artifact roundtrip + CLI.

The artifact (weights baked in) must reproduce the live ``model.apply``
outputs exactly after serialize -> disk -> deserialize, with no model code
in the serving path beyond ``jax.export.deserialize``.
"""

import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_export_roundtrip_matches_apply(tmp_path):
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.infer.export import (export_forward, load_exported,
                                          save_exported)
    from snipper_tpu.models.snipper import init_model

    cfg = Config.tiny().replace(deform_impl="pmerged")
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "tiny.stablehlo")
    # multi-platform: cross-lowers the TPU variant from this CPU host (the
    # serving story: artifacts are built wherever, run on the fleet)
    exported = export_forward(cfg, params, batch_size=1,
                              platforms=["cpu", "tpu"])
    assert tuple(exported.platforms) == ("cpu", "tpu")
    size = save_exported(exported, path)
    assert size == os.path.getsize(path) > 0

    run = load_exported(path)
    x = np.random.default_rng(0).uniform(
        0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width, 3)
    ).astype(np.float32)
    out = run(x)
    ref = model.apply({"params": params}, jnp.asarray(x))

    # train/debug-only trees are dropped from the serving artifact
    for k in ("aux_logits", "aux_kpts2d", "aux_depth", "references"):
        assert k not in out and k in ref, k
    for k in ("pred_logits", "pred_kpts2d", "pred_depth"):
        # not bit-identical: the exported module fuses independently of the
        # live jit — but must agree to float32 roundoff
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                    rtol=1e-5, atol=1e-5, err_msg=k)
    assert len(out["heatmaps"]) == len(ref["heatmaps"])
    assert float(np.asarray(out["sampling_overflow"])) == 0.0

    # the eager (jit_call=False) serving shape must agree with the jitted
    # default (it is the same module, just dispatched per call)
    out_eager = load_exported(path, jit_call=False)(x)
    np.testing.assert_allclose(np.asarray(out_eager["pred_kpts2d"]),
                               np.asarray(out["pred_kpts2d"]),
                               rtol=1e-6, atol=1e-6)

    # batch shape is part of the artifact contract
    with pytest.raises(Exception):
        run(np.repeat(x, 2, axis=0))


@pytest.mark.slow
def test_export_cli(tmp_path, monkeypatch, capsys):
    import jax

    from snipper_tpu.cli import export as export_cli
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.checkpoint import save_checkpoint

    # embed weights from an Orbax checkpoint (the trained-model flow)
    from snipper_tpu.config import Config as Cfg

    _, params = init_model(Cfg.tiny(), jax.random.PRNGKey(7))
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), {"params": params},
                           epoch=0)

    out = str(tmp_path / "model.stablehlo")
    monkeypatch.setattr(sys, "argv", [
        "export", "--preset", "tiny", "--output", out,
        "--resume", ckpt, "--param_dtype", "bfloat16"])
    export_cli.main()
    assert os.path.getsize(out) > 0
    assert "impl=pmerged" in capsys.readouterr().out

    from snipper_tpu.config import Config
    from snipper_tpu.infer.export import load_exported

    cfg = Config.tiny()
    run = load_exported(out)
    x = np.zeros((1, cfg.num_frames, cfg.input_height, cfg.input_width, 3),
                 np.float32)
    o = run(x)
    assert np.isfinite(np.asarray(o["pred_kpts2d"], np.float32)).all()

    # --fast profile artifact: the checkpoint loads full-shape, the tree is
    # transformed, and the artifact serves at the PROFILE's input shape
    out2 = str(tmp_path / "model_fast.stablehlo")
    monkeypatch.setattr(sys, "argv", [
        "export", "--preset", "tiny", "--output", out2,
        "--resume", ckpt, "--fast", "p2,r48"])
    export_cli.main()
    run2 = load_exported(out2)
    x2 = np.zeros((1, cfg.num_frames, 48, 72, 3), np.float32)
    o2 = run2(x2)
    assert np.isfinite(np.asarray(o2["pred_kpts2d"], np.float32)).all()
    with pytest.raises(Exception):
        run2(x)  # the full-resolution shape is not this artifact's contract

    # m-profiles cannot ship in a static artifact (no runtime cascade)
    monkeypatch.setattr(sys, "argv", [
        "export", "--preset", "tiny", "--output", out2,
        "--resume", ckpt, "--fast", "m3"])
    with pytest.raises(SystemExit):
        export_cli.main()
