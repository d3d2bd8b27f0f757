"""End-to-end smoke of the one-command parity runbook (VERDICT r4 #1b).

Drives ``scripts/parity_runbook.py`` on a checkpoint saved in the
reference's exact on-disk format by the reference's own code
(``_reference_oracle_worker.py``) plus a reference-format MuPoTS rehearsal
dataset: the runbook must import the checkpoint, cross-check activations
against the reference model in a subprocess, run the eval harness, and
emit the report + golden dumps — proving that the day real artifacts
exist, parity is one command.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(__file__)
RUNBOOK = os.path.join(HERE, "..", "scripts", "parity_runbook.py")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("oracle"))
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "_reference_oracle_worker.py"),
         out], capture_output=True, text=True, timeout=900)
    assert "ORACLE-OK" in proc.stdout, (proc.stdout[-2000:],
                                        proc.stderr[-2000:])
    return out


def test_runbook_end_to_end(oracle, tmp_path):
    from test_eval_rehearsal import _mupots_raw

    from snipper_tpu.data.preprocess import mupots as mupots_pp

    mupots = tmp_path / "mupots"
    os.makedirs(mupots)
    _mupots_raw(mupots, n_frames=40)
    mupots_pp.extract(str(mupots), str(mupots))
    out_dir = str(tmp_path / "parity")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, RUNBOOK,
         "--checkpoint", os.path.join(oracle, "reference.pth"),
         "--preset", "tiny", "--output_dir", out_dir,
         "--mupots_dir", str(mupots),
         # mirror _reference_oracle_worker.reference_args()
         "--num_frames", "2", "--num_future_frames", "1",
         "--hidden_dim", "96", "--nheads", "4", "--enc_layers", "1",
         "--dec_layers", "2", "--dim_feedforward", "128",
         "--num_queries", "8", "--num_kpts", "15",
         "--input_height", "64", "--input_width", "96",
         "--max_depth", "15", "--dropout", "0.0", "--max_persons", "4",
         "--backbone", "resnet50"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])

    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)

    # activation cross-check ran against the real reference code and the
    # imported checkpoint reproduces its outputs
    ap = report["activation_parity"]
    assert isinstance(ap, dict) and "error" not in ap, ap
    assert {"pred_logits", "pred_kpts2d", "pred_depth"} <= set(ap)
    worst = max(d["max_abs"] for d in ap.values())
    assert worst < 5e-4, ap

    # the MuPoTS eval leg produced the 3D metric table
    ev = report["eval_mupots"]
    assert "error" not in ev, ev
    for key in ("mpjpe_root", "mpjpe_joint", "pel_mpjpe_joint", "3dpck"):
        assert key in ev and np.isfinite(ev[key]), (key, ev)

    # golden dumps + human-readable report on disk
    for f_ in ("goldens/probe_input.npz", "goldens/flax_outputs.npz",
               "goldens/reference_outputs.npz", "report.md"):
        assert os.path.exists(os.path.join(out_dir, f_)), f_
