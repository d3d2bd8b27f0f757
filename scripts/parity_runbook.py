"""One-command accuracy-parity runbook (VERDICT r4 #1b).

Given a reference-format PyTorch checkpoint (the shipped ``.pth`` files,
reference README.md:28-38) and whatever dataset directories exist, this
emits everything the parity claim needs in one run:

1. **Golden activation dumps + reference cross-check** — the checkpoint is
   imported through the production converter, the flax forward runs on a
   deterministic probe snippet, and (when ``/root/reference`` is present)
   the reference's OWN model code runs the same checkpoint on the same
   input in a subprocess; per-output max-abs/rel diffs are reported
   (checkpoint-level `inference.py` output fidelity, BASELINE.json north
   star).
2. **Metric tables** — ``cli.eval`` runs per provided dataset dir
   (MuPoTS 3DPCK_rel, PoseTrack AP/MOTA via the poseval-parity harness,
   COCO keypoint AP, JTA forecasting, Panoptic), collecting each
   ``eval_stats.json`` into one report.

Outputs in --output_dir: ``report.json``, ``report.md``,
``goldens/{probe_input,flax_outputs,reference_outputs}.npz``.

Usage (the day real artifacts exist, parity is this one command):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/parity_runbook.py \
        --checkpoint /path/to/checkpoint0039.pth --preset canonical_t4 \
        --mupots_dir ... --posetrack_dir ... --posetrack_gt_dir ... \
        --output_dir /tmp/parity

Smoke-tested end to end on the reference-format oracle checkpoint by
``tests/test_parity_runbook.py``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REFERENCE = "/root/reference"

# runnable from anywhere without an installed package; child processes
# (reference worker, cli.eval legs) inherit the path via PYTHONPATH
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [p for p in (os.environ.get("PYTHONPATH", ""), REPO) if p])

# Config fields whose names/meanings match the reference argparse flags
# (models consume these via build_model, reference main.py:20-153)
_SHARED_MODEL_FIELDS = (
    "num_frames", "num_future_frames", "hidden_dim", "nheads", "enc_layers",
    "dec_layers", "dim_feedforward", "num_queries", "num_kpts",
    "enc_n_points", "dec_n_points", "num_feature_levels", "dropout",
    "max_depth", "backbone", "dilation", "aux_loss",
)


# --------------------------------------------------------------- worker
def reference_worker(ckpt_path: str, input_npz: str, out_npz: str,
                     cfg_json: str):
    """Subprocess mode: run the reference's ACTUAL model code with the
    checkpoint's weights on the probe input (torchvision stubbed exactly
    as in tests/_reference_oracle_worker.py; CPU pure-torch MSDA path,
    reference ms_deform_attn_func.py:45-65)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _reference_oracle_worker import install_torchvision_stub

    install_torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from models.model import build_model  # noqa: E402
    from util.misc import nested_tensor_from_tensor_list  # noqa: E402

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    with open(cfg_json) as f:
        cfg = json.load(f)
    args = ckpt.get("args")
    if args is None:
        args = argparse.Namespace()
    # model-shape fields from OUR config (authoritative for the run);
    # anything else build_model reads keeps the checkpoint's value
    for k in _SHARED_MODEL_FIELDS:
        setattr(args, k, cfg[k])
    for k, v in (("device", "cpu"), ("use_pytorch_deform", 1),
                 ("masks", False), ("position_embedding", "sine"),
                 ("lr_backbone", 1e-5), ("set_cost_is_human", 1.0),
                 ("set_cost_root", 1.0), ("set_cost_root_vis", 0.1),
                 ("set_cost_root_depth", 1.0), ("set_cost_joint", 1.0),
                 ("set_cost_joint_vis", 0.1), ("set_cost_joint_depth", 1.0),
                 ("is_human_loss_coef", 1.0), ("root_loss_coef", 1.0),
                 ("root_vis_loss_coef", 0.1), ("root_depth_loss_coef", 1.0),
                 ("joint_loss_coef", 1.0), ("joint_vis_loss_coef", 1.0),
                 ("joint_depth_loss_coef", 1.0),
                 ("joint_disp_loss_coef", 1.0),
                 ("joint_disp_depth_loss_coef", 1.0),
                 ("cont_loss_coef", 0.1), ("heatmap_loss_coef", 0.01),
                 ("eos_coef", 0.5)):
        if not hasattr(args, k):
            setattr(args, k, v)
    args.device = "cpu"
    args.use_pytorch_deform = 1

    model, _, _ = build_model(args)
    missing, unexpected = model.load_state_dict(ckpt["model"], strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    model.eval()

    x = np.load(input_npz)["x"]  # [B, T*3, H, W] float32
    samples = nested_tensor_from_tensor_list(
        [torch.from_numpy(x[i]) for i in range(x.shape[0])])
    with torch.no_grad():
        out, _ = model(samples)
    arrays = {k: out[k].numpy()
              for k in ("pred_logits", "pred_kpts2d", "pred_depth")}
    for lvl, hm in enumerate(out["heatmaps"]):
        arrays[f"heatmap_{lvl}"] = hm.numpy()
    np.savez(out_npz, **arrays)
    print("REFERENCE-WORKER-OK", flush=True)


# ----------------------------------------------------------------- main
def _probe_input(cfg, seed: int = 0):
    """Deterministic uint8-derived probe snippet at the config's input
    size (uint8 so the dump is reproducible across environments)."""
    rng = np.random.default_rng(seed)
    T, H, W = cfg.num_frames, cfg.input_height, cfg.input_width
    u8 = rng.integers(0, 256, (1, T, H, W, 3), dtype=np.uint8)
    return u8.astype(np.float32) / 255.0  # [1, T, H, W, 3]


def _activation_leg(args, cfg, report):
    import jax.numpy as jnp

    from snipper_tpu.models.snipper import build_model
    from snipper_tpu.train.checkpoint import load_torch_checkpoint

    goldens = os.path.join(args.output_dir, "goldens")
    os.makedirs(goldens, exist_ok=True)
    params = load_torch_checkpoint(args.checkpoint, cfg)
    model = build_model(cfg)
    imgs = _probe_input(cfg)
    out = model.apply({"params": params}, jnp.asarray(imgs))
    flax_arrays = {k: np.asarray(out[k])
                   for k in ("pred_logits", "pred_kpts2d", "pred_depth")}
    for lvl, hm in enumerate(out["heatmaps"]):
        flax_arrays[f"heatmap_{lvl}"] = np.asarray(hm)
    np.savez(os.path.join(goldens, "flax_outputs.npz"), **flax_arrays)
    # reference layout: [B, T*3, H, W]
    B, T, H, W, _ = imgs.shape
    x = imgs.transpose(0, 1, 4, 2, 3).reshape(B, T * 3, H, W)
    np.savez(os.path.join(goldens, "probe_input.npz"), x=x)
    print(f"flax goldens written to {goldens}", flush=True)

    if args.skip_reference or not os.path.isdir(REFERENCE):
        report["activation_parity"] = "skipped (no reference tree)"
        return
    cfg_json = os.path.join(goldens, "cfg.json")
    with open(cfg_json, "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    ref_npz = os.path.join(goldens, "reference_outputs.npz")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--reference_worker",
         "--checkpoint", args.checkpoint,
         "--worker_input", os.path.join(goldens, "probe_input.npz"),
         "--worker_output", ref_npz, "--worker_cfg", cfg_json],
        capture_output=True, text=True, timeout=args.worker_timeout)
    if "REFERENCE-WORKER-OK" not in proc.stdout:
        report["activation_parity"] = {
            "error": proc.stderr[-2000:] or proc.stdout[-2000:]}
        print("reference worker FAILED:", proc.stderr[-2000:], flush=True)
        return
    ref = np.load(ref_npz)
    diffs = {}
    for k in flax_arrays:
        a, b = flax_arrays[k], ref[k]
        denom = np.maximum(np.abs(b), 1e-6)
        diffs[k] = {"max_abs": float(np.abs(a - b).max()),
                    "max_rel": float((np.abs(a - b) / denom).max())}
    report["activation_parity"] = diffs
    worst = max(d["max_abs"] for d in diffs.values())
    print(f"activation parity vs reference code: worst max_abs "
          f"{worst:.3e} over {len(diffs)} outputs", flush=True)


# eval-dataset name -> the cli.eval flag that enables it (MuPoTS eval
# rides --muco_dir, mirroring the reference's MuCo-train/MuPoTS-eval
# pairing, hybrid_dataloader.py:644)
_DATASET_FLAGS = {
    "mupots": ["--muco_dir"],
    "posetrack": ["--posetrack_dir"],
    "coco": ["--coco_dir"],
    "jta": ["--jta_dir"],
    "panoptic": ["--panoptic_dir"],
}


def _cfg_flags(cfg):
    """The fully-resolved config as CLI flags, so the eval subprocesses run
    the exact model shape the checkpoint was imported with (preset +
    overrides)."""
    out = []
    for f in dataclasses.fields(type(cfg)):
        v = getattr(cfg, f.name)
        out += [f"--{f.name}", str(v) if not isinstance(v, bool)
                else ("true" if v else "false")]
    return out


def _eval_leg(args, cfg, report):
    for name, flags in _DATASET_FLAGS.items():
        d = getattr(args, f"{name}_dir", None)
        if not d:
            continue
        out_dir = os.path.join(args.output_dir, f"eval_{name}")
        cmd = [sys.executable, "-m", "snipper_tpu.cli.eval",
               "--pretrained_torch", args.checkpoint,
               *_cfg_flags(cfg),
               flags[0], d, "--output_dir", out_dir]
        if name == "posetrack":
            cmd += ["--write_posetrack"]
            if args.posetrack_gt_dir:
                cmd += ["--posetrack_gt_dir", args.posetrack_gt_dir]
        if name == "coco" and args.coco_gt_json:
            cmd += ["--coco_gt_json", args.coco_gt_json]
        if name == "panoptic":
            cmd += ["--panoptic_protocol", str(args.panoptic_protocol)]
        print(f"[{name}] {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=args.eval_timeout)
        stats_path = os.path.join(out_dir, "eval_stats.json")
        if proc.returncode == 0 and os.path.exists(stats_path):
            with open(stats_path) as f:
                report[f"eval_{name}"] = json.load(f)
            print(f"[{name}] OK", flush=True)
        else:
            report[f"eval_{name}"] = {"error": proc.stderr[-2000:]}
            print(f"[{name}] FAILED: {proc.stderr[-800:]}", flush=True)


def _write_report(args, report):
    with open(os.path.join(args.output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    lines = ["# Parity runbook report", "",
             f"checkpoint: `{args.checkpoint}`  preset: `{args.preset}`", ""]
    ap = report.get("activation_parity")
    lines.append("## Activation parity (flax vs reference code)")
    if isinstance(ap, dict) and "error" not in ap:
        lines.append("")
        lines.append("| output | max abs diff | max rel diff |")
        lines.append("|---|---|---|")
        for k, d in ap.items():
            lines.append(f"| {k} | {d['max_abs']:.3e} | {d['max_rel']:.3e} |")
    else:
        lines.append(f"{ap}")
    for key, val in report.items():
        if not key.startswith("eval_"):
            continue
        lines += ["", f"## {key}", ""]
        if "error" in val:
            lines.append(f"FAILED: {val['error'][:500]}")
            continue
        lines.append("| metric | value |")
        lines.append("|---|---|")
        for k, v in sorted(val.items()):
            if isinstance(v, (int, float)):
                lines.append(f"| {k} | {v:.4f} |")
    path = os.path.join(args.output_dir, "report.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report written to {path}", flush=True)


def main():
    p = argparse.ArgumentParser("snipper_tpu parity runbook")
    p.add_argument("--checkpoint", required=True,
                   help="reference-format .pth (main.py:266-273 dict) or a "
                        "bare state-dict .pth")
    p.add_argument("--preset", default="canonical_t4")
    p.add_argument("--output_dir", default="./parity_out")
    # every Config field is overridable, exactly as in the CLIs
    from snipper_tpu.cli.common import add_config_args

    add_config_args(p)
    p.add_argument("--skip_reference", action="store_true",
                   help="skip the reference-code activation cross-check")
    for name in _DATASET_FLAGS:
        p.add_argument(f"--{name}_dir", type=str, default=None)
    p.add_argument("--posetrack_gt_dir", type=str, default=None)
    p.add_argument("--coco_gt_json", type=str, default=None)
    p.add_argument("--panoptic_protocol", type=int, default=1)
    p.add_argument("--eval_timeout", type=int, default=24 * 3600)
    p.add_argument("--worker_timeout", type=int, default=4 * 3600)
    # internal subprocess mode
    p.add_argument("--reference_worker", action="store_true")
    p.add_argument("--worker_input", type=str, default=None)
    p.add_argument("--worker_output", type=str, default=None)
    p.add_argument("--worker_cfg", type=str, default=None)
    args = p.parse_args()

    if args.reference_worker:
        reference_worker(args.checkpoint, args.worker_input,
                         args.worker_output, args.worker_cfg)
        return

    from snipper_tpu.cli.common import build_config, respect_platform_env
    respect_platform_env()

    cfg = build_config(args)
    os.makedirs(args.output_dir, exist_ok=True)
    report = {"checkpoint": args.checkpoint, "preset": args.preset}
    _activation_leg(args, cfg, report)
    _eval_leg(args, cfg, report)
    _write_report(args, report)


if __name__ == "__main__":
    main()
