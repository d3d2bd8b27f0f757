"""Shared CLI argument handling: one parser mapped onto the Config dataclass
(the reference duplicates ~70 argparse flags across three CLIs,
``main.py:20-153`` / ``eval.py`` / ``inference.py``; here the flag set is
generated from Config so the CLIs can never drift)."""

from __future__ import annotations

import argparse
import dataclasses
import os

from snipper_tpu.config import Config, PRESETS


def respect_platform_env():
    """Honor ``JAX_PLATFORMS`` even when a sitecustomize pins
    ``jax_platforms`` via the config API (which silently overrides the env
    var): ``JAX_PLATFORMS=cpu python -m snipper_tpu.cli...`` must actually
    run on CPU. Call at the top of every CLI ``main()``.

    Also enables the persistent XLA compilation cache when
    ``SNIPPER_COMPILATION_CACHE=<dir>`` is set: TPU compiles of the
    canonical configs cost 20-300 s per process start, and serving/eval
    restarts re-pay them — the on-disk cache makes warm restarts near-
    instant (the reference has no analog; PyTorch eager has no compile)."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        jax.config.update("jax_platforms", env)
    cache_dir = os.environ.get("SNIPPER_COMPILATION_CACHE")
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every jitted program, not just the >1 s default cutoff
        # (the CLIs compile a handful of programs; disk cost is small)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _strict_bool(s: str) -> bool:
    """Reject unrecognized values: ``--aux_loss yes`` silently parsing as
    False would disable a loss with no error."""
    if s in ("1", "true", "True"):
        return True
    if s in ("0", "false", "False"):
        return False
    raise argparse.ArgumentTypeError(
        f"expected true/false/1/0 (got {s!r})")


def add_config_args(parser: argparse.ArgumentParser):
    for f in dataclasses.fields(Config):
        if f.type in ("int", int):
            parser.add_argument(f"--{f.name}", type=int, default=None)
        elif f.type in ("float", float):
            parser.add_argument(f"--{f.name}", type=float, default=None)
        elif f.type in ("bool", bool):
            parser.add_argument(f"--{f.name}", type=_strict_bool,
                                default=None)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=None)


def add_data_args(parser: argparse.ArgumentParser):
    parser.add_argument("--preset", type=str, default=None,
                        help=f"Config preset: {', '.join(PRESETS)} (one per "
                             "shipped reference checkpoint + recipes)")
    parser.add_argument("--posetrack_dir", type=str, default=None)
    parser.add_argument("--coco_dir", type=str, default=None)
    parser.add_argument("--muco_dir", type=str, default=None)
    parser.add_argument("--jta_dir", type=str, default=None)
    parser.add_argument("--panoptic_dir", type=str, default=None)
    parser.add_argument("--panoptic_protocol", type=int, default=1)
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic dataset (smoke/benchmark)")
    parser.add_argument("--synthetic_samples", type=int, default=None,
                        help="synthetic dataset size (default 64 train / "
                             "8 val)")
    parser.add_argument("--synthetic_distinct", type=int, default=None,
                        help="limit the synthetic set to N unique samples "
                             "(indices cycle) — overfit-training shape")
    parser.add_argument("--overfit", action="store_true",
                        help="validation set = the TRAINING set (same "
                             "synthetic seed): the standard overfit sanity "
                             "check that the train->eval path can recover "
                             "ground truth")
    parser.add_argument("--output_dir", type=str, default="./output")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path to resume from, or the "
                             "sentinel 'auto'/'latest' = newest checkpoint "
                             "under {output_dir}/ckpts (starts fresh when "
                             "none exists — one command line serves first "
                             "start and preemption restart)")
    parser.add_argument("--pretrained_torch", type=str, default=None,
                        help="path to a reference .pth checkpoint to import")
    parser.add_argument("--pretrained_backbone", type=str, default=None,
                        help="path to a raw torchvision resnet .pth; "
                             "initializes ONLY the backbone (the "
                             "reference's ImageNet-pretrained start, "
                             "backbone.py:107)")
    parser.add_argument("--steps_per_epoch", type=int, default=None)
    parser.add_argument("--num_workers", type=int, default=2,
                        help="threads decoding/warping a batch's samples in "
                             "parallel (the torch num_workers role; image "
                             "decode releases the GIL). 0 = inline")


def build_config(args) -> Config:
    if args.preset:
        if args.preset not in PRESETS:
            raise SystemExit(f"unknown preset {args.preset!r}; choose from: "
                             f"{', '.join(PRESETS)}")
        cfg = getattr(Config, args.preset)()
    else:
        cfg = Config()
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    try:
        return cfg.replace(**overrides).validate()
    except ValueError as e:
        # same clean one-line exit as a preset typo, not a raw traceback
        raise SystemExit(str(e)) from e


def build_dataset(cfg: Config, args, mode: str,
                  device_preprocess: bool = False):
    if args.synthetic or not any((args.posetrack_dir, args.coco_dir,
                                  args.muco_dir, args.jta_dir,
                                  args.panoptic_dir)):
        from snipper_tpu.data.synthetic import SyntheticDataset

        n = getattr(args, "synthetic_samples", None) or (
            64 if mode == "train" else 8)
        overfit = getattr(args, "overfit", False)
        if device_preprocess:
            print("NOTE: --device_preprocess ignored for the synthetic "
                  "dataset (it renders pre-warped frames directly)",
                  flush=True)
        return SyntheticDataset(
            cfg, n_samples=n,
            seed=0 if (mode == "train" or overfit) else 1,
            distinct=getattr(args, "synthetic_distinct", None))
    from snipper_tpu.data.datasets import HybridDataset

    return HybridDataset(
        cfg, mode=mode, posetrack_dir=args.posetrack_dir,
        coco_dir=args.coco_dir, muco_dir=args.muco_dir,
        jta_dir=args.jta_dir, panoptic_dir=args.panoptic_dir,
        panoptic_protocol=args.panoptic_protocol,
        device_preprocess=device_preprocess)
