"""Final evaluation entry point (counterpart of reference ``eval.py``):
loads a checkpoint, runs the full eval loop, writes PoseTrack/COCO result
files and prints 3D metrics."""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from snipper_tpu.cli.common import (add_config_args, add_data_args,
                                    build_config, build_dataset)
from snipper_tpu.data.loader import DataLoader
from snipper_tpu.losses.criterion import SetCriterion
from snipper_tpu.models.snipper import build_model, init_model
from snipper_tpu.train.checkpoint import (load_torch_checkpoint,
                                          restore_checkpoint)
from snipper_tpu.train.engine import evaluate
from snipper_tpu.train.step import make_eval_step


def main():
    parser = argparse.ArgumentParser("snipper_tpu evaluator")
    add_config_args(parser)
    add_data_args(parser)
    parser.add_argument("--write_posetrack", action="store_true")
    parser.add_argument("--posetrack_gt_dir", type=str, default=None,
                        help="GT annotation JSON dir; if given, run the "
                             "PoseTrack AP/MOT evaluation after writing")
    parser.add_argument("--coco_gt_json", type=str, default=None,
                        help="COCO keypoint GT json; if given, run OKS eval")
    parser.add_argument("--save_vis", action="store_true",
                        help="write GT-vs-prediction keypoint renders for "
                             "the first eval batches (reference "
                             "engine.py:132-135 save_vis)")
    from snipper_tpu.infer.fast import PROFILE_HELP
    parser.add_argument("--fast", type=str, default=None, help=PROFILE_HELP)
    args = parser.parse_args()
    from snipper_tpu.cli.common import respect_platform_env
    respect_platform_env()
    cfg = build_config(args)
    # evaluation is forward-only: the point-merged sampling is exact and
    # ~15% faster than the train-default "xla" core (BASELINE.md).
    # An explicit --deform_impl on the command line wins over this default.
    if args.deform_impl is None and cfg.deform_impl == "xla":
        cfg = cfg.replace(deform_impl="pmerged")
    # serving profiles: checkpoints load under the ORIGINAL config, then the
    # tree is transformed to the profile architecture (infer/fast.py); the
    # dataset/eval run under the profile config so the measured metrics ARE
    # the profile's accuracy
    load_cfg, fast_transform = cfg, None
    if args.fast:
        from snipper_tpu.infer.fast import fast_profiles

        cfg, fast_transform = fast_profiles(cfg, args.fast)
    os.makedirs(args.output_dir, exist_ok=True)

    val_ds = build_dataset(cfg, args, "val")
    loader = DataLoader(val_ds, cfg.batch_size, shuffle=False,
                        drop_last=False, num_workers=args.num_workers)

    if args.pretrained_torch:
        model = build_model(cfg)
        params = load_torch_checkpoint(args.pretrained_torch, load_cfg)
    elif args.resume:
        model = build_model(cfg)
        params = restore_checkpoint(args.resume, None)["params"]
    else:
        # random-init smoke run: the one case that needs an init pass; the
        # init tree is already profile-shaped — no transform
        model, params = init_model(cfg, jax.random.PRNGKey(cfg.seed))
        fast_transform = None
    if fast_transform is not None:
        params = fast_transform(params)

    crit = SetCriterion(cfg)
    eval_step = make_eval_step(model, crit)
    stats = evaluate(
        eval_step, params, loader, cfg, collect_results=True,
        save_vis_dir=(os.path.join(args.output_dir, "eval_vis")
                      if args.save_vis else None))
    results = stats.pop("_results", [])

    def dump_stats():
        with open(os.path.join(args.output_dir, "eval_stats.json"),
                  "w") as f:
            json.dump({k: v for k, v in stats.items()
                       if isinstance(v, (int, float))}, f, indent=2)

    # persist the 3D/loss/PCKh stats BEFORE the harness legs so a harness
    # failure (malformed GT dir etc.) cannot lose a long eval run
    dump_stats()

    if args.write_posetrack:
        from snipper_tpu.eval.posetrack_writer import (
            collect_posetrack_results, write_val_results)

        by_video = collect_posetrack_results(results, cfg.num_frames)
        pred_dir = os.path.join(args.output_dir, "posetrack_results")
        write_val_results(by_video, getattr(val_ds, "posetrack_data", {}),
                          pred_dir)
        if args.posetrack_gt_dir:
            from snipper_tpu.eval.posetrack_eval import evaluate_posetrack18

            pt = evaluate_posetrack18(args.posetrack_gt_dir, pred_dir)
            for section, metrics in pt.items():
                for k, v in metrics.items():
                    stats[f"posetrack_{section}_{k}"] = float(
                        np.asarray(v)[-1])

    if args.coco_gt_json:
        from snipper_tpu.eval.coco_eval import (evaluate_coco_keypoints,
                                                write_coco_results)

        from snipper_tpu.eval.metrics import transform_pts

        coco_results = {}
        for r in results:
            if r.get("dataset") == "coco":
                # predictions are in warped model-input space; the GT json
                # is in ORIGINAL image pixels — inverse-transform first
                # (same as the PCKh path, reference engine.py:444-511)
                k = transform_pts(np.asarray(r["pred_kpts"])[:, 0],
                                  r["inv_trans"])
                coco_results.setdefault(r["image_id"], []).append(
                    (np.asarray(r["human_score"]).max(-1),
                     np.concatenate([k, r["pred_kpt_scores"][:, 0]], -1)))
        if coco_results:
            pred_json = write_coco_results(coco_results, args.output_dir)
            stats.update({f"coco_{k}": v for k, v in
                          evaluate_coco_keypoints(args.coco_gt_json,
                                                  pred_json).items()})

    # rewrite with the harness numbers included (PoseTrack AP/PCKh/MOT,
    # COCO OKS) — reference eval.py prints these at the end (eval.py:261-271)
    dump_stats()
    print(json.dumps({k: round(v, 4) for k, v in stats.items()
                      if isinstance(v, float)}, indent=2))


if __name__ == "__main__":
    main()
