"""Training entry point (counterpart of reference ``main.py``).

Example (synthetic smoke run):
    python -m snipper_tpu.cli.train --preset tiny --synthetic --epochs 1
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from snipper_tpu.cli.common import (add_config_args, add_data_args,
                                    build_config, build_dataset)
from snipper_tpu.data.loader import DataLoader
from snipper_tpu.losses.criterion import SetCriterion
from snipper_tpu.models.snipper import init_model
from snipper_tpu.parallel.mesh import make_mesh
from snipper_tpu.train.checkpoint import (load_torch_checkpoint,
                                          restore_checkpoint,
                                          save_checkpoint)
from snipper_tpu.train.engine import evaluate, train_one_epoch
from snipper_tpu.train.state import create_train_state, step_lr
from snipper_tpu.train.step import (make_eval_step, make_train_step,
                                    replicate, shard_batch)


def main():
    parser = argparse.ArgumentParser("snipper_tpu trainer")
    add_config_args(parser)
    add_data_args(parser)
    parser.add_argument("--eval_every", type=int, default=1)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace of a few "
                             "steady-state steps of the FIRST epoch into "
                             "this directory and print the top device ops")
    parser.add_argument("--profile_steps", type=int, default=3)
    parser.add_argument("--device_preprocess", action="store_true",
                        help="warp/flip/color the training frames on the "
                             "TPU inside the jitted step (host stays "
                             "decode-only — the measured train bottleneck "
                             "on slow hosts); exact host-path semantics "
                             "(data/device_preprocess.py)")
    parser.add_argument("--mixed_precision",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="bf16 activations with f32 master weights/"
                             "losses — ~1.8x faster per step on v5e and the "
                             "recommended default (BASELINE.md train-impl "
                             "findings); --no-mixed_precision for full f32")
    args = parser.parse_args()
    from snipper_tpu.cli.common import respect_platform_env
    respect_platform_env()
    cfg = build_config(args)
    # TRAIN default: windowed_vjp (windowed forward + windowed custom-VJP
    # backward) is 1.71x faster per step than "xla" at canonical scale
    # (BASELINE.md round-4), and the step's in-graph lax.cond fallback
    # (make_train_step exact_model) keeps the applied update exact even
    # when learned offsets exceed the window margin. An explicit
    # --deform_impl on the command line wins over this default.
    if args.deform_impl is None and cfg.deform_impl == "xla":
        cfg = cfg.replace(deform_impl="windowed_vjp")
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"config: {cfg}", flush=True)

    train_ds = build_dataset(cfg, args, "train",
                             device_preprocess=args.device_preprocess)
    val_ds = build_dataset(cfg, args, "val")
    # per-process batch: the loader shards indices across processes
    # (DistributedSampler role); shard_batch assembles the global array.
    # batch_size is PER DATA SHARD — devices on the model (tp) axis share a
    # shard, so they don't multiply the batch
    data_shards = max(jax.local_device_count() // max(cfg.tp_size, 1), 1)
    local_batch = cfg.batch_size * data_shards
    train_loader = DataLoader(train_ds, local_batch, shuffle=True,
                              seed=cfg.seed, num_workers=args.num_workers)
    val_loader = DataLoader(val_ds, local_batch, shuffle=False,
                            num_workers=args.num_workers)
    steps_per_epoch = args.steps_per_epoch or max(len(train_loader), 1)
    if steps_per_epoch % cfg.grad_accum_steps:
        # accumulation windows would span epoch boundaries, and a final
        # partial window is accumulated but never applied (dropped silently
        # on a non-resumed exit) — see train/state.py::make_optimizer
        print(f"WARNING: steps_per_epoch {steps_per_epoch} is not a "
              f"multiple of grad_accum_steps {cfg.grad_accum_steps}: "
              "accumulation windows span epoch boundaries and a trailing "
              "partial window's gradients are dropped at exit", flush=True)

    model, params = init_model(cfg, jax.random.PRNGKey(cfg.seed))
    if args.pretrained_torch:
        params = load_torch_checkpoint(args.pretrained_torch, cfg)
        print(f"imported torch checkpoint {args.pretrained_torch}", flush=True)
    elif args.pretrained_backbone:
        from snipper_tpu.train.checkpoint import load_torchvision_backbone

        params = load_torchvision_backbone(args.pretrained_backbone, cfg,
                                           params=params)
        print(f"imported torchvision backbone {args.pretrained_backbone}",
              flush=True)
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    print(f"parameters: {n_params / 1e6:.1f}M", flush=True)

    mesh = make_mesh(dp_size=-1, tp_size=cfg.tp_size)
    # dp_size keeps the heatmap loss's bare-sum semantics equivalent to the
    # reference's per-rank sum + DDP gradient averaging
    crit = SetCriterion(cfg, dp_size=mesh.shape["data"])
    state, tx = create_train_state(cfg, params, steps_per_epoch)
    start_epoch = 0
    resume = args.resume
    if resume in ("auto", "latest"):
        from snipper_tpu.train.checkpoint import latest_checkpoint

        resume = latest_checkpoint(os.path.join(args.output_dir, "ckpts"))
        if resume is None:
            print("--resume auto: no checkpoint yet — starting fresh",
                  flush=True)
    if resume:
        state = restore_checkpoint(resume, state)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed from {resume} at epoch {start_epoch}", flush=True)
    exact_model = None
    if cfg.deform_impl in ("windowed", "windowed2d", "windowed_hybrid",
                           "windowed_vjp"):
        # windowed gradients are exact only while the overflow counter is
        # zero; this second module (same param tree, exact "xla" sampling)
        # backs the step's in-graph lax.cond redo on overflow steps
        from snipper_tpu.models.snipper import build_model

        exact_model = build_model(cfg.replace(deform_impl="xla"))
    step = make_train_step(model, crit, tx,
                           mixed_precision=args.mixed_precision,
                           exact_model=exact_model)
    eval_step = make_eval_step(model, crit, exact_model=exact_model)
    state = replicate(state, mesh)
    lr_fn = step_lr(cfg.lr, cfg.lr_drop, steps_per_epoch)

    from snipper_tpu.train.preemption import PreemptionGuard

    guard = PreemptionGuard()
    rng = jax.random.PRNGKey(cfg.seed + 1)
    # exact accumulation-window num_traj needs the host to see the whole
    # window's targets; with multiple processes each host sees only its
    # slice, so the window normalizer stays microbatch-local there
    accum = cfg.grad_accum_steps if jax.process_count() == 1 else 1
    if accum != cfg.grad_accum_steps:
        print("WARNING: multi-process run — the grad-accumulation num_traj "
              "normalizer is microbatch-local (exact window num_traj needs "
              "single-process target visibility)", flush=True)
    t0 = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        train_loader.set_epoch(epoch)
        state, train_stats = train_one_epoch(
            step, state, train_loader, epoch, rng, lr_fn=lr_fn,
            put_batch=lambda b: shard_batch(b, mesh),
            stop_flag=lambda: guard.should_stop,
            max_steps=args.steps_per_epoch,
            profile_dir=args.profile_dir if epoch == start_epoch else None,
            profile_steps=args.profile_steps,
            grad_accum_steps=accum)
        ckpt = save_checkpoint(os.path.join(args.output_dir, "ckpts"),
                               {"params": state.params,
                                "opt_state": state.opt_state,
                                "step": state.step}, epoch)
        print(f"saved {ckpt}", flush=True)

        log = {"epoch": epoch,
               **{f"train_{k}": v for k, v in train_stats.items()}}
        # no eval after a preemption signal: the checkpoint is saved, and a
        # full validation pass (plus its 20-300 s TPU compile) could outlive
        # the preemptor's grace window and lose this epoch's log line
        if not guard.should_stop and (epoch + 1) % args.eval_every == 0:
            eval_stats = evaluate(eval_step, state.params, val_loader, cfg,
                                  put_batch=lambda b: shard_batch(b, mesh))
            log.update({f"test_{k}": v for k, v in eval_stats.items()
                        if not k.startswith("_")})
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(log) + "\n")
        if guard.should_stop:
            print("checkpoint saved on preemption — exiting", flush=True)
            break
    print(f"done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
