"""Train / eval epoch loops (counterpart of reference ``engine.py``).

``train_one_epoch``: jitted step per batch, non-finite-loss abort
(reference ``engine.py:68-71``), smoothed metric logging.
``evaluate``: forward + criterion per batch, PostProcess, 3D metric
accumulation over current and future frame ranges (reference
``engine.py:99-212``): MPJPE root/joint, pelvis-aligned MPJPE, and
3DPCK_rel @ 0.15 m.
"""

from __future__ import annotations

import sys
from typing import Dict, Optional

import jax
import numpy as np

from snipper_tpu.config import Config
from snipper_tpu.eval.metrics import eval_kpts2d_pckh, eval_pose3d
from snipper_tpu.infer.postprocess import postprocess
from snipper_tpu.utils.logger import MetricLogger

POSE3D_KEYS = ("mpjpe_root", "mpjpe_joint", "pel_mpjpe_joint", "3dpck")
PCKH_KEYS = ("pckh_root", "pckh_joint")


def _to_device_batch(batch: Dict) -> Dict:
    out = {"targets": batch["targets"]}
    for k in ("images", "raw_images", "warp_inv", "color_scale",
              "num_traj"):
        if k in batch:
            out[k] = batch[k]
    return out


def inject_window_num_traj(batches, k: int):
    """Attach each accumulation window's exact loss normalizer.

    The reference normalizes every trajectory loss by ``num_traj``
    all-reduced across its k DDP ranks (``models/model.py:521-526``):
    each rank divides by ``max(N_global / k, 1)``. With gradient
    accumulation standing in for the k ranks, the same normalizer must
    span the window's k microbatches — num_traj is a pure function of the
    targets, so it is computed here from a k-batch lookahead and attached
    as ``batch["num_traj"]`` (consumed by the criterion override,
    ``losses/criterion.py``). This makes ``--grad_accum_steps k``
    reproduce the k-rank DDP step exactly with heterogeneous per-batch
    person counts (previously microbatch-local, a small per-step
    weighting deviation).

    A trailing partial window (j < k batches) normalizes over its own j —
    those gradients are accumulated but dropped at exit anyway (see the
    train CLI's steps_per_epoch warning)."""
    buf = []

    def flush():
        total = sum(float(np.sum(np.asarray(b["targets"]["valid"],
                                            dtype=np.float32)))
                    for b in buf)
        norm = np.float32(max(total / len(buf), 1.0))
        for b in buf:
            yield dict(b, num_traj=norm)
        buf.clear()

    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield from flush()
    if buf:
        yield from flush()


def train_one_epoch(step_fn, state, loader, epoch: int, base_rng,
                    print_freq: int = 10, lr_fn=None,
                    put_batch=None, stop_flag=None,
                    max_steps: Optional[int] = None,
                    profile_dir: Optional[str] = None,
                    profile_steps: int = 3,
                    grad_accum_steps: int = 1) -> tuple:
    """``max_steps``: truncate the epoch after N steps (smoke runs; the
    full loader length is used when None).

    ``grad_accum_steps > 1``: attach each k-batch accumulation window's
    exact ``num_traj`` normalizer (:func:`inject_window_num_traj`) so the
    accumulated update reproduces the reference's k-rank DDP step.

    ``profile_dir``: capture a ``jax.profiler`` device trace of
    ``profile_steps`` steady-state steps (starting at step 2, after the
    compile step and one warm step) and print the top device ops by time
    (the reference has no profiler, SURVEY.md §5 — wall-clock only)."""
    logger = MetricLogger()
    profiling = False
    profiled = 0        # steps completed inside the trace window
    profile_start = 2   # skip the compile step and one warm step
    if profile_dir is not None:
        n_total = max_steps
        if n_total is None:
            try:
                n_total = len(loader)
            except TypeError:
                n_total = None
        if n_total is not None and n_total < profile_start + profile_steps:
            # short epoch: still produce a trace rather than silently none
            profile_start = max(n_total - profile_steps, 0)
            print(f"profile window clamped to start at step {profile_start} "
                  "(short epoch — the trace may include compile/warm steps)",
                  flush=True)

    def _finish_profile():
        nonlocal profiling
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            _print_trace_summary(profile_dir, profiled)

    header = f"Epoch: [{epoch}]"
    iterable = (_to_device_batch(b) for b in loader)
    if grad_accum_steps > 1:
        iterable = inject_window_num_traj(iterable, grad_accum_steps)
    if put_batch is not None:
        # double-buffered host->device feed: next batch transfers while the
        # current step runs (replaces torch pin_memory+non_blocking)
        from snipper_tpu.data.loader import device_prefetch

        iterable = device_prefetch(iterable, put_batch)
    for i, batch in enumerate(logger.log_every(iterable, print_freq,
                                               header)):
        if max_steps is not None and i >= max_steps:
            break
        if stop_flag is not None and stop_flag():
            print("preemption signal received — stopping epoch early",
                  flush=True)
            break
        if profile_dir is not None and i == profile_start and not profiling:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        rng = jax.random.fold_in(base_rng, epoch * 1_000_000 + i)
        dev_batch = batch
        state, metrics = step_fn(state, dev_batch, rng)
        # ONE host transfer for all ~15 scalar metrics: per-scalar float()
        # readbacks each pay a tunnel round-trip on PCIe/tunnel hosts
        metrics = jax.device_get(metrics)
        loss = float(metrics["loss_total"])
        if profiling:
            profiled += 1   # the device_get above synced this step
            if profiled >= profile_steps:
                _finish_profile()
        if not np.isfinite(loss):
            _finish_profile()  # keep the trace of the steps that blew up
            print(f"Loss is {loss}, stopping training", flush=True)
            print({k: float(v) for k, v in metrics.items()}, flush=True)
            sys.exit(1)
        if float(metrics.get("sampling_overflow", 0.0)) > 0:
            if float(metrics.get("sampling_exact_redo", 0.0)) > 0:
                # the step already recomputed the gradients in-graph with
                # the exact impl (make_train_step's lax.cond fallback) —
                # the applied update is exact; log and keep going
                print("sampling_overflow > 0: gradients recomputed "
                      "in-graph with the exact deform_impl='xla' branch "
                      "(windowed taps exceeded the margin)", flush=True)
            else:
                # windowed sampling dropped taps and this step has no
                # exact fallback: gradients are not exact — abort rather
                # than train on silently-corrupted gradients
                _finish_profile()
                print("sampling_overflow > 0: windowed sampling dropped "
                      "taps; retrain with deform_impl='xla' (exact)",
                      flush=True)
                sys.exit(1)
        logger.update(**{k: float(v) for k, v in metrics.items()})
        if lr_fn is not None:
            logger.update(lr=float(lr_fn(int(state.step))))
    _finish_profile()  # epoch ended before the window filled
    print("Averaged stats:", logger, flush=True)
    return state, {k: m.global_avg for k, m in logger.meters.items()}


def _print_trace_summary(profile_dir: str, n_iters: int):
    from snipper_tpu.utils.profiling import summarize_trace

    top = summarize_trace(profile_dir, top_k=10, n_iters=max(n_iters, 1))
    print(f"profile trace written to {profile_dir}", flush=True)
    for src, ms in top.items():
        print(f"  {ms:8.2f} ms/step  {src}", flush=True)


def _local_shard(x) -> np.ndarray:
    """This host's contiguous slice of a (possibly multi-host) global array
    whose leading axis is data-sharded. Single-process: the whole array.

    With a model (tp) axis, rows are REPLICATED across it, so each host's
    addressable shards contain tp copies of every batch row — dedup by the
    shard index, else downstream postprocess would see tp * local_B rows
    against local_B ``meta`` entries."""
    if jax.process_count() == 1:
        return np.asarray(x)
    unique = {}
    for s in x.addressable_shards:
        unique.setdefault(str(s.index), s)
    shards = sorted(unique.values(), key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def evaluate(eval_step_fn, params, loader, cfg: Config,
             print_freq: int = 10, collect_results: bool = False,
             put_batch=None, save_vis_dir: Optional[str] = None,
             save_vis_batches: int = 2) -> Dict:
    """``save_vis_dir``: when set, the first ``save_vis_batches`` batches
    get GT-vs-prediction keypoint renders written there (reference
    ``engine.py:132-135`` under ``save_vis``)."""
    logger = MetricLogger()
    T, Tf = cfg.num_frames, cfg.num_future_frames
    pose3d = {k: [] for k in POSE3D_KEYS}
    pose3d_future = {k: [] for k in POSE3D_KEYS}
    pckh = {k: [] for k in PCKH_KEYS}
    all_results = []
    batch_idx = -1

    for batch in logger.log_every(loader, print_freq, "Eval:"):
        batch_idx += 1
        dev_batch = _to_device_batch(batch)
        if put_batch is not None:
            dev_batch = put_batch(dev_batch)
        outputs, losses, src_idx = eval_step_fn(params, dev_batch)
        losses = jax.device_get(losses)  # one transfer for all scalars
        logger.update(**{k: float(v) for k, v in losses.items()})
        # postprocess only THIS host's shard of the global outputs —
        # batch["meta"] is host-local (the loader's per-process slice)
        outputs_np = {k: _local_shard(v) for k, v in outputs.items()
                      if k in ("pred_logits", "pred_kpts2d", "pred_depth")}
        results = postprocess(outputs_np, batch["meta"],
                              _local_shard(src_idx))
        if collect_results:
            all_results.extend(results)
        if save_vis_dir is not None and batch_idx < save_vis_batches:
            from snipper_tpu.infer.visualize import save_eval_keypoint_renders

            save_eval_keypoint_renders(
                results, np.asarray(batch["images"]), save_vis_dir,
                batch_idx=batch_idx)
        # 2D PCKh on posetrack-style samples (reference
        # eval_utils.py:96-175; observed frames only)
        for key in PCKH_KEYS:
            v = eval_kpts2d_pckh(key, results, 0, T)
            if v is not None and v.size:
                pckh[key].append(v)
        for key in POSE3D_KEYS:
            mkey = "pel_mpjpe_joint" if key == "3dpck" else key
            cur = eval_pose3d(mkey, results, 0, T)
            if key == "3dpck":
                pose3d[key].append((cur < 0.15).astype(np.float32))
            else:
                pose3d[key].append(cur)
            if Tf > 0:
                fut = eval_pose3d(mkey, results, T, T + Tf)
                if key == "3dpck":
                    pose3d_future[key].append((fut < 0.15).astype(np.float32))
                else:
                    pose3d_future[key].append(fut)

    # multi-host: merge per-host result lists and 3D pose error arrays
    # (replaces the reference's pickle-file rendezvous, main.py:291-322;
    # each host contributed a DISJOINT shard, so this is a true union)
    if jax.process_count() > 1:
        from snipper_tpu.parallel.multihost import (all_gather_objects,
                                                    merge_eval_results)

        if collect_results:
            all_results = merge_eval_results(all_results)
        for acc in (pose3d, pose3d_future, pckh):
            local = {k: (np.concatenate(v) if v else np.zeros((0,)))
                     for k, v in acc.items()}
            gathered = all_gather_objects(local)  # ONE collective per acc
            for k in acc:
                acc[k] = [chunk[k] for chunk in gathered]

    stats = {k: m.global_avg for k, m in logger.meters.items()}
    for name, acc in (("", pose3d), ("future_", pose3d_future), ("", pckh)):
        for k, chunks in acc.items():
            if not chunks:
                continue
            v = np.concatenate(chunks)
            if v.size:
                stats[f"{name}{k}"] = float(v.mean())
    if stats.get("sampling_overflow", 0.0) > 0:
        if stats.get("sampling_exact_redo", 0.0) > 0:
            # the eval step redid overflowed forwards in-graph with the
            # exact impl (make_eval_step exact_model) — metrics are exact
            print("windowed sampling overflowed on some eval batches; "
                  "forwards were redone in-graph with the exact impl "
                  f"(redo rate {stats['sampling_exact_redo']:.2f})",
                  flush=True)
        else:
            print("WARNING: windowed sampling dropped taps during eval "
                  f"(sampling_overflow avg "
                  f"{stats['sampling_overflow']:.1f}); metrics are inexact "
                  "— use an exact deform_impl (pmerged/xla) or a larger "
                  "sampling_margin for evaluation", flush=True)
    print("Eval stats:", {k: round(v, 4) for k, v in stats.items()
                          if not k.startswith("loss")}, flush=True)
    if collect_results:
        stats["_results"] = all_results
    return stats
