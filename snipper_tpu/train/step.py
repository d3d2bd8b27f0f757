"""Jitted train / eval steps over a device mesh.

One XLA program per step: forward, device-side Hungarian matching, losses,
backward, global-norm clip, AdamW — with the batch sharded over the mesh's
``data`` axis. Gradient/metric combination across devices is inserted by XLA
(the TPU-native replacement for the reference's DDP all-reduce +
``reduce_dict``, reference ``engine.py:59,73``).

Global-batch loss semantics: the criterion sees the whole (global) batch, so
``num_traj`` is the global trajectory count — numerically equivalent to the
reference's ``all_reduce(num_traj)/world_size`` + DDP gradient averaging
(reference ``models/model.py:521-526``), up to its per-rank ``min=1`` clamp.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snipper_tpu.losses.criterion import SetCriterion
from snipper_tpu.train.state import TrainState, mask_frozen_grads


def make_train_step(
    model,
    criterion: SetCriterion,
    tx,
    donate: bool = True,
    mixed_precision: bool = True,
    exact_model=None,
) -> Callable:
    """Returns ``step(state, batch, rng) -> (state, metrics)``.

    No mesh parameter: shardings ride the ARGUMENTS — place the state with
    ``replicate(state, mesh)`` (or TP ``param_shardings``) and the batch
    with ``shard_batch(batch, mesh)``; jit propagates the placements and
    inserts the collectives.

    ``batch``: dict with ``images [B, T, H, W, 3]``, optional
    ``mask [B, T, H, W]``, and padded ``targets`` (kpts2d/depth/valid).

    With a gradient-accumulation optimizer (``cfg.grad_accum_steps > 1``,
    ``train/state.py::make_optimizer``), each call is one MICRObatch:
    params change only every k-th call, and the reported ``grad_norm`` /
    losses are the microbatch's own (pre-accumulation).

    ``mixed_precision``: run the network in bfloat16 (params cast inside the
    loss; f32 master weights, f32 losses/optimizer — the criterion computes
    in f32 regardless of activation dtype). ~1.8x faster than f32 on v5e at
    canonical scale (b2 ~1.6-1.9 s vs ~2.8 s with the save_sampling remat
    policy; BASELINE.md "Train-step impl findings — CORRECTED") with
    matching loss trajectories — the recommended production mode and the
    default. Pass ``mixed_precision=False`` for full-f32 numerics debugging.

    ``exact_model``: a second module built from
    ``cfg.replace(deform_impl="xla")`` sharing ``model``'s parameter tree.
    When given, the step guards windowed-sampling exactness IN-GRAPH: if
    the fast windowed gradients report ``sampling_overflow > 0`` (their
    exactness contract — reference
    ``models/ops/functions/ms_deform_attn_func.py:45-65``), a ``lax.cond``
    branch recomputes value+grads with the exact impl before the optimizer
    update, so the applied update is ALWAYS exact. The branch costs peak
    memory ``max`` (not sum) of the two graphs and runs only on overflow
    steps; ``metrics["sampling_exact_redo"]`` reports when it fired (the
    train engine logs it instead of aborting). Train-side analog of the
    inference margin cascade (``infer/pipeline.py::ExactnessGuard``), kept
    inside the ONE jitted XLA program per the architecture invariant.
    """

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        def make_loss_fn(mdl):
            def loss_fn(params):
                if "raw_images" in batch:
                    # device-side train preprocessing: warp + flip +
                    # color fused into this XLA program from raw uint8
                    # frames (host stays decode-only); exact host-path
                    # semantics (data/device_preprocess.py)
                    from snipper_tpu.data.device_preprocess import (
                        warp_train_batch_device)

                    base_images = warp_train_batch_device(
                        batch["raw_images"], batch["warp_inv"],
                        batch["color_scale"],
                        criterion.cfg.input_shape)
                else:
                    base_images = batch["images"]
                if mixed_precision:
                    p = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, params)
                    images = base_images.astype(jnp.bfloat16)
                else:
                    p, images = params, base_images
                out = mdl.apply({"params": p}, images,
                                batch.get("mask"), train=True,
                                rngs={"dropout": rng})
                # "num_traj" (optional): the accumulation window's exact
                # normalizer, precomputed from the k microbatch targets
                # (engine.py::inject_window_num_traj) — reproduces the
                # reference's all-reduced num_traj (models/model.py:521-526)
                total, losses, _ = criterion(out, batch["targets"],
                                             num_traj=batch.get("num_traj"))
                # windowed sampling drops out-of-window taps; surface the
                # count so training with a windowed impl can assert
                # exactness per step
                losses["sampling_overflow"] = jax.lax.stop_gradient(
                    out.get("sampling_overflow", jnp.zeros((), jnp.float32)))
                return total, losses
            return loss_fn

        (total, losses), grads = jax.value_and_grad(
            make_loss_fn(model), has_aux=True)(state.params)

        if exact_model is not None:
            overflow = losses["sampling_overflow"]

            def redo(_):
                (t2, l2), g2 = jax.value_and_grad(
                    make_loss_fn(exact_model), has_aux=True)(state.params)
                # keep the WINDOWED counter visible so the engine can log
                # that the fallback fired (the exact impl reports 0)
                l2 = dict(l2, sampling_overflow=overflow)
                return (t2, l2), g2

            def keep(_):
                return (total, losses), grads

            (total, losses), grads = jax.lax.cond(
                overflow > 0, redo, keep, None)
            losses = dict(losses,
                          sampling_exact_redo=(overflow > 0)
                          .astype(jnp.float32))
        # frozen params are requires_grad=False in the reference, so its
        # global-norm clip and logged grad norm never include them
        grads = mask_frozen_grads(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss_total": total,
                   "grad_norm": optax.global_norm(grads), **losses}
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    # With a mesh, shardings are carried by the arguments themselves: place
    # the state with ``replicate(state, mesh)`` (or TP param_shardings) and
    # the batch with ``shard_batch(batch, mesh)``; jit propagates them and
    # inserts the cross-device collectives.
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch with its leading axis sharded over ``data``.

    Single-process: a plain ``device_put``. Multi-process (real multi-host
    TPU): each host holds only its per-process batch shard (the loader's
    DistributedSampler-style slice), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the leading axis of the
    GLOBAL batch is ``process_count *`` the local leading axis."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def spec(x):
        # scalar leaves (e.g. the accumulation-window "num_traj"
        # normalizer) have no batch axis — replicate them
        return repl if jnp.ndim(x) == 0 else data

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if jnp.ndim(x) == 0
        else jax.make_array_from_process_local_data(data, x), batch)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)


def make_eval_step(model, criterion: SetCriterion,
                   exact_model=None) -> Callable:
    """Forward + criterion (for losses and match indices, reference
    ``engine.py:117-129``) without gradient.

    ``exact_model``: as in :func:`make_train_step` — when the windowed
    forward drops taps (``sampling_overflow > 0``), a ``lax.cond`` branch
    redoes the forward with the exact impl so eval predictions are never
    inexact."""

    def forward(mdl, params, batch):
        out = mdl.apply({"params": params}, batch["images"],
                        batch.get("mask"))
        total, losses, src_idx = criterion(out, batch["targets"])
        # surface the windowed-sampling dropped-tap counter (as in the
        # train step) so evaluate() can warn on inexact eval forwards
        losses["sampling_overflow"] = out.get(
            "sampling_overflow", jnp.zeros((), jnp.float32))
        return out, {"loss_total": total, **losses}, src_idx

    def step(params, batch):
        out, metrics, src_idx = forward(model, params, batch)
        if exact_model is not None:
            overflow = metrics["sampling_overflow"]

            def redo(_):
                o2, m2, s2 = forward(exact_model, params, batch)
                return o2, dict(m2, sampling_overflow=overflow), s2

            out, metrics, src_idx = jax.lax.cond(
                overflow > 0, redo,
                lambda _: (out, metrics, src_idx), None)
            metrics = dict(metrics,
                           sampling_exact_redo=(overflow > 0)
                           .astype(jnp.float32))
        return out, metrics, src_idx

    return jax.jit(step)
