"""Optimizer (3 learning-rate groups + global clip) and train state.

Mirrors reference ``main.py:201-222``: AdamW with
- backbone params at ``lr_backbone`` (1e-5),
- ``reference_points`` / ``sampling_offsets`` projections at ``lr * 0.1``,
- everything else at ``lr``,
global-norm gradient clipping at 0.1 (reference ``engine.py:74-76``), and a
StepLR drop of 10x at ``lr_drop`` epochs (``main.py:222``). Additionally the
frozen set (FrozenBN buffers, conv1/layer1 — reference
``models/backbone.py:71-73``) receives zero updates.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from snipper_tpu.config import Config


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def param_label(path) -> str:
    """Label a parameter path: frozen | backbone | proj | main."""
    names = [getattr(p, "key", str(p)) for p in path]
    if names and names[0] == "backbone":
        # FrozenBN buffers are never trained; neither are the stem
        # (conv1/bn1) or layer1 (reference backbone.py:71-73 with
        # train_backbone=True)
        if any(n.startswith("bn") or n == "downsample_bn" for n in names):
            return "frozen"
        if len(names) > 1 and (names[1] in ("conv1", "bn1")
                               or names[1].startswith("layer1_")):
            return "frozen"
        return "backbone"
    if any(n in ("sampling_offsets", "reference_points") for n in names):
        return "proj"
    return "main"


def mask_frozen_grads(grads):
    """Zero the frozen group's gradients BEFORE clipping/metrics.

    The reference's frozen params (stem/layer1, FrozenBN buffers) have
    ``requires_grad=False``, so torch's ``clip_grad_norm_``
    (reference ``engine.py:74-76``) never sees them; here autodiff produces
    real gradients for every leaf, and including them in the global norm
    would silently over-clip every trainable update (and inflate the
    reported grad_norm)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g: jnp.zeros_like(g)
        if param_label(path) == "frozen" else g, grads)


def step_lr(base_lr: float, lr_drop_epochs: int, steps_per_epoch: int,
            gamma: float = 0.1) -> Callable:
    """StepLR as a per-step schedule."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // lr_drop_epochs)

    return sched


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000):
    """AdamW with the reference's 3 LR groups + global clip; optionally
    wrapped in gradient accumulation.

    ``cfg.grad_accum_steps > 1`` averages gradients over k microbatches and
    applies ONE optimizer update (``optax.MultiSteps``) — numerically the
    reference's k-rank DDP step (per-rank grads averaged, then clip+AdamW),
    so ``batch_size=2, grad_accum_steps=8`` on one chip reproduces the
    canonical 2x8-GPU recipe (reference README.md:67, main.py:184). The
    ``num_traj`` loss normalizer matches exactly too when the train loop
    injects the window's precomputed normalizer
    (``train/engine.py::inject_window_num_traj`` — the TPU analog of the
    reference's cross-rank all_reduce, models/model.py:521-526; the train
    CLI wires it automatically); without injection it falls back to
    microbatch-local. The heatmap loss's per-rank-sum + grad-average
    semantics match either way. ``steps_per_epoch`` counts MICRObatches
    (loader steps); the LR schedule steps per optimizer update."""
    accum = max(cfg.grad_accum_steps, 1)
    sched_steps = max(-(-steps_per_epoch // accum), 1)

    def adamw(lr_fn):
        return optax.adamw(lr_fn, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=cfg.weight_decay)

    group_tx = {
        "frozen": optax.set_to_zero(),
        "backbone": adamw(step_lr(cfg.lr_backbone, cfg.lr_drop,
                                  sched_steps)),
        "proj": adamw(step_lr(cfg.lr * cfg.lr_linear_proj_mult, cfg.lr_drop,
                              sched_steps)),
        "main": adamw(step_lr(cfg.lr, cfg.lr_drop, sched_steps)),
    }

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: param_label(path), params)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.multi_transform(group_tx, labels),
    )
    if accum > 1:
        # the clip sees the AVERAGED accumulated gradient on the k-th
        # microstep, exactly as torch's clip_grad_norm_ sees the
        # DDP-averaged gradient (reference engine.py:74-76)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(cfg: Config, params,
                       steps_per_epoch: int = 1000) -> tuple:
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    return state, tx
