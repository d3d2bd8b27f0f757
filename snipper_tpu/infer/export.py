"""Serving export: serialize the jitted forward as a StableHLO artifact.

TPU-native capability with no reference counterpart (the reference serves
by loading the full PyTorch codebase + checkpoint, ``inference.py:129-135``):
``jax.export`` lowers the model forward — parameters baked in as constants —
to a versioned, self-contained StableHLO module that a serving process can
deserialize and run WITHOUT the model code, flax, or the checkpoint file.
Cross-platform lowering means a CPU host can produce a TPU artifact.

The exported function maps ``images [B, T, H, W, 3] float32 in [0, 1]`` to
the postprocess-ready output dict (``pred_logits``, ``pred_kpts2d``,
``pred_depth``, ``heatmaps``, ``sampling_overflow``). Auxiliary decoder-layer
outputs (a train-time concept) are dropped from the artifact.

Exactness note: the default export uses the always-exact ``pmerged``
sampling path — a static serving artifact cannot re-compile a wider window
the way the live ``ExactnessGuard`` margin cascade does, so the windowed
fast path is opt-in; when chosen, the artifact's ``sampling_overflow``
output MUST be checked nonzero-free by the server on every call (contract
of reference ``models/ops/functions/ms_deform_attn_func.py:45-65``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def export_forward(cfg, params, batch_size: int = 1,
                   platforms: Optional[Sequence[str]] = None):
    """Lower the forward to a :class:`jax.export.Exported` with ``params``
    embedded as constants.

    ``platforms``: target platform list (e.g. ``["tpu"]``, ``["cpu", "tpu"]``)
    — defaults to the current backend.
    """
    import jax
    import jax.numpy as jnp

    from snipper_tpu.models.snipper import build_model

    model = build_model(cfg)  # params are provided; no init pass needed

    def fwd(images):
        out = model.apply({"params": params}, images)
        # per-decoder-layer aux heads and reference-point traces are
        # train/debug-time concepts (the reference's aux_outputs,
        # models/model.py:209-221); the serving artifact carries only what
        # PostProcess consumes (+ heatmaps for overlays, + the exactness
        # counter)
        drop = ("aux_logits", "aux_kpts2d", "aux_depth", "init_reference",
                "references", "attn_data")
        return {k: v for k, v in out.items() if k not in drop}

    spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.num_frames, cfg.input_height, cfg.input_width, 3),
        jnp.float32)
    return jax.export.export(jax.jit(fwd),
                             platforms=platforms)(spec)


def save_exported(exported, path: str) -> int:
    """Serialize to ``path``; returns the artifact size in bytes."""
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str, jit_call: bool = True):
    """Deserialize an artifact; returns a callable
    ``run(images) -> output dict`` (wraps ``Exported.call``).

    ``jit_call=True`` (default) wraps the call in ``jax.jit`` — the serving
    deployment shape. Calling ``Exported.call`` eagerly re-dispatches the
    module through the interpreter on every request; measured on v5e
    (scripts/probe.py serve) the eager path is ~6x slower than the jitted
    one, which runs at live-``jax.jit`` speed."""
    import jax

    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))

    call = jax.jit(exported.call) if jit_call else exported.call

    def run(images):
        if not isinstance(images, jax.Array):  # keep device arrays on device
            images = np.asarray(images, np.float32)
        return call(images)

    run.exported = exported
    return run
