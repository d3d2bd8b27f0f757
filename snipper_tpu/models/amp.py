"""Mixed-precision helpers.

TPU inference/serving runs the network in bfloat16 (MXU-native); parameters
are stored f32 and cast once. Numerically sensitive pieces stay f32 inside
the modules themselves (attention softmax/logits, deformable sampling
accumulation, LayerNorm statistics — see ops/deform_attn.py and
models/transformer.py), so a blanket parameter cast is safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(params, dtype=jnp.bfloat16):
    """Cast floating-point leaves; integer/bool leaves untouched."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)


def bf16_inference_fn(model, params):
    """Returns (jitted_fn, bf16_params) for serving-style inference."""
    p16 = cast_params(params)

    def fwd(p, images, mask=None):
        return model.apply({"params": p}, images.astype(jnp.bfloat16), mask)

    return jax.jit(fwd), p16
