"""Pallas weighted-one-hot sampling kernel vs the XLA core (interpret mode
on CPU; the same comparison was verified compiled on TPU — BASELINE.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from snipper_tpu.ops.deform_attn import ms_deform_attn_core
from snipper_tpu.ops.pallas_deform import ms_deform_attn_pallas

SHAPES = [(6, 9), (3, 5), (2, 2)]
S = sum(h * w for h, w in SHAPES)


def test_pallas_matches_xla_core():
    rng = np.random.default_rng(0)
    B, NH, D, LQ, P, L = 2, 4, 8, 37, 3, 3
    v = jnp.asarray(rng.standard_normal((B, S, NH, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, LQ, NH, L, P, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (B, LQ, NH, L, P)), jnp.float32)
    a = np.asarray(ms_deform_attn_core(v, SHAPES, loc, w))
    b = np.asarray(ms_deform_attn_pallas(v, SHAPES, loc, w))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pallas_large_level_above_old_cap():
    """Levels above the old 8192-px cap are now accepted (VMEM-bounded cap;
    regression for the round-1 NotImplementedError at canonical-ish sizes)."""
    shapes = [(96, 97)]  # 9312 px > 8192
    s = shapes[0][0] * shapes[0][1]
    rng = np.random.default_rng(1)
    B, NH, D, LQ, P = 1, 2, 8, 13, 2
    v = jnp.asarray(rng.standard_normal((B, s, NH, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (B, LQ, NH, 1, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (B, LQ, NH, 1, P)), jnp.float32)
    a = np.asarray(ms_deform_attn_core(v, shapes, loc, w))
    b = np.asarray(ms_deform_attn_pallas(v, shapes, loc, w))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
