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


def test_windowed2d_pallas_matches_pmerged():
    """Round-3 Pallas 2D-window kernel (interpret mode on CPU): exact vs the
    XLA point-merged reference on encoder-style grid queries, overflow
    counted when taps leave the window."""
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.ops.deform_attn import ms_deform_attn_pmerged
    from snipper_tpu.ops.pallas_deform import ms_deform_attn_windowed2d_pallas

    shapes = [(24, 32), (12, 16), (6, 8)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(0)
    value = rng.standard_normal((1, s_tot, 2, 4)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    off = rng.uniform(-3.9, 3.9, (1, s_tot, 2, 3, 2, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = (ref[None, :, None, None, None, :]
           + off / norm[None, None, None, :, None, :]).astype(np.float32)
    attn = rng.uniform(0, 1, (1, s_tot, 2, 3, 2)).astype(np.float32)

    want = np.asarray(ms_deform_attn_pmerged(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    for bh, bw in ((6, 8), (5, 7)):
        got, ov = ms_deform_attn_windowed2d_pallas(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
            query_segments=sizes, block_h=bh, block_w=bw, margin_px=5)
        assert float(ov) == 0.0, (bh, bw)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5, err_msg=str((bh, bw)))

    # teleported tap -> overflow counted
    loc2 = loc.copy()
    loc2[0, 5, 0, 0, 0] = [0.97, 0.97]
    _, ov2 = ms_deform_attn_windowed2d_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc2), jnp.asarray(attn),
        query_segments=sizes, block_h=6, block_w=8, margin_px=5)
    assert float(ov2) > 0


def test_temporal_dispatch_pallas_is_differentiable():
    """impl="pallas" through temporal_deform_sample must match the exact
    pmerged forward AND propagate gradients (the trainable-kernel contract
    of the reference's MSDeformAttnFunction, ms_deform_attn_func.py:24-42)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.ops.deform_attn import (temporal_adjacency,
                                             temporal_deform_sample)

    shapes = [(6, 9), (3, 5)]
    S = sum(h * w for h, w in shapes)
    B, T1, LQ, NH, L, P, D = 1, 3, 11, 2, 2, 2, 4
    rng = np.random.default_rng(2)
    adj = temporal_adjacency(T1, T1)
    value = jnp.asarray(rng.standard_normal((B, T1, S, NH, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.05, 1.05, (B, T1, LQ, NH, L, P, 2)),
                      jnp.float32)
    logits = jnp.asarray(rng.standard_normal((B, T1, LQ, NH, L, P)),
                         jnp.float32)

    def run(impl):
        def f(v, lo, lg):
            out, _ = temporal_deform_sample(v, shapes, lo, lg, adj, impl=impl)
            return (out ** 2).sum(), out
        (loss, out), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(value, loc, logits)
        return loss, out, grads

    lp, op, gp = run("pallas")
    lr, orf, gr = run("pmerged")
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_grad_wrapper_bf16_inputs():
    """The custom-VJP backward must accept bf16 primals (the default
    mixed-precision train path): cotangents are cast to the primal dtype,
    not hard-coded f32 (regression for a review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.ops.deform_attn import ms_deform_attn_windowed_hybrid
    from snipper_tpu.ops.pallas_deform import ms_deform_attn_pallas_grad

    shapes = [(12, 16), (6, 8)]
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(4)
    value = jnp.asarray(rng.standard_normal((1, S, 2, 4)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0.2, 0.8, (1, 20, 2, 2, 2, 2)),
                      jnp.bfloat16)
    attn = jnp.asarray(rng.uniform(0, 1, (1, 20, 2, 2, 2)), jnp.bfloat16)

    g = jax.grad(lambda v: (ms_deform_attn_pallas_grad(
        v, shapes, loc, attn).astype(jnp.float32) ** 2).sum())(value)
    assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(
        g.astype(jnp.float32)).all())

    # same contract for the windowed hybrid (shared core_backward)
    grid = jnp.asarray(
        rng.uniform(0.2, 0.8, (1, S, 2, 2, 2, 2)), jnp.bfloat16)
    attn2 = jnp.asarray(rng.uniform(0, 1, (1, S, 2, 2, 2)), jnp.bfloat16)
    g2 = jax.grad(lambda v: (ms_deform_attn_windowed_hybrid(
        v, shapes, grid, attn2, [h * w for h, w in shapes])[0]
        .astype(jnp.float32) ** 2).sum())(value)
    assert g2.dtype == jnp.bfloat16 and bool(jnp.isfinite(
        g2.astype(jnp.float32)).all())


def test_pallas_grad_wrapper_matches_core_grads():
    """ms_deform_attn_pallas_grad: Pallas forward + custom-VJP backward
    must match the XLA core's value/location/weight gradients (the
    reference's kernel-vs-fallback gradcheck pattern, models/ops/test.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snipper_tpu.ops.deform_attn import ms_deform_attn_core
    from snipper_tpu.ops.pallas_deform import ms_deform_attn_pallas_grad

    shapes = [(12, 16), (6, 8)]
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((1, S, 2, 4)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (1, 20, 2, 2, 2, 2)),
                      jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (1, 20, 2, 2, 2)), jnp.float32)

    def loss(core):
        return jax.grad(
            lambda v, l, a: (core(v, shapes, l, a) ** 2).sum(),
            argnums=(0, 1, 2))

    out_p = ms_deform_attn_pallas_grad(value, shapes, loc, attn)
    out_c = ms_deform_attn_core(value, shapes, loc, attn)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)
    gp = loss(ms_deform_attn_pallas_grad)(value, loc, attn)
    gc = loss(ms_deform_attn_core)(value, loc, attn)
    for a, b in zip(gp, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
