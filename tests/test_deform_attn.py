"""Parity tests for the deformable-attention sampling core.

Mirrors the role of the reference's op unit test (``models/ops/test.py``):
forward parity against an independent oracle + gradient checks. The oracle
here is torch.nn.functional.grid_sample (CPU), the same primitive the
reference's fallback is built on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snipper_tpu.ops.deform_attn import (
    ms_deform_attn_core,
    temporal_adjacency,
    temporal_deform_sample,
)

SHAPES = [(6, 9), (3, 5), (2, 2)]  # (h, w) per level
B, NH, D, LQ, P = 2, 4, 8, 7, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _torch_oracle(value, locs, attn):
    """Independent grid_sample-based computation of MSDA."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)        # [B, S, H, D]
    locs = torch.from_numpy(locs)          # [B, Lq, H, L, P, 2]
    attn = torch.from_numpy(attn)          # [B, Lq, H, L, P]
    out = torch.zeros(B, LQ, NH, D)
    start = 0
    for lvl, (h, w) in enumerate(SHAPES):
        v = value[:, start:start + h * w]  # [B, hw, H, D]
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(B * NH, D, h, w)
        grid = 2.0 * locs[:, :, :, lvl] - 1.0          # [B, Lq, H, P, 2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * NH, LQ, P, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, NH, D, LQ, P)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3)     # [B, H, Lq, P]
        out += torch.einsum("bhdqp,bhqp->bqhd", sampled, a)
    return out.reshape(B, LQ, NH * D).numpy()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    value = _rand(rng, B, S, NH, D)
    # locations mostly inside [0,1], some outside to hit zero-padding
    locs = rng.uniform(-0.2, 1.2, size=(B, LQ, NH, L, P, 2)).astype(np.float32)
    logits = _rand(rng, B, LQ, NH, L, P)
    attn = jax.nn.softmax(jnp.asarray(logits).reshape(B, LQ, NH, L * P), -1)
    attn = np.asarray(attn).reshape(B, LQ, NH, L, P)
    return value, locs, attn


def test_forward_matches_grid_sample_oracle(data):
    value, locs, attn = data
    got = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)))
    want = _torch_oracle(value, locs, attn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_exact_corner_cases():
    """Sampling exactly at pixel centers returns the pixel value."""
    h, w = 4, 6
    value = np.arange(h * w, dtype=np.float32).reshape(1, h * w, 1, 1)
    # pixel (row=2, col=3) center: x = (3 + 0.5)/w, y = (2 + 0.5)/h
    loc = np.array([(3 + 0.5) / w, (2 + 0.5) / h], np.float32)
    locs = loc.reshape(1, 1, 1, 1, 1, 2)
    attn = np.ones((1, 1, 1, 1, 1), np.float32)
    out = ms_deform_attn_core(jnp.asarray(value), [(h, w)],
                              jnp.asarray(locs), jnp.asarray(attn))
    assert np.allclose(np.asarray(out)[0, 0, 0], 2 * w + 3)


def test_forward_zero_outside():
    """Locations far outside the map contribute exactly zero."""
    h, w = 4, 4
    value = np.ones((1, h * w, 1, 1), np.float32)
    locs = np.full((1, 1, 1, 1, 1, 2), 7.5, np.float32)
    attn = np.ones((1, 1, 1, 1, 1), np.float32)
    out = ms_deform_attn_core(jnp.asarray(value), [(h, w)],
                              jnp.asarray(locs), jnp.asarray(attn))
    assert np.allclose(np.asarray(out), 0.0)


def test_gradients_match_torch(data):
    """Grad parity w.r.t. value, locations and weights against the torch
    oracle (the reference checks its CUDA op with gradcheck; here we diff two
    independent implementations)."""
    import torch
    import torch.nn.functional as F

    value, locs, attn = data

    def jax_loss(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_core(v, SHAPES, l, a)))

    gv, gl, ga = jax.grad(jax_loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)

    out = torch.zeros(B, LQ, NH, D, dtype=torch.float64)
    start = 0
    for lvl, (h, w) in enumerate(SHAPES):
        v = tv[:, start:start + h * w]
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(B * NH, D, h, w)
        grid = 2.0 * tl[:, :, :, lvl] - 1.0
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * NH, LQ, P, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, NH, D, LQ, P)
        a = ta[:, :, :, lvl].permute(0, 2, 1, 3)
        out = out + torch.einsum("bhdqp,bhqp->bqhd", sampled.double(), a.double())
    torch.sin(out.reshape(B, LQ, NH * D)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-4)
    # grid_sample's location grad is zero at exact integer boundaries in a way
    # that can differ by corner tie-breaks; compare with a loose tolerance.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_temporal_adjacency_pattern():
    adj = temporal_adjacency(4, 6)
    want = np.array([
        [1, 1, 0, 0],
        [1, 1, 1, 0],
        [0, 1, 1, 1],
        [0, 0, 1, 1],
        [1, 1, 1, 1],
        [1, 1, 1, 1],
    ], np.float32)
    np.testing.assert_array_equal(adj, want)


def test_temporal_fused_equals_per_frame_loop():
    """The value-aggregation trick must equal the reference's per-frame loop
    (stack identical logits per sampled frame, softmax over (L,P,frames),
    sample each frame separately, sum)."""
    rng = np.random.default_rng(1)
    T2, T1 = 3, 5  # 3 observed, 2 future
    value = _rand(rng, B, T2, S, NH, D)
    locs = rng.uniform(0, 1, size=(B, T1, LQ, NH, L, P, 2)).astype(np.float32)
    logits = _rand(rng, B, T1, LQ, NH, L, P)
    adj = temporal_adjacency(T2, T1)

    fused, overflow = temporal_deform_sample(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(logits),
        jnp.asarray(adj))
    fused = np.asarray(fused)
    assert float(overflow) == 0.0

    # reference-style loop
    want = np.zeros((B, T1, LQ, NH * D), np.float32)
    for t1 in range(T1):
        frames = [t2 for t2 in range(T2) if adj[t1, t2] > 0]
        n = len(frames)
        lg = np.repeat(logits[:, t1].reshape(B, LQ, NH, L * P, 1), n, axis=-1)
        w = jax.nn.softmax(jnp.asarray(lg).reshape(B, LQ, NH, -1), -1)
        w = np.asarray(w).reshape(B, LQ, NH, L, P, n)
        for k, t2 in enumerate(frames):
            got = ms_deform_attn_core(
                jnp.asarray(value[:, t2]), SHAPES,
                jnp.asarray(locs[:, t1]), jnp.asarray(w[..., k]))
            want[:, t1] += np.asarray(got)

    np.testing.assert_allclose(fused, want, rtol=1e-4, atol=1e-5)


def test_pmerged_matches_core_fwd_and_grads():
    """Round-2 point-merged one-hot == round-1 core, incl. out-of-bounds
    taps, chunking, and gradients."""
    from snipper_tpu.ops.deform_attn import ms_deform_attn_pmerged

    rng = np.random.default_rng(7)
    value = _rand(rng, B, S, NH, D)
    locs = rng.uniform(-0.3, 1.3, (B, LQ, NH, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, LQ, NH, L, P)).astype(np.float32)
    want = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)))
    for qc in (None, 3):
        got = np.asarray(ms_deform_attn_pmerged(
            jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn),
            query_chunk=qc))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def f(core):
        def loss(v, lo, at):
            return (core(v, SHAPES, lo, at, query_chunk=3) ** 2).sum()
        return jax.grad(loss, argnums=(0, 1, 2))

    from snipper_tpu.ops.deform_attn import ms_deform_attn_pmerged as pm
    ga = f(ms_deform_attn_core)(jnp.asarray(value), jnp.asarray(locs),
                                jnp.asarray(attn))
    gb = f(pm)(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    for a_, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_windowed_exact_on_grid_queries_and_overflow_counted():
    """Windowed sampling: zero overflow + exact outputs for grid-local
    queries; dropped taps are counted when locations leave the window."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_pmerged,
                                             ms_deform_attn_windowed)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(8)
    value = rng.standard_normal((1, s_tot, 2, 4)).astype(np.float32)
    # encoder-style queries: the level-concatenated grid + small offsets
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)                      # [S, 2]
    loc = (ref[None, :, None, None, None, :]
           + rng.uniform(-0.01, 0.01,
                         (1, s_tot, 2, 3, 2, 2))).astype(np.float32)
    attn = rng.uniform(0, 1, (1, s_tot, 2, 3, 2)).astype(np.float32)

    want = np.asarray(ms_deform_attn_pmerged(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    got, ov = ms_deform_attn_windowed(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        query_segments=sizes)
    assert float(ov) == 0.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # teleport one tap far away: overflow must be counted (the plan keeps a
    # window only at level 0 here — 4800 px vs a ~2432 window)
    loc2 = loc.copy()
    loc2[0, 5, 0, 0, 0] = [0.99, 0.99]
    _, ov2 = ms_deform_attn_windowed(
        jnp.asarray(value), shapes, jnp.asarray(loc2), jnp.asarray(attn),
        query_segments=sizes)
    assert float(ov2) > 0


def test_windowed_hybrid_forward_and_grads_match_core():
    """impl="windowed_hybrid" (windowed forward + exact-core custom-VJP
    backward, the train split): outputs match the windowed forward, ALL
    input gradients match the core's, and overflow is still counted."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_windowed,
                                             ms_deform_attn_windowed_hybrid)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(9)
    value = jnp.asarray(rng.standard_normal((1, s_tot, 2, 4)), jnp.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    loc = jnp.asarray(ref[None, :, None, None, None, :]
                      + rng.uniform(-0.01, 0.01, (1, s_tot, 2, 3, 2, 2)),
                      jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (1, s_tot, 2, 3, 2)), jnp.float32)

    got, ov = ms_deform_attn_windowed_hybrid(value, shapes, loc, attn, sizes)
    want, ov_w = ms_deform_attn_windowed(value, shapes, loc, attn,
                                         query_segments=sizes)
    assert float(ov) == 0.0 and float(ov_w) == 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # fixed cotangent: the hybrid's VJP must equal the core's exactly
    # (both are the core VJP at the same primals)
    g_out = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)
    _, vjp_h = jax.vjp(
        lambda v, l, a: ms_deform_attn_windowed_hybrid(
            v, shapes, l, a, sizes)[0], value, loc, attn)
    _, vjp_c = jax.vjp(
        lambda v, l, a: ms_deform_attn_core(v, shapes, l, a),
        value, loc, attn)
    for a, b in zip(vjp_h(g_out), vjp_c(g_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # overflow still counted through the custom-VJP wrapper
    loc2 = np.asarray(loc).copy()
    loc2[0, 5, 0, 0, 0] = [0.99, 0.99]
    _, ov2 = ms_deform_attn_windowed_hybrid(value, shapes,
                                            jnp.asarray(loc2), attn, sizes)
    assert float(ov2) > 0


def test_windowed_vjp_forward_and_grads_match_core():
    """impl="windowed_vjp" (windowed forward + WINDOWED custom-VJP
    backward, the round-4 train split): outputs match the windowed
    forward, ALL input gradients match the core's (exact whenever
    overflow == 0), overflow is still counted, and both remat settings
    agree — the backward's hand-managed window accumulation and
    bitwise-rederived window starts are what this guards."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_windowed,
                                             ms_deform_attn_windowed_vjp)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(11)
    value = jnp.asarray(rng.standard_normal((2, s_tot, 2, 4)), jnp.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    # offsets up to ~6 px at level 0 — inside the margin-8 window but big
    # enough that taps land near window edges (catches any forward/backward
    # window-start drift, which would silently zero edge-tap gradients)
    loc = jnp.asarray(ref[None, :, None, None, None, :]
                      + rng.uniform(-0.07, 0.07, (2, s_tot, 2, 3, 2, 2)),
                      jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (2, s_tot, 2, 3, 2)), jnp.float32)

    got, ov = ms_deform_attn_windowed_vjp(value, shapes, loc, attn, sizes)
    want, ov_w = ms_deform_attn_windowed(value, shapes, loc, attn,
                                         query_segments=sizes)
    assert float(ov) == 0.0 and float(ov_w) == 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g_out = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)
    _, vjp_c = jax.vjp(
        lambda v, l, a: ms_deform_attn_core(v, shapes, l, a),
        value, loc, attn)
    want_grads = vjp_c(g_out)
    for remat in (True, False):
        _, vjp_w = jax.vjp(
            lambda v, l, a: ms_deform_attn_windowed_vjp(
                v, shapes, l, a, sizes, remat_chunk=remat)[0],
            value, loc, attn)
        for name, a, b in zip(("d_value", "d_loc", "d_attn"),
                              vjp_w(g_out), want_grads):
            # windowed-width dots reassociate the f32 sums the full-width
            # core does in one pass: same math, ~1e-5 roundoff scatter
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5,
                err_msg=f"{name} (remat={remat})")

    # overflow still counted through the custom-VJP wrapper
    loc2 = np.asarray(loc).copy()
    loc2[0, 5, 0, 0, 0] = [0.99, 0.99]
    _, ov2 = ms_deform_attn_windowed_vjp(value, shapes,
                                         jnp.asarray(loc2), attn, sizes)
    assert float(ov2) > 0

    # bf16 values (the mixed-precision train path): runs, finite, and
    # tracks the f32 gradients to bf16 resolution
    vb = value.astype(jnp.bfloat16)
    _, vjp_b = jax.vjp(
        lambda v, l, a: ms_deform_attn_windowed_vjp(
            v, shapes, l, a, sizes)[0], vb, loc, attn)
    db_v, db_l, db_a = vjp_b(g_out.astype(jnp.bfloat16))
    assert db_v.dtype == jnp.bfloat16
    for a, b in zip((db_v, db_l, db_a), want_grads):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(b).max()))
        assert np.max(np.abs(a - b)) / denom < 0.05


def test_windowed_plan_covers_worst_case_chunk_spans():
    """Plan invariant (regression for the chunk-floor bug): for EVERY query
    segment, each tap-level window must cover that segment's worst-case
    chunk span plus the margin rows — including small segments whose
    64-query chunk floor spans more tap-level pixels than base_chunk does
    at level 0."""
    from snipper_tpu.ops.deform_attn import windowed_sampling_plan

    for shapes in ([(75, 100), (38, 50), (19, 25)],
                   [(68, 120), (34, 60), (17, 30)],
                   [(60, 80), (30, 40), (15, 20)]):
        for bc in (1024, 512, 384, 256):
            for margin in (8, 6):
                sizes, qcs, wins = windowed_sampling_plan(shapes, bc, margin)
                assert len(wins) == len(sizes)
                for seg, (qc, seg_wins) in enumerate(zip(qcs, wins)):
                    for (h, w), st, ws in zip(shapes, sizes, seg_wins):
                        if ws == 0:
                            continue  # full width: always exact
                        # worst-case flat span of a qc-query chunk of this
                        # segment at tap level t: chunk span scaled by the
                        # area ratio, + margin rows each side, + 1 row for
                        # the +1 bilinear corner, + 8 for the aligned start
                        span = -(-qc * st // sizes[seg])
                        need = span + (2 * margin + 1) * w + 8
                        assert ws >= min(need, st), (
                            shapes, bc, margin, seg, (h, w), ws, need)


def test_windowed_small_segment_chunk_floor_exact():
    """End-to-end regression: margin-sized offsets on SMALL-segment queries
    (where the 64-query chunk floor bites) must not overflow or deviate."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_pmerged,
                                             ms_deform_attn_windowed)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(3)
    value = rng.standard_normal((1, s_tot, 2, 4)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    # offsets up to ~6.9 px at each TAP level (margin 8 must absorb them)
    off_px = rng.uniform(-6.9, 6.9, (1, s_tot, 2, 3, 2, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = (ref[None, :, None, None, None, :]
           + off_px / norm[None, None, None, :, None, :]).astype(np.float32)
    attn = rng.uniform(0, 1, (1, s_tot, 2, 3, 2)).astype(np.float32)

    want = np.asarray(ms_deform_attn_pmerged(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    for bc in (512, 256):
        got, ov = ms_deform_attn_windowed(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
            query_segments=sizes, base_chunk=bc)
        assert float(ov) == 0.0, bc
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)


def test_windowed2d_exact_on_grid_queries_and_overflow_counted():
    """2D-windowed sampling (rectangular query blocks + rectangular
    contraction windows): zero overflow + exact outputs for grid-local
    queries; dropped taps counted when a location leaves its window."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_pmerged,
                                             ms_deform_attn_windowed2d)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(8)
    value = rng.standard_normal((1, s_tot, 2, 4)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    loc = (ref[None, :, None, None, None, :]
           + rng.uniform(-0.01, 0.01,
                         (1, s_tot, 2, 3, 2, 2))).astype(np.float32)
    attn = rng.uniform(0, 1, (1, s_tot, 2, 3, 2)).astype(np.float32)

    want = np.asarray(ms_deform_attn_pmerged(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    for bh, bw in ((8, 20), (5, 10), (15, 16)):
        got, ov = ms_deform_attn_windowed2d(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
            query_segments=sizes, block_h=bh, block_w=bw)
        assert float(ov) == 0.0, (bh, bw)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5, err_msg=str((bh, bw)))

    # teleport one level-0 tap across the map: counted as overflow
    loc2 = loc.copy()
    loc2[0, 5, 0, 0, 0] = [0.99, 0.99]
    _, ov2 = ms_deform_attn_windowed2d(
        jnp.asarray(value), shapes, jnp.asarray(loc2), jnp.asarray(attn),
        query_segments=sizes)
    assert float(ov2) > 0


def test_windowed2d_margin_offsets_exact():
    """Offsets up to ~(margin-1) px at every tap level stay inside the 2D
    windows for every block shape — including the ragged-edge padded
    blocks — and reproduce the exact path."""
    from snipper_tpu.ops.deform_attn import (ms_deform_attn_pmerged,
                                             ms_deform_attn_windowed2d)

    shapes = [(60, 80), (30, 40), (15, 20)]
    sizes = [h * w for h, w in shapes]
    s_tot = sum(sizes)
    rng = np.random.default_rng(3)
    value = rng.standard_normal((1, s_tot, 2, 4)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    off_px = rng.uniform(-6.9, 6.9, (1, s_tot, 2, 3, 2, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = (ref[None, :, None, None, None, :]
           + off_px / norm[None, None, None, :, None, :]).astype(np.float32)
    attn = rng.uniform(0, 1, (1, s_tot, 2, 3, 2)).astype(np.float32)

    want = np.asarray(ms_deform_attn_pmerged(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    # block 7x13 exercises ragged edges (60%7, 80%13 != 0)
    for bh, bw in ((8, 20), (7, 13)):
        got, ov = ms_deform_attn_windowed2d(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
            query_segments=sizes, block_h=bh, block_w=bw, margin_px=8)
        assert float(ov) == 0.0, (bh, bw)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5, err_msg=str((bh, bw)))


def test_windowed2d_plan_covers_worst_case_block_spans():
    """2D plan invariant (mirror of the 1D chunk-floor test): for EVERY
    query segment, each tap-level window rectangle must cover that
    segment's worst-case block span plus the margin and the +1 bilinear
    corner on each axis."""
    from snipper_tpu.ops.deform_attn import windowed2d_plan

    for shapes in ([(75, 100), (38, 50), (19, 25)],
                   [(68, 120), (34, 60), (17, 30)],
                   [(60, 80), (30, 40), (15, 20)]):
        for bh0, bw0 in ((8, 20), (15, 20), (5, 10), (7, 13)):
            for margin in (5, 8):
                blocks, wins = windowed2d_plan(shapes, bh0, bw0, margin)
                for seg, ((bh, bw), seg_wins) in enumerate(zip(blocks,
                                                               wins)):
                    hs, ws_ = shapes[seg]
                    for (ht, wt), (wy, wx) in zip(shapes, seg_wins):
                        if wy == 0:
                            continue  # full level: always exact
                        span_y = -(-bh * ht // hs)
                        span_x = -(-bw * wt // ws_)
                        assert wy >= min(span_y + 2 * margin + 2, ht), (
                            shapes, (bh0, bw0), margin, seg, (ht, wt),
                            (wy, wx))
                        assert wx >= min(span_x + 2 * margin + 2, wt), (
                            shapes, (bh0, bw0), margin, seg, (ht, wt),
                            (wy, wx))
