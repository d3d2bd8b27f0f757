"""Multi-scale (temporal) deformable attention sampling — pure-XLA path.

This is the TPU-native equivalent of the reference's single native component,
the CUDA multi-scale deformable attention op (reference
``models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299`` forward,
``ms_deform_attn_cuda.cu:83-153`` backward) and its PyTorch fallback
(``models/ops/functions/ms_deform_attn_func.py:45-65``).

Numerics follow ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)`` exactly: a normalized location
``u in [0, 1]`` maps to the continuous pixel coordinate ``u * W - 0.5``; the
four surrounding integer taps are bilinearly blended and taps outside the
feature map contribute zero.

Design notes (TPU-first):

- Feature levels have *static* shapes, so the per-level loop is a Python loop
  unrolled at trace time; XLA sees only fixed-shape gathers.
- The gather is expressed along the flattened-pixel (major) axis with the
  channel dim minor, which XLA lowers to efficient dynamic-slice DMA on TPU.
- The temporal neighbor structure of the reference
  (``models/ops/modules/ms_deform_attn.py:137-223``: observed query frames
  sample frames ``t±1``; future query frames sample all observed frames) is
  folded into a **value pre-aggregation**: because the reference instantiates
  one shared offset/weight Linear for all frames
  (``models/ops/modules/ms_deform_attn.py:68-71`` — the *same* module object
  repeated in the ModuleList), sampling locations and attention weights are
  identical for every sampled frame, and by linearity of the sampling op

      sum_t2 MSDA(value[t2], loc, w)  ==  MSDA(sum_t2 value[t2], loc, w).

  So we sum neighbor-frame values once (an einsum with a static 0/1
  adjacency) and sample once per query frame — ~3x fewer gathers than the
  reference's per-frame loop, with bit-identical math (up to fp reassociation).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_attn_core(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_chunk: int | None = None,
    onehot_max_s: int = 8192,
) -> jax.Array:
    """Multi-scale deformable sampling + weighted aggregation.

    Args:
      value: ``[B, S, H, D]`` where ``S = sum_l h_l * w_l`` flattened pixels
        of all levels, ``H`` heads, ``D`` channels per head.
      spatial_shapes: static list of ``(h_l, w_l)`` per level.
      sampling_locations: ``[B, Lq, H, L, P, 2]`` normalized ``(x, y)`` in
        ``[0, 1]`` (values outside sample into the zero-padding region).
      attention_weights: ``[B, Lq, H, L, P]`` (softmax-normalized upstream).

    Returns:
      ``[B, Lq, H * D]``.

    TPU implementation notes (profiled on v5e): naive per-corner gathers are
    row-count-bound (~12 GB/s effective — each of the 4 bilinear corners is a
    separate random row of only D floats). We instead pre-expand each level
    to **corner-packed rows**: a zero-padded 2x2-neighborhood concat so ONE
    gathered row of ``4*D`` channels carries all four corners of a sample —
    4x fewer random rows, 4x wider rows, and the corner-weighted reduction
    fuses behind the single gather (~3.2x faster, bit-identical math).
    """
    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)
    compute_dtype = value.dtype
    if query_chunk is None:
        # best measured on v5e at B(folded batch)=4: 1024. The dominant
        # transient (the f32 one-hot W for the largest level) scales as
        # B * H * qc * P * S_max, so shrink the chunk as batch grows or the
        # backward pass falls off an HBM-pressure cliff (measured 10x).
        query_chunk = max(256, (1024 * 4) // max(B, 1))

    # ---- corner-packed expansion, built ONCE per level -------------------
    # rows indexed by (by, bx) on an (h+1) x (w+1) grid of 2x2 windows over
    # the zero-padded map; row contents = the 4 bilinear corners of a sample
    # whose floor cell is (by-1, bx-1) in original coordinates.
    # One head-major transpose up front; pad/concat then operate on the
    # small D-minor axis (a corner concat AFTER a [S',4,H,D]->[H,S',4D]
    # transpose relayouts hundreds of MB per layer and costs ~as much as
    # the gather itself — measured on v5e).
    # Per level, one of two layouts:
    # - "onehot" (small levels): head-major [B, H, S, D] slice; sampling
    #   becomes a weighted-one-hot MXU matmul (bilinear corner weights
    #   folded into the matrix) — no expansion, no post-reduce, avoids
    #   XLA's 4KB-tile reread per random gather row.
    # - "gather" (large levels): corner-packed expansion, kept as
    #   [B, S'*H, 4D] flat (s', head) rows — (8, 192)-friendly tiling with
    #   NO head-major transpose (a [S',4,H,D]->[H,S',4D] relayout costs as
    #   much as the gather itself; measured on v5e).
    levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w                                  # v: [B, h*w, H, D]
        if h * w <= onehot_max_s:
            levels.append(("onehot", v.transpose(0, 2, 1, 3)))  # [B,H,S,D]
            continue
        vhw = v.reshape(B, h, w, nH, D)
        vp = jnp.pad(vhw, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        ve = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=-1)                                # [B, h+1, w+1, H, 4D]
        levels.append(("gather", ve.reshape(B, (h + 1) * (w + 1) * nH,
                                            4 * D)))

    def sample_chunk(loc_c: jax.Array, attn_c: jax.Array) -> jax.Array:
        """loc_c [B, C, H, L, P, 2], attn_c [B, C, H, L, P] ->
        [B, C, H*D] (f32)."""
        C = loc_c.shape[1]
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            kind, buf = levels[lvl]
            loc = loc_c[:, :, :, lvl]                  # [B, C, H, P, 2]
            attn = attn_c[:, :, :, lvl]                # [B, C, H, P]
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            cws = []
            for dy in (0, 1):
                for dx in (0, 1):
                    cw = ((1.0 - jnp.abs(fx - dx))
                          * (1.0 - jnp.abs(fy - dy)))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    cws.append(cw * valid.astype(cw.dtype))
            # [B, C, H, P, 4]; corner order (dy,dx)=(0,0),(0,1),(1,0),(1,1)
            cw = jnp.stack(cws, -1) * attn.astype(jnp.float32)[..., None]
            cw_t = cw.transpose(0, 2, 1, 3, 4)          # [B, H, C, P, 4]

            if kind == "onehot":
                # weighted one-hot: W[row=(c,p), s] carries the bilinear
                # corner weights directly; one MXU matmul per level replaces
                # gather + corner reduce
                ids = []
                for dy in (0, 1):
                    for dx in (0, 1):
                        xi = jnp.clip(x0 + dx, 0, w - 1)
                        yi = jnp.clip(y0 + dy, 0, h - 1)
                        ids.append((yi * w + xi).astype(jnp.int32))
                ids = jnp.stack(ids, -1).transpose(0, 2, 1, 3, 4)
                ids = ids.reshape(B, nH, C * P, 4)      # [B, H, CP, 4]
                wgt = cw_t.reshape(B, nH, C * P, 4)
                iota = jnp.arange(h * w, dtype=jnp.int32)
                W = jnp.zeros((B, nH, C * P, h * w), jnp.float32)
                for c in range(4):
                    W = W + jnp.where(
                        ids[..., c, None] == iota[None, None, None, :],
                        wgt[..., c, None], 0.0)
                prec = (None if buf.dtype == jnp.bfloat16
                        else jax.lax.Precision.HIGH)  # bf16x3 ~ f32
                part = jax.lax.dot_general(
                    W.astype(buf.dtype), buf,
                    dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # [B, H, CP, D]
                out = out + part.reshape(B, nH, C, P, D).sum(3)
            else:
                bx = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
                by = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
                base = by * (w + 1) + bx                # [B, C, H, P]
                # flat (s', head) row index into [B, S'*H, 4D]
                head_ids = jnp.arange(nH, dtype=jnp.int32)[None, None, :,
                                                           None]
                idx = base * nH + head_ids
                g = jnp.take_along_axis(
                    buf, idx.reshape(B, C * nH * P)[..., None], axis=1)
                g = g.reshape(B, C, nH, P, 4, D).astype(jnp.float32)
                # multiply+sum on the VPU (exact f32; an einsum would hit
                # the MXU in bf16 on TPU)
                out = out + jnp.sum(cw[..., None] * g, axis=(3, 4)) \
                    .transpose(0, 2, 1, 3)
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

    if Lq <= query_chunk:
        out = sample_chunk(sampling_locations, attention_weights)
    else:
        # scan over query chunks: bounds the gathered intermediate (a
        # single big gather materializes GBs with 2.7x-padded layouts and
        # OOMs at batch>=4); measured fastest vs an unrolled chunk loop
        n_chunks = -(-Lq // query_chunk)
        Lq_pad = n_chunks * query_chunk
        pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
        loc_p = jnp.pad(sampling_locations, pad)
        attn_p = jnp.pad(attention_weights, pad[:-1])
        loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                              *loc_p.shape[2:]).swapaxes(0, 1)
        attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                                *attn_p.shape[2:]).swapaxes(0, 1)

        # checkpoint the chunk body: without it the scan stacks each chunk's
        # gathered/one-hot intermediates as backward residuals (tens of GB
        # at canonical training scale); recompute them per chunk instead
        chunk_fn = jax.checkpoint(sample_chunk)

        def body(_, inp):
            lc, ac = inp
            return None, chunk_fn(lc, ac)

        _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
        out = chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]
    return out.astype(compute_dtype)


def _corner_taps_1d(loc: jax.Array, attn: jax.Array, h: int, w: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Exact grid_sample corner decomposition for ONE level, head-major.

    ``loc [B, C, H, P, 2]`` normalized, ``attn [B, C, H, P]`` ->
    ``(ids int32 [B, H, C, P*4], wgt f32 [B, H, C, P*4])`` where tap
    ``p*4 + corner`` carries the bilinear corner weight x validity x attn
    (OOB corners get weight exactly 0; their ids are clipped in-range).

    Shared by the windowed forward (:func:`ms_deform_attn_pmerged`) and
    the windowed_vjp backward — the backward re-derives each chunk's
    window start from these, so the two MUST stay bitwise-identical
    (same ops, same order; all int32/f32 so the match is exact).
    """
    x = loc[..., 0].astype(jnp.float32) * w - 0.5
    y = loc[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    attn_f = attn.astype(jnp.float32)
    ids_c, wgt_c = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            cw = ((1.0 - jnp.abs(fx - dx))
                  * (1.0 - jnp.abs(fy - dy)))
            valid = ((x0 + dx >= 0) & (x0 + dx < w)
                     & (y0 + dy >= 0) & (y0 + dy < h))
            xi = jnp.clip(x0 + dx, 0, w - 1)
            yi = jnp.clip(y0 + dy, 0, h - 1)
            ids_c.append((yi * w + xi).astype(jnp.int32))
            wgt_c.append(cw * valid.astype(cw.dtype) * attn_f)
    B, C, nH, P = attn.shape
    ids = jnp.stack(ids_c, -1).transpose(0, 2, 1, 3, 4)
    wgt = jnp.stack(wgt_c, -1).transpose(0, 2, 1, 3, 4)
    return (ids.reshape(B, nH, C, P * 4), wgt.reshape(B, nH, C, P * 4))


def ms_deform_attn_pmerged(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_chunk: int | None = None,
    window: Sequence[int] | None = None,
):
    """Point-merged weighted-one-hot sampling with optional windowing.

    Exact :func:`ms_deform_attn_core` semantics, with ALL ``P * 4`` taps of
    a query at one level folded into ONE row of the weighted one-hot —
    ``[C, S_l] @ [S_l, D]`` per level instead of ``[C*P, S_l] @ [S_l, D]``
    (4x fewer dot rows; same number of one-hot selects).

    ``window``: optional per-level contraction window (elements, multiple of
    128; 0 = full exact). When set, each chunk contracts only a
    ``dynamic_slice`` of the level starting at the chunk's minimum touched
    pixel — compare/dot width drops from ``S_l`` to ``window[l]``. Taps
    falling outside the window contribute ZERO and are counted: the second
    return value is the total weighted-tap overflow count, so callers can
    assert exactness at runtime (encoder sampling locations cluster around
    the spatially-sorted query chunk; shipped-checkpoint offsets stay well
    inside practical windows). Returns ``out`` alone when ``window`` is
    None, else ``(out, overflow_count)``.
    """
    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)
    compute_dtype = value.dtype
    if query_chunk is None:
        query_chunk = max(256, (1024 * 4) // max(B, 1))
    win = list(window) if window is not None else [0] * L

    v_hm = value.transpose(0, 2, 1, 3)          # [B, H, S, D]
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]

    def sample_chunk(loc_c: jax.Array, attn_c: jax.Array):
        """loc_c [B, C, H, L, P, 2], attn_c [B, C, H, L, P] ->
        ([B, C, H*D] f32, overflow f32)."""
        C = loc_c.shape[1]
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        overflow = jnp.zeros((), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            Sl = h * w
            Ws = win[lvl] if (win[lvl] and win[lvl] < Sl) else 0
            ids, wgt = _corner_taps_1d(loc_c[:, :, :, lvl],
                                       attn_c[:, :, :, lvl], h, w)
            # ids/wgt: [B, H, C, 16]

            if Ws:
                # chunk-local window: min touched pixel, 128-aligned
                live = wgt > 0
                # sublane-aligned window start (S is the sublane dim of the
                # [B, H, S, D] (8, 128) tiling; 8-alignment keeps the slice
                # tile-friendly without eating window budget)
                lo = jnp.min(jnp.where(live, ids, Sl), axis=(0, 1, 2, 3))
                lo = jnp.clip((lo // 8) * 8, 0, max(Sl - Ws, 0))
                local = ids - lo
                inside = (local >= 0) & (local < Ws)
                overflow = overflow + jnp.sum(
                    jnp.where(live & ~inside, 1.0, 0.0))
                ids_use = jnp.where(inside, local, Ws)  # Ws = dead column
                wgt = jnp.where(inside, wgt, 0.0)
                width = Ws
                buf = jax.lax.dynamic_slice_in_dim(
                    jax.lax.slice_in_dim(v_hm, starts[lvl],
                                         starts[lvl] + Sl, axis=2),
                    lo, Ws, axis=2)  # Ws < Sl by construction (win plan)
            else:
                ids_use = ids
                width = Sl
                buf = jax.lax.slice_in_dim(v_hm, starts[lvl],
                                           starts[lvl] + Sl, axis=2)

            iota = jnp.arange(width, dtype=jnp.int32)
            W = jnp.zeros((B, nH, C, width), jnp.float32)
            for k in range(P * 4):
                W = W + jnp.where(
                    ids_use[..., k, None] == iota[None, None, None, :],
                    wgt[..., k, None], 0.0)
            prec = (None if buf.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGH)
            part = jax.lax.dot_general(
                W.astype(buf.dtype), buf,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                precision=prec,
                preferred_element_type=jnp.float32)    # [B, H, C, D]
            out = out + part
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D), overflow

    if Lq <= query_chunk:
        out, overflow = sample_chunk(sampling_locations, attention_weights)
    else:
        n_chunks = -(-Lq // query_chunk)
        Lq_pad = n_chunks * query_chunk
        pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
        loc_p = jnp.pad(sampling_locations, pad)
        attn_p = jnp.pad(attention_weights, pad[:-1])
        loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                              *loc_p.shape[2:]).swapaxes(0, 1)
        attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                                *attn_p.shape[2:]).swapaxes(0, 1)
        chunk_fn = jax.checkpoint(sample_chunk)

        def body(carry, inp):
            lc, ac = inp
            o, ov = chunk_fn(lc, ac)
            return carry + ov, o

        overflow, chunks = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), (loc_s, attn_s))
        out = chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]
    out = out.astype(compute_dtype)
    if window is None:
        return out
    return out, overflow


def windowed_sampling_plan(spatial_shapes: Sequence[Tuple[int, int]],
                           base_chunk: int = 512, margin_px: int = 8):
    """Per-query-segment chunk sizes + per-tap-level windows for encoder
    sampling (queries = the level-concatenated pixel grid, row-major, so a
    chunk's taps cluster spatially at every level).

    Chunks scale with the query level's area, so a chunk's tap span at tap
    level ``t`` is ~``base_chunk * S_t / S_0`` pixels regardless of which
    segment it came from; the window adds ``margin_px`` rows of slack for
    learned offsets (overflow is counted at runtime if exceeded). Windows
    that wouldn't cut at least 25% are disabled (0 = full, exact).

    The sampling cost is select-bound at ~``16 taps * n_queries * window``
    VPU ops, and ``window = base_chunk * S_t/S_0 + 2 * margin_px * w_t +
    128``, so SMALLER chunks shrink the per-query select width down to the
    margin floor (v5e sweep: 512/8 beats 1024/8 by ~1.25x; below 384 the
    scan/dot overhead wins back). ``margin_px`` bounds the learned offset
    magnitude the window tolerates — the default 8 px covers the reference
    offset-bias init (radius <= 5.7 px, ``_offset_bias_init``) plus slack;
    exceeding taps are DROPPED and counted in the returned overflow.
    """
    sizes = [h * w for h, w in spatial_shapes]
    s0 = sizes[0]
    qcs = [max(64, min(base_chunk, ((base_chunk * s) // s0) // 64 * 64))
           for s in sizes]
    # windows are per (query segment, tap level): a chunk of qcs[seg]
    # seg-level queries spans ~qcs[seg] * S_t / S_seg tap-level pixels (the
    # 64-query chunk floor makes small segments span MORE than
    # base_chunk * S_t / S_0 — sized per segment so the floor cannot
    # overflow), plus margin rows and the +1 corner/alignment slack.
    wins = []
    for seg, s_seg in enumerate(sizes):
        seg_wins = []
        for (h, w), st in zip(spatial_shapes, sizes):
            span = -(-qcs[seg] * st // s_seg)
            ws = int(-(-(span + 2 * margin_px * w + 128) // 128) * 128)
            seg_wins.append(0 if ws >= 0.75 * st else ws)
        wins.append(seg_wins)
    return sizes, qcs, wins


def ms_deform_attn_windowed(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_segments: Sequence[int],
    base_chunk: int = 512,
    margin_px: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Windowed P-merged sampling over per-level query segments.

    ``query_segments`` are the encoder's per-level query counts (the query
    axis is the level-concatenated pixel grid); each segment is chunked and
    windowed via :func:`windowed_sampling_plan`. Returns ``(out, overflow)``
    where ``overflow`` counts weighted taps that fell outside their window
    and were DROPPED — callers must verify ``overflow == 0`` (and fall back
    to the exact path otherwise) to keep grid_sample-exact semantics.
    """
    assert sum(query_segments) == sampling_locations.shape[1], (
        query_segments, sampling_locations.shape)
    _, qcs, wins = windowed_sampling_plan(spatial_shapes, base_chunk,
                                          margin_px)
    outs = []
    overflow = jnp.zeros((), jnp.float32)
    q0 = 0
    for si, (seg, qc) in enumerate(zip(query_segments, qcs)):
        o, ov = ms_deform_attn_pmerged(
            value, spatial_shapes,
            jax.lax.slice_in_dim(sampling_locations, q0, q0 + seg, axis=1),
            jax.lax.slice_in_dim(attention_weights, q0, q0 + seg, axis=1),
            query_chunk=qc, window=wins[si])
        outs.append(o)
        overflow = overflow + ov
        q0 += seg
    return jnp.concatenate(outs, 1), overflow


def core_backward(shapes: Tuple[Tuple[int, int], ...]):
    """The shared custom-VJP backward: differentiate through the exact
    core formulation at the saved primals — the measured-fastest backward
    on this hardware (the CUDA reference hand-writes col2im kernels,
    ``ms_deform_attn_cuda.cu:83-153``; here XLA differentiates the
    equivalent formulation). Recomputing the forward costs less than
    saving the one-hot residuals. Used by every fwd-impl/core-bwd split
    (windowed_hybrid here, the Pallas wrapper in ``pallas_deform.py``) so
    cotangent-dtype handling lives in exactly one place."""

    def bwd(res, g_out):
        primal, vjp = jax.vjp(
            lambda v, l, a: ms_deform_attn_core(v, list(shapes), l, a),
            *res)
        return vjp(g_out.astype(primal.dtype))

    return bwd


@functools.lru_cache(maxsize=None)
def _windowed_fwd_core_bwd(shapes: Tuple[Tuple[int, int], ...],
                           segments: Tuple[int, ...], margin_px: int):
    """custom_vjp pairing the windowed forward with the exact core backward.

    The windowed forward's select work is ~2.5x cheaper than the core's
    (BASELINE.md round-2 log), but differentiating THROUGH the windowed
    chunk scan is 7-9x slower than the core backward — so training
    historically ran the core forward too. This split takes the cheap
    forward and the fast backward: when ``overflow == 0`` the two
    formulations compute the same function, so the gradients are exact
    (the train engine aborts on any nonzero overflow). The same split the
    reference's autograd Function makes between its im2col forward and
    hand-written col2im backward kernels
    (``models/ops/src/cuda/ms_deform_attn_cuda.cu:20-153``)."""

    @jax.custom_vjp
    def f(value, loc, attn):
        return ms_deform_attn_windowed(value, list(shapes), loc, attn,
                                       segments, margin_px=margin_px)

    def fwd(value, loc, attn):
        return f(value, loc, attn), (value, loc, attn)

    core_bwd = core_backward(shapes)

    def bwd(res, g):
        g_out, _ = g            # overflow count carries no gradient
        return core_bwd(res, g_out)

    f.defvjp(fwd, bwd)
    return f


def ms_deform_attn_windowed_hybrid(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_segments: Sequence[int],
    margin_px: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Windowed forward + exact-core custom-VJP backward (training impl).

    Same ``(out, overflow)`` contract as :func:`ms_deform_attn_windowed`;
    callers must verify ``overflow == 0`` (the train engine's per-step
    abort) — with zero overflow both the values and the gradients equal
    the exact path's.
    """
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    return _windowed_fwd_core_bwd(shapes, tuple(int(s) for s in
                                                query_segments), margin_px)(
        value, sampling_locations, attention_weights)


def _windowed_backward(value: jax.Array,
                       spatial_shapes: Sequence[Tuple[int, int]],
                       sampling_locations: jax.Array,
                       attention_weights: jax.Array,
                       query_segments: Sequence[int],
                       margin_px: int,
                       g_out: jax.Array,
                       remat_chunk: bool = True):
    """Hand-structured backward of :func:`ms_deform_attn_windowed`.

    The one train-side avenue round 3 left unmeasured: the shipped train
    backward (``core_backward``) replays the FULL-WIDTH core select build
    (~3.4x the windowed select work, BASELINE.md round-4), because naively
    differentiating *through* the windowed chunk scan is 7-9x slower — the
    VJP of each chunk's ``dynamic_slice`` scatters into a full-size
    ``[B, H, S, D]`` zeros buffer that the scan transpose then accumulates,
    turning an 18 MB window update into a ~180 MB read-modify-write per
    chunk. This backward keeps the windowed math but hand-manages that one
    pathological term: per chunk it re-derives the window start exactly as
    the forward did (shared :func:`_corner_taps_1d`, integer ops — bitwise
    match), takes ``jax.vjp`` of the chunk body *over the pre-sliced
    windows* (so autodiff never sees the slice), and accumulates the value
    cotangent into a loop-carried f32 buffer with an in-place
    read-add-write of just the window region. Gradients are exact whenever
    the forward's ``overflow == 0`` — the same contract the train engine
    already enforces per step (reference counterpart: the hand-written
    col2im backward, ``models/ops/src/cuda/ms_deform_attn_cuda.cu:83-153``,
    which likewise scatters only touched taps).

    Returns ``(d_value, d_loc, d_attn)`` in the primals' dtypes.
    """
    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    _, qcs, wins = windowed_sampling_plan(spatial_shapes, margin_px=margin_px)
    compute_dtype = value.dtype
    v_hm = value.transpose(0, 2, 1, 3)              # [B, H, S, D]
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]

    carry0 = jnp.zeros(v_hm.shape, jnp.float32)

    def make_chunk_step(win):
        def chunk_step(carry, inp):
            lc, ac, gc = inp    # [B,qc,H,L,P,2], [B,qc,H,L,P], [B,qc,H*D]
            los, bufs = [], []
            for lvl, (h, w) in enumerate(spatial_shapes):
                Sl = h * w
                Ws = win[lvl] if (win[lvl] and win[lvl] < Sl) else 0
                if Ws:
                    # window start: EXACTLY the forward's computation
                    # (ms_deform_attn_pmerged) — int32 min over live taps,
                    # 8-aligned, clipped; deterministic, so it matches the
                    # forward bitwise on the same inputs.
                    ids, wgt = _corner_taps_1d(lc[:, :, :, lvl],
                                               ac[:, :, :, lvl], h, w)
                    live = wgt > 0
                    lo = jnp.min(jnp.where(live, ids, Sl), axis=(0, 1, 2, 3))
                    lo = jnp.clip((lo // 8) * 8, 0, max(Sl - Ws, 0))
                    buf = jax.lax.dynamic_slice_in_dim(
                        jax.lax.slice_in_dim(v_hm, starts[lvl],
                                             starts[lvl] + Sl, axis=2),
                        lo, Ws, axis=2)
                else:
                    lo = None
                    buf = jax.lax.slice_in_dim(v_hm, starts[lvl],
                                               starts[lvl] + Sl, axis=2)
                los.append(lo)
                bufs.append(buf)

            def fchunk(bufs_, lc_, ac_):
                """The windowed chunk forward at FIXED window starts —
                identical math to the forward's sample_chunk, with the
                value windows as explicit args so ``jax.vjp`` returns
                window-sized value cotangents."""
                C = lc_.shape[1]
                out = jnp.zeros((B, nH, C, D), jnp.float32)
                for lvl, (h, w) in enumerate(spatial_shapes):
                    Sl = h * w
                    ids, wgt = _corner_taps_1d(lc_[:, :, :, lvl],
                                               ac_[:, :, :, lvl], h, w)
                    buf = bufs_[lvl]
                    width = buf.shape[2]
                    if width < Sl:
                        local = ids - los[lvl]
                        inside = (local >= 0) & (local < width)
                        ids_use = jnp.where(inside, local, width)
                        wgt = jnp.where(inside, wgt, 0.0)
                    else:
                        ids_use = ids
                    iota = jnp.arange(width, dtype=jnp.int32)
                    W = jnp.zeros((B, nH, C, width), jnp.float32)
                    for k in range(P * 4):
                        W = W + jnp.where(
                            ids_use[..., k, None]
                            == iota[None, None, None, :],
                            wgt[..., k, None], 0.0)
                    prec = (None if buf.dtype == jnp.bfloat16
                            else jax.lax.Precision.HIGH)
                    out = out + jax.lax.dot_general(
                        W.astype(buf.dtype), buf,
                        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                return (out.transpose(0, 2, 1, 3)
                        .reshape(B, lc_.shape[1], nH * D)
                        .astype(compute_dtype))

            # remat: recompute the one-hot W at its backward use site so it
            # fuses into the dots (as in the forward) instead of being
            # saved as a [B, H, C, width] f32 residual per level
            fc = jax.checkpoint(fchunk) if remat_chunk else fchunk
            _, vjp_fn = jax.vjp(fc, bufs, lc, ac)
            d_bufs, d_lc, d_ac = vjp_fn(gc)

            for lvl, (h, w) in enumerate(spatial_shapes):
                db = d_bufs[lvl].astype(jnp.float32)
                if los[lvl] is None:
                    off = int(starts[lvl])
                    cur = jax.lax.slice_in_dim(carry, off, off + h * w,
                                               axis=2)
                    carry = jax.lax.dynamic_update_slice_in_dim(
                        carry, cur + db, off, axis=2)
                else:
                    off = starts[lvl] + los[lvl]
                    cur = jax.lax.dynamic_slice_in_dim(
                        carry, off, db.shape[2], axis=2)
                    carry = jax.lax.dynamic_update_slice_in_dim(
                        carry, cur + db, off, axis=2)
            return carry, (d_lc, d_ac)

        return chunk_step

    carry = carry0
    d_locs, d_attns = [], []
    q0 = 0
    for si, (seg, qc) in enumerate(zip(query_segments, qcs)):
        loc_s = jax.lax.slice_in_dim(sampling_locations, q0, q0 + seg,
                                     axis=1)
        attn_s = jax.lax.slice_in_dim(attention_weights, q0, q0 + seg,
                                      axis=1)
        g_s = jax.lax.slice_in_dim(g_out, q0, q0 + seg, axis=1)
        n_chunks = -(-seg // qc)
        Lp = n_chunks * qc
        loc_p = jnp.pad(loc_s, [(0, 0), (0, Lp - seg)] + [(0, 0)] * 4)
        attn_p = jnp.pad(attn_s, [(0, 0), (0, Lp - seg)] + [(0, 0)] * 3)
        g_p = jnp.pad(g_s, [(0, 0), (0, Lp - seg), (0, 0)])
        loc_sc = loc_p.reshape(B, n_chunks, qc, nH, L, P, 2).swapaxes(0, 1)
        attn_sc = attn_p.reshape(B, n_chunks, qc, nH, L, P).swapaxes(0, 1)
        g_sc = g_p.reshape(B, n_chunks, qc, nH * D).swapaxes(0, 1)
        carry, (d_lc, d_ac) = jax.lax.scan(
            make_chunk_step(wins[si]), carry, (loc_sc, attn_sc, g_sc))
        d_locs.append(d_lc.swapaxes(0, 1)
                      .reshape(B, Lp, nH, L, P, 2)[:, :seg])
        d_attns.append(d_ac.swapaxes(0, 1)
                       .reshape(B, Lp, nH, L, P)[:, :seg])
        q0 += seg

    d_value = carry.transpose(0, 2, 1, 3).astype(value.dtype)
    d_loc = jnp.concatenate(d_locs, 1).astype(sampling_locations.dtype)
    d_attn = jnp.concatenate(d_attns, 1).astype(attention_weights.dtype)
    return d_value, d_loc, d_attn


@functools.lru_cache(maxsize=None)
def _windowed_self_vjp(shapes: Tuple[Tuple[int, int], ...],
                       segments: Tuple[int, ...], margin_px: int,
                       remat_chunk: bool = True):
    """custom_vjp pairing the windowed forward with the WINDOWED backward
    (:func:`_windowed_backward`) — both passes at window width."""

    @jax.custom_vjp
    def f(value, loc, attn):
        return ms_deform_attn_windowed(value, list(shapes), loc, attn,
                                       segments, margin_px=margin_px)

    def fwd(value, loc, attn):
        return f(value, loc, attn), (value, loc, attn)

    def bwd(res, g):
        g_out, _ = g            # overflow count carries no gradient
        return _windowed_backward(res[0], list(shapes), res[1], res[2],
                                  segments, margin_px, g_out,
                                  remat_chunk=remat_chunk)

    f.defvjp(fwd, bwd)
    return f


def ms_deform_attn_windowed_vjp(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_segments: Sequence[int],
    margin_px: int = 8,
    remat_chunk: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Windowed forward + windowed custom-VJP backward (training impl).

    Same ``(out, overflow)`` contract as :func:`ms_deform_attn_windowed`;
    gradients equal the exact path's whenever ``overflow == 0`` (the train
    engine's per-step abort enforces this). Unlike
    :func:`ms_deform_attn_windowed_hybrid` — whose backward replays the
    full-width core — BOTH passes here do windowed-width select work.
    """
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    return _windowed_self_vjp(shapes,
                              tuple(int(s) for s in query_segments),
                              margin_px, remat_chunk)(
        value, sampling_locations, attention_weights)


def windowed2d_plan(spatial_shapes: Sequence[Tuple[int, int]],
                    block_h: int = 8, block_w: int = 20,
                    margin_px: int = 8):
    """Per-segment 2D block shapes + per-(segment, tap-level) 2D windows.

    The 1D windows of :func:`windowed_sampling_plan` pay ``2 * margin * w``
    elements per window because a y-margin costs whole ROWS of the
    row-major-flattened level. Grouping a segment's queries into RECTANGULAR
    pixel blocks ``(bh, bw)`` instead lets the contraction window be a 2D
    rectangle ``(bh*sy + 2m + 2) x (bw*sx + 2m + 2)`` in tap-level pixels
    (``sy/sx`` = level scale ratios, ``m`` = margin): the select width drops
    from ~1664 to ~500-900 at the canonical level 0 — the same exactness
    contract (dynamic window position from the min touched pixel, static
    width, runtime overflow counter for dropped taps).

    Block shapes scale with each segment's resolution (a seg-s block spans
    the same NORMALIZED area as a seg-0 block) and are clamped to the
    segment grid. Windows that wouldn't cut at least 25% of the level are
    disabled (0 = full-width exact contraction).

    Returns ``(blocks, wins)``: ``blocks[seg] = (bh_s, bw_s)``;
    ``wins[seg][lvl] = (wy, wx)`` or ``(0, 0)`` when disabled.
    """
    h0, w0 = spatial_shapes[0]
    blocks, wins = [], []
    for (hs, ws) in spatial_shapes:
        bh_s = max(2, min(hs, -(-block_h * hs // h0)))
        bw_s = max(2, min(ws, -(-block_w * ws // w0)))
        blocks.append((bh_s, bw_s))
        seg_wins = []
        for (ht, wt) in spatial_shapes:
            # a (bh_s, bw_s) seg-pixel block spans ~bh_s*ht/hs tap rows;
            # +2 covers the center-offset (-0.5) and the far bilinear corner
            span_y = -(-bh_s * ht // hs)
            span_x = -(-bw_s * wt // ws)
            wy = span_y + 2 * margin_px + 2
            wx = span_x + 2 * margin_px + 2
            if wy * wx >= 0.75 * ht * wt:
                seg_wins.append((0, 0))
            else:
                seg_wins.append((min(wy, ht), min(wx, wt)))
        wins.append(seg_wins)
    return blocks, wins


def ms_deform_attn_pmerged2d(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    seg_shape: Tuple[int, int],
    block: Tuple[int, int],
    windows: Sequence[Tuple[int, int]],
):
    """P-merged one-hot sampling over 2D query blocks with 2D windows.

    Exact :func:`ms_deform_attn_core` semantics for taps inside their
    window; outside taps are DROPPED and counted (same contract as
    :func:`ms_deform_attn_pmerged` with ``window=``). The queries MUST be
    the row-major pixel grid of ``seg_shape`` (the encoder's per-level
    query segments): they are regrouped into ``block=(bh, bw)`` pixel
    rectangles so each scan step contracts only a ``(wy, wx)`` rectangle of
    each tap level — ``wy*wx`` select/dot width instead of the 1D window's
    ``span + 2*margin*w`` (2-4x less VPU select work at canonical scale).

    Args:
      value: ``[B, S, H, D]`` level-concatenated.
      sampling_locations/attention_weights: ``[B, S_seg, H, L, P, {2,}]``
        for this segment's queries only.
      seg_shape: ``(h_seg, w_seg)`` with ``h_seg * w_seg == S_seg``.
      block: ``(bh, bw)`` query block rectangle (seg pixels).
      windows: per tap level ``(wy, wx)`` or ``(0, 0)`` for full width.

    Returns ``(out [B, S_seg, H*D], overflow scalar f32)``.
    """
    B, S, nH, D = value.shape
    _, Sseg, _, L, P, _ = sampling_locations.shape
    hs, ws_ = seg_shape
    assert hs * ws_ == Sseg, (seg_shape, Sseg)
    bh, bw = block
    compute_dtype = value.dtype

    v_hm = value.transpose(0, 2, 1, 3)          # [B, H, S, D]
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    # per-level 2D views for rectangular dynamic slices
    v_2d = [jax.lax.slice_in_dim(v_hm, starts[l], starts[l] + h * w, axis=2)
            .reshape(B, nH, h, w, D)
            for l, (h, w) in enumerate(spatial_shapes)]

    nby, nbx = -(-hs // bh), -(-ws_ // bw)
    hp, wp = nby * bh, nbx * bw

    def to_blocks(a):
        """[B, Sseg, ...] -> [nblocks, B, bh*bw, ...] (zero-padded)."""
        a = a.reshape(B, hs, ws_, *a.shape[2:])
        a = jnp.pad(a, [(0, 0), (0, hp - hs), (0, wp - ws_)]
                    + [(0, 0)] * (a.ndim - 3))
        a = a.reshape(B, nby, bh, nbx, bw, *a.shape[3:])
        a = a.transpose(1, 3, 0, 2, 4, *range(5, a.ndim))
        return a.reshape(nby * nbx, B, bh * bw, *a.shape[5:])

    loc_b = to_blocks(sampling_locations)    # [NB, B, C, H, L, P, 2]
    # padded queries need no extra masking: to_blocks zero-pads, so their
    # attention weights are exactly 0 (loc=0 taps are weighted zero and
    # excluded from the live-min by the weight test)
    attn_b = to_blocks(attention_weights)    # [NB, B, C, H, L, P]

    C = bh * bw

    def sample_block(loc_c, attn_c):
        """loc_c [B, C, H, L, P, 2], attn_c [B, C, H, L, P] ->
        ([B, C, H*D] f32, overflow f32)."""
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        overflow = jnp.zeros((), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            wy, wx = windows[lvl]
            loc = loc_c[:, :, :, lvl]
            attn = attn_c[:, :, :, lvl].astype(jnp.float32)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            ys_c, xs_c, wgt_c = [], [], []
            for dy in (0, 1):
                for dx in (0, 1):
                    cw = ((1.0 - jnp.abs(fx - dx))
                          * (1.0 - jnp.abs(fy - dy)))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    xs_c.append(jnp.clip(x0 + dx, 0, w - 1)
                                .astype(jnp.int32))
                    ys_c.append(jnp.clip(y0 + dy, 0, h - 1)
                                .astype(jnp.int32))
                    wgt_c.append(cw * valid.astype(cw.dtype) * attn)
            # [B, H, C, P*4] head-major taps
            ys = jnp.stack(ys_c, -1).transpose(0, 2, 1, 3, 4) \
                .reshape(B, nH, C, P * 4)
            xs = jnp.stack(xs_c, -1).transpose(0, 2, 1, 3, 4) \
                .reshape(B, nH, C, P * 4)
            wgt = jnp.stack(wgt_c, -1).transpose(0, 2, 1, 3, 4) \
                .reshape(B, nH, C, P * 4)

            if wy:
                live = wgt > 0
                # unaligned starts: y is a major axis of the 2D slice and
                # the window is flattened before the dot, so alignment
                # would only waste margin budget (unlike the 1D path's
                # 8-aligned flat offset)
                y_lo = jnp.clip(
                    jnp.min(jnp.where(live, ys, h), axis=(0, 1, 2, 3)),
                    0, max(h - wy, 0))
                x_lo = jnp.clip(
                    jnp.min(jnp.where(live, xs, w), axis=(0, 1, 2, 3)),
                    0, max(w - wx, 0))
                ly = ys - y_lo
                lx = xs - x_lo
                inside = (ly >= 0) & (ly < wy) & (lx >= 0) & (lx < wx)
                overflow = overflow + jnp.sum(
                    jnp.where(live & ~inside, 1.0, 0.0))
                width = wy * wx
                ids_use = jnp.where(inside, ly * wx + lx, width)
                wgt = jnp.where(inside, wgt, 0.0)
                buf = jax.lax.dynamic_slice(
                    v_2d[lvl], (0, 0, y_lo, x_lo, 0),
                    (B, nH, wy, wx, D)).reshape(B, nH, width, D)
            else:
                width = h * w
                ids_use = ys * w + xs
                buf = v_2d[lvl].reshape(B, nH, width, D)

            iota = jnp.arange(width, dtype=jnp.int32)
            W = jnp.zeros((B, nH, C, width), jnp.float32)
            for k in range(P * 4):
                W = W + jnp.where(
                    ids_use[..., k, None] == iota[None, None, None, :],
                    wgt[..., k, None], 0.0)
            prec = (None if buf.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGH)
            part = jax.lax.dot_general(
                W.astype(buf.dtype), buf,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                precision=prec,
                preferred_element_type=jnp.float32)    # [B, H, C, D]
            out = out + part
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D), overflow

    block_fn = jax.checkpoint(sample_block)

    def body(carry, inp):
        lc, ac = inp
        o, ov = block_fn(lc, ac)
        return carry + ov, o

    overflow, blocks_out = jax.lax.scan(
        body, jnp.zeros((), jnp.float32), (loc_b, attn_b))
    # [NB, B, C, HD] -> [B, hs, ws, HD]
    o = blocks_out.reshape(nby, nbx, B, bh, bw, nH * D)
    o = o.transpose(2, 0, 3, 1, 4, 5).reshape(B, hp, wp, nH * D)
    out = o[:, :hs, :ws_].reshape(B, Sseg, nH * D)
    return out.astype(compute_dtype), overflow


def ms_deform_attn_windowed2d(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_segments: Sequence[int],
    block_h: int = 8,
    block_w: int = 20,
    margin_px: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """2D-windowed P-merged sampling over per-level query segments
    (drop-in for :func:`ms_deform_attn_windowed` with rectangular blocks).

    Returns ``(out, overflow)`` with the same exactness contract: callers
    must verify ``overflow == 0`` (taps outside their window are dropped).
    """
    assert sum(query_segments) == sampling_locations.shape[1], (
        query_segments, sampling_locations.shape)
    assert list(query_segments) == [h * w for h, w in spatial_shapes], (
        "windowed2d requires the encoder's pixel-grid query segments",
        query_segments, spatial_shapes)
    blocks, wins = windowed2d_plan(spatial_shapes, block_h, block_w,
                                   margin_px)
    outs = []
    overflow = jnp.zeros((), jnp.float32)
    q0 = 0
    for si, seg in enumerate(query_segments):
        o, ov = ms_deform_attn_pmerged2d(
            value, spatial_shapes,
            jax.lax.slice_in_dim(sampling_locations, q0, q0 + seg, axis=1),
            jax.lax.slice_in_dim(attention_weights, q0, q0 + seg, axis=1),
            spatial_shapes[si], blocks[si], wins[si])
        outs.append(o)
        overflow = overflow + ov
        q0 += seg
    return jnp.concatenate(outs, 1), overflow


def ms_deform_attn_packed(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_chunk: int | None = None,
) -> jax.Array:
    """Corner-packed single-one-hot sampling (the round-2 fast path).

    Same exact semantics as :func:`ms_deform_attn_core`, with the VPU
    compare work cut 4x: instead of summing FOUR weighted one-hots (one per
    bilinear corner) into the dot operand, expand each level to
    corner-packed rows (a zero-padded 2x2-neighborhood concat on the
    ``(h+1) x (w+1)`` base grid — one row carries all four corners of a
    sample, as in the gather path) and contract with ONE unweighted one-hot
    ``[C*P, S']`` against ``[S', 4D]``. The corner/attention weighting then
    happens on the tiny ``4D``-wide result instead of inside the S-wide
    one-hot build. XLA fuses the compare-structured operand into its
    base-dilated-convolution dot emitter either way, so cost tracks the
    compare count (measured on v5e: 40 -> ~13 ms at encoder scale).
    """
    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)
    compute_dtype = value.dtype
    if query_chunk is None:
        query_chunk = max(256, (1024 * 4) // max(B, 1))

    # corner-packed, head-major: [B, H, S'_l, 4D] per level
    levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        vhw = v.reshape(B, h, w, nH, D)
        vp = jnp.pad(vhw, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        ve = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=-1)                                # [B, h+1, w+1, H, 4D]
        levels.append(ve.reshape(B, (h + 1) * (w + 1), nH, 4 * D)
                      .transpose(0, 2, 1, 3))       # [B, H, S', 4D]

    def sample_chunk(loc_c: jax.Array, attn_c: jax.Array) -> jax.Array:
        """loc_c [B, C, H, L, P, 2], attn_c [B, C, H, L, P] -> [B, C, H*D]."""
        C = loc_c.shape[1]
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            buf = levels[lvl]                          # [B, H, S', 4D]
            Sp = (h + 1) * (w + 1)
            loc = loc_c[:, :, :, lvl]                  # [B, C, H, P, 2]
            attn = attn_c[:, :, :, lvl].astype(jnp.float32)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            cws = []
            for dy in (0, 1):
                for dx in (0, 1):
                    cw = ((1.0 - jnp.abs(fx - dx))
                          * (1.0 - jnp.abs(fy - dy)))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    cws.append(cw * valid.astype(cw.dtype))
            cw = jnp.stack(cws, -1) * attn[..., None]  # [B, C, H, P, 4]
            # base cell on the (h+1) x (w+1) grid; always in range after the
            # clip, with out-of-range corners zero-weighted (exact
            # grid_sample zeros semantics, see gather path)
            bx = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
            by = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
            ids = (by * (w + 1) + bx).transpose(0, 2, 1, 3)  # [B, H, C, P]
            ids = ids.reshape(B, nH, C * P)
            iota = jnp.arange(Sp, dtype=jnp.int32)
            one_hot = (ids[..., None] == iota).astype(buf.dtype)
            prec = (None if buf.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGH)
            g = jax.lax.dot_general(
                one_hot, buf,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                precision=prec,
                preferred_element_type=jnp.float32)   # [B, H, CP, 4D]
            g = g.reshape(B, nH, C, P, 4, D)
            cw_t = cw.transpose(0, 2, 1, 3, 4)         # [B, H, C, P, 4]
            out = out + jnp.sum(cw_t[..., None] * g, axis=(3, 4))
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

    if Lq <= query_chunk:
        out = sample_chunk(sampling_locations, attention_weights)
    else:
        n_chunks = -(-Lq // query_chunk)
        Lq_pad = n_chunks * query_chunk
        pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
        loc_p = jnp.pad(sampling_locations, pad)
        attn_p = jnp.pad(attention_weights, pad[:-1])
        loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                              *loc_p.shape[2:]).swapaxes(0, 1)
        attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                                *attn_p.shape[2:]).swapaxes(0, 1)
        chunk_fn = jax.checkpoint(sample_chunk)

        def body(_, inp):
            lc, ac = inp
            return None, chunk_fn(lc, ac)

        _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
        out = chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]
    return out.astype(compute_dtype)


def ms_deform_attn_fused(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    query_chunk: int | None = None,
) -> jax.Array:
    """Level-merged, point-merged weighted-one-hot sampling.

    Same exact semantics as :func:`ms_deform_attn_core` (grid_sample
    align_corners=False, zeros padding), restructured for the MXU:

    - ALL ``L * P * 4`` taps of a query are folded into ONE row of a single
      weighted-one-hot matrix ``W [C, S_total]`` over the level-concatenated
      pixel axis, so the whole sampling is one ``[C, S] @ [S, D]``
      contraction per (batch, head) — 4x fewer dot rows than the per-level
      ``[C*P, S_l]`` formulation (the P-sum moves INTO the one-hot row) and
      no per-level fixed cost (XLA lowers the fused one-hot dot to a single
      base-dilated convolution; measured on v5e).
    """
    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)
    compute_dtype = value.dtype
    if query_chunk is None:
        query_chunk = max(256, (1024 * 4) // max(B, 1))

    v_hm = value.transpose(0, 2, 1, 3)          # [B, H, S, D]
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]

    def sample_chunk(loc_c: jax.Array, attn_c: jax.Array) -> jax.Array:
        """loc_c [B, C, H, L, P, 2], attn_c [B, C, H, L, P] -> [B, C, H*D]."""
        C = loc_c.shape[1]
        ids_all, w_all = [], []
        for lvl, (h, w) in enumerate(spatial_shapes):
            loc = loc_c[:, :, :, lvl]                  # [B, C, H, P, 2]
            attn = attn_c[:, :, :, lvl].astype(jnp.float32)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            for dy in (0, 1):
                for dx in (0, 1):
                    cw = ((1.0 - jnp.abs(fx - dx))
                          * (1.0 - jnp.abs(fy - dy)))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    xi = jnp.clip(x0 + dx, 0, w - 1)
                    yi = jnp.clip(y0 + dy, 0, h - 1)
                    ids_all.append(
                        (starts[lvl] + yi * w + xi).astype(jnp.int32))
                    w_all.append(cw * valid.astype(cw.dtype) * attn)
        # [B, C, H, P, L*4] -> head-major flat taps [B, H, C, P*L*4]
        ids = jnp.stack(ids_all, -1).transpose(0, 2, 1, 3, 4)
        wgt = jnp.stack(w_all, -1).transpose(0, 2, 1, 3, 4)
        K = ids.shape[-2] * ids.shape[-1]
        ids = ids.reshape(B, nH, C, K)
        wgt = wgt.reshape(B, nH, C, K)
        iota = jnp.arange(S, dtype=jnp.int32)
        W = jnp.zeros((B, nH, C, S), jnp.float32)
        for k in range(K):
            W = W + jnp.where(ids[..., k, None] == iota[None, None, None, :],
                              wgt[..., k, None], 0.0)
        prec = (None if v_hm.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGH)
        out = jax.lax.dot_general(
            W.astype(v_hm.dtype), v_hm,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            precision=prec,
            preferred_element_type=jnp.float32)       # [B, H, C, D]
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

    if Lq <= query_chunk:
        out = sample_chunk(sampling_locations, attention_weights)
    else:
        n_chunks = -(-Lq // query_chunk)
        Lq_pad = n_chunks * query_chunk
        pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
        loc_p = jnp.pad(sampling_locations, pad)
        attn_p = jnp.pad(attention_weights, pad[:-1])
        loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                              *loc_p.shape[2:]).swapaxes(0, 1)
        attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                                *attn_p.shape[2:]).swapaxes(0, 1)
        chunk_fn = jax.checkpoint(sample_chunk)

        def body(_, inp):
            lc, ac = inp
            return None, chunk_fn(lc, ac)

        _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
        out = chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]
    return out.astype(compute_dtype)


def temporal_adjacency(n_frames: int, n_total: int) -> np.ndarray:
    """Static 0/1 adjacency ``[T1, T2]`` of which observed frames each query
    frame samples (reference ``models/ops/modules/ms_deform_attn.py:137,189``):
    observed query frame ``t1 < n_frames`` samples ``t2 in {t1-1, t1, t1+1}``
    clipped to the observed range; future query frames sample all observed
    frames.
    """
    T2 = n_frames
    adj = np.zeros((n_total, T2), dtype=np.float32)
    for t1 in range(n_total):
        if t1 < n_frames:
            for t2 in (t1 - 1, t1, t1 + 1):
                if 0 <= t2 < T2:
                    adj[t1, t2] = 1.0
        else:
            adj[t1, :] = 1.0
    return adj


def temporal_deform_sample(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_logits: jax.Array,
    adjacency: jax.Array,
    impl: str = "xla",
    query_chunk: int | None = None,
    onehot_max_s: int = 8192,
    query_segments: Sequence[int] | None = None,
    margin_px: int = 8,
    block_hw: Tuple[int, int] = (8, 20),
) -> Tuple[jax.Array, jax.Array]:
    """Temporal multi-frame deformable attention with shared per-frame
    projections (the reference's weight-sharing structure, see module
    docstring).

    Args:
      value: ``[B, T2, S, H, D]`` per observed frame.
      spatial_shapes: static list of ``(h, w)``.
      sampling_locations: ``[B, T1, Lq, H, L, P, 2]``.
      attention_logits: ``[B, T1, Lq, H, L, P]`` raw (pre-softmax) logits.
        The reference stacks identical logits once per sampled frame and
        softmaxes over ``(L, P, T2valid)`` jointly
        (``ms_deform_attn.py:149-150``), which for shared projections equals
        ``softmax over (L, P) / count(t1)``.
      adjacency: ``[T1, T2]`` STATIC (numpy) 0/1 mask from
        :func:`temporal_adjacency`.
      impl: "xla" (round-1 corner-expanded core), "pmerged" (exact
        point-merged one-hot, the round-2 default), "windowed" (pmerged with
        per-segment 1D contraction windows), "windowed_hybrid" (windowed
        forward + exact-core custom-VJP backward — round-3 train split;
        decoder/no-segments calls use the core), "windowed_vjp" (windowed
        forward + WINDOWED custom-VJP backward — both passes at window
        width; round 4), "windowed2d" (rectangular query blocks with 2D
        windows — less VPU select work; round 3) — these need
        ``query_segments`` and fall back to pmerged/core otherwise —
        or "pallas".
      query_segments: encoder per-level query counts (enables windowing).
      block_hw: (block_h, block_w) query-block rectangle for "windowed2d".

    Returns:
      ``(out [B, T1, Lq, H*D], overflow scalar)`` — overflow is the count of
      windowed taps dropped outside their window (always 0 for the exact
      impls); callers relying on exactness must verify it is zero.
    """
    B, T1, Lq, nH, L, P = attention_logits.shape
    _, T2, S, _, D = value.shape

    logits = attention_logits.reshape(B, T1, Lq, nH, L * P)
    attn = jax.nn.softmax(logits, axis=-1).reshape(B, T1, Lq, nH, L, P)
    counts = np.asarray(adjacency).sum(axis=1)        # [T1] static
    attn = attn / jnp.asarray(counts, attn.dtype)[None, :, None, None, None,
                                                  None]

    # Neighbor-frame value aggregation (linearity trick, see module
    # docstring). Unrolled static adds over the tiny T2 axis: exact f32 and
    # no [B, T1, T2, S, H, D] broadcast intermediate (hundreds of MB at
    # encoder scale); the adjacency is static (numpy or concrete).
    adj_np = np.asarray(adjacency)
    frames = [jax.lax.slice_in_dim(value, t2, t2 + 1, axis=1)
              for t2 in range(T2)]
    v_agg = jnp.concatenate(
        [sum(frames[t2] for t2 in range(T2) if adj_np[t1, t2] > 0)
         for t1 in range(T1)], axis=1)                # [B, T1, S, H, D]

    # fold T1 into batch for one fixed-shape sampling call
    v_flat = v_agg.reshape(B * T1, S, nH, D)
    loc_flat = sampling_locations.reshape(B * T1, Lq, nH, L, P, 2)
    attn_flat = attn.reshape(B * T1, Lq, nH, L, P)

    overflow = jnp.zeros((), jnp.float32)
    if impl == "pallas":
        from snipper_tpu.ops.pallas_deform import ms_deform_attn_pallas_grad

        out = ms_deform_attn_pallas_grad(v_flat, spatial_shapes, loc_flat,
                                         attn_flat)
    elif impl == "skip":
        # profiling aid only: elide the sampling (weighted mean over S) to
        # measure the non-sampling share of a forward. NOT exact.
        out = jnp.broadcast_to(v_flat.mean(1, keepdims=True),
                               (B * T1, Lq, nH, D)).reshape(B * T1, Lq,
                                                            nH * D)
    elif impl == "windowed" and query_segments is not None:
        out, overflow = ms_deform_attn_windowed(
            v_flat, spatial_shapes, loc_flat, attn_flat, query_segments,
            margin_px=margin_px)
    elif impl == "windowed_hybrid" and query_segments is not None:
        out, overflow = ms_deform_attn_windowed_hybrid(
            v_flat, spatial_shapes, loc_flat, attn_flat, query_segments,
            margin_px=margin_px)
    elif impl == "windowed_vjp" and query_segments is not None:
        out, overflow = ms_deform_attn_windowed_vjp(
            v_flat, spatial_shapes, loc_flat, attn_flat, query_segments,
            margin_px=margin_px)
    elif impl == "windowed2d" and query_segments is not None:
        out, overflow = ms_deform_attn_windowed2d(
            v_flat, spatial_shapes, loc_flat, attn_flat, query_segments,
            block_h=block_hw[0], block_w=block_hw[1], margin_px=margin_px)
    elif impl in ("windowed_hybrid", "windowed_vjp"):
        # no segments (decoder): the core path is already the fast backward
        out = ms_deform_attn_core(v_flat, spatial_shapes, loc_flat, attn_flat,
                                  query_chunk=query_chunk,
                                  onehot_max_s=onehot_max_s)
    elif impl in ("pmerged", "windowed", "windowed2d"):
        out = ms_deform_attn_pmerged(v_flat, spatial_shapes, loc_flat,
                                     attn_flat, query_chunk=query_chunk)
    else:
        out = ms_deform_attn_core(v_flat, spatial_shapes, loc_flat, attn_flat,
                                  query_chunk=query_chunk,
                                  onehot_max_s=onehot_max_s)
    return out.reshape(B, T1, Lq, nH * D), overflow
