"""TPU probe 7: select-bound one-hot build variants at encoder scale.

The round-2 windowed pmerged sampling is hypothesized select-bound:
16 taps x C rows x window VPU select-elements per chunk-level. Variants:
  v0  library windowed pmerged (baseline)
  v1  windowed pmerged, bf16 weight build (int32 ids)
  v2  windowed pmerged, int16 ids + bf16 weights
  v3  windowed corner-packed (1 select/point-row, N=4D), f32
  v4  windowed corner-packed, bf16 build

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/perf_probe7.py > /tmp/probe7.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np


def make_inputs(key_seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(key_seed)
    shapes = [(75, 100), (38, 50), (19, 25)]
    S = sum(h * w for h, w in shapes)
    B, H, D, P = 4, 8, 48, 4
    Lq = S
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    # encoder-like locations: per-level grid refs + small offsets (<=6px)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)  # [S, 2]
    off = rng.uniform(-6, 6, (B, Lq, H, len(shapes), P, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = ref[None, :, None, None, None, :] + off / norm[None, None, None, :,
                                                         None, :]
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, Lq, H, len(shapes), P)),
                       jnp.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return value, shapes, loc, attn


def pmerged_win_variant(value, spatial_shapes, sampling_locations,
                        attention_weights, query_chunk, window,
                        id_dtype, w_dtype):
    """Windowed pmerged with parameterized build dtypes (forward only)."""
    import jax
    import jax.numpy as jnp

    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    win = list(window)
    v_hm = value.transpose(0, 2, 1, 3)
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]

    def sample_chunk(loc_c, attn_c):
        C = loc_c.shape[1]
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            Sl = h * w
            Ws = win[lvl] if (win[lvl] and win[lvl] < Sl) else 0
            loc = loc_c[:, :, :, lvl]
            attn = attn_c[:, :, :, lvl].astype(jnp.float32)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            ids_c, wgt_c = [], []
            for dy in (0, 1):
                for dx in (0, 1):
                    cw = (1.0 - jnp.abs(fx - dx)) * (1.0 - jnp.abs(fy - dy))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    xi = jnp.clip(x0 + dx, 0, w - 1)
                    yi = jnp.clip(y0 + dy, 0, h - 1)
                    ids_c.append((yi * w + xi).astype(jnp.int32))
                    wgt_c.append(cw * valid.astype(cw.dtype) * attn)
            ids = jnp.stack(ids_c, -1).transpose(0, 2, 1, 3, 4)
            wgt = jnp.stack(wgt_c, -1).transpose(0, 2, 1, 3, 4)
            ids = ids.reshape(B, nH, C, P * 4)
            wgt = wgt.reshape(B, nH, C, P * 4)
            if Ws:
                live = wgt > 0
                lo = jnp.min(jnp.where(live, ids, Sl), axis=(0, 1, 2, 3))
                lo = jnp.clip((lo // 8) * 8, 0, max(Sl - Ws, 0))
                local = ids - lo
                inside = (local >= 0) & (local < Ws)
                ids_use = jnp.where(inside, local, Ws)
                wgt = jnp.where(inside, wgt, 0.0)
                width = Ws
                buf = jax.lax.dynamic_slice_in_dim(
                    jax.lax.slice_in_dim(v_hm, starts[lvl],
                                         starts[lvl] + Sl, axis=2),
                    lo, min(Ws, Sl), axis=2)
            else:
                ids_use = ids
                width = Sl
                buf = jax.lax.slice_in_dim(v_hm, starts[lvl],
                                           starts[lvl] + Sl, axis=2)
            iota = jnp.arange(width, dtype=id_dtype)
            ids_use = ids_use.astype(id_dtype)
            wgt = wgt.astype(w_dtype)
            W = jnp.zeros((B, nH, C, width), w_dtype)
            for k in range(P * 4):
                W = W + jnp.where(
                    ids_use[..., k, None] == iota[None, None, None, :],
                    wgt[..., k, None], jnp.zeros((), w_dtype))
            part = jax.lax.dot_general(
                W.astype(buf.dtype), buf,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)
            out = out + part
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

    n_chunks = -(-Lq // query_chunk)
    Lq_pad = n_chunks * query_chunk
    pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
    loc_p = jnp.pad(sampling_locations, pad)
    attn_p = jnp.pad(attention_weights, pad[:-1])
    loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                          *loc_p.shape[2:]).swapaxes(0, 1)
    attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                            *attn_p.shape[2:]).swapaxes(0, 1)

    def body(_, inp):
        lc, ac = inp
        return None, sample_chunk(lc, ac)

    _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
    return chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]


def packed_win_variant(value, spatial_shapes, sampling_locations,
                       attention_weights, query_chunk, window, w_dtype,
                       id_dtype):
    """Windowed corner-packed: 1 select per point-row over packed [S',4D]."""
    import jax
    import jax.numpy as jnp

    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    win = list(window)

    levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        vhw = v.reshape(B, h, w, nH, D)
        vp = jnp.pad(vhw, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        ve = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=-1)
        levels.append(ve.reshape(B, (h + 1) * (w + 1), nH, 4 * D)
                      .transpose(0, 2, 1, 3))  # [B, H, S', 4D]

    def sample_chunk(loc_c, attn_c):
        C = loc_c.shape[1]
        out = jnp.zeros((B, nH, C, D), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            buf_full = levels[lvl]
            Sp = (h + 1) * (w + 1)
            Ws = win[lvl] if (win[lvl] and win[lvl] < Sp) else 0
            loc = loc_c[:, :, :, lvl]
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
                    cw = (1.0 - jnp.abs(fx - dx)) * (1.0 - jnp.abs(fy - dy))
                    valid = ((x0 + dx >= 0) & (x0 + dx < w)
                             & (y0 + dy >= 0) & (y0 + dy < h))
                    cws.append(cw * valid.astype(cw.dtype))
            cw = jnp.stack(cws, -1) * attn[..., None]  # [B, C, H, P, 4]
            bx = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
            by = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
            ids = (by * (w + 1) + bx).transpose(0, 2, 1, 3)  # [B, H, C, P]
            ids = ids.reshape(B, nH, C * P)
            if Ws:
                lo = jnp.min(ids, axis=(0, 1, 2))
                lo = jnp.clip((lo // 8) * 8, 0, max(Sp - Ws, 0))
                ids = ids - lo
                buf = jax.lax.dynamic_slice_in_dim(buf_full, lo,
                                                   min(Ws, Sp), axis=2)
                width = Ws
            else:
                buf = buf_full
                width = Sp
            iota = jnp.arange(width, dtype=id_dtype)
            one_hot = (ids.astype(id_dtype)[..., None] == iota).astype(w_dtype)
            g = jax.lax.dot_general(
                one_hot.astype(buf.dtype), buf,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)   # [B, H, CP, 4D]
            g = g.reshape(B, nH, C, P, 4, D)
            cw_t = cw.transpose(0, 2, 1, 3, 4)
            out = out + jnp.sum(cw_t[..., None] * g, axis=(3, 4))
        return out.transpose(0, 2, 1, 3).reshape(B, C, nH * D)

    n_chunks = -(-Lq // query_chunk)
    Lq_pad = n_chunks * query_chunk
    pad = [(0, 0), (0, Lq_pad - Lq)] + [(0, 0)] * 4
    loc_p = jnp.pad(sampling_locations, pad)
    attn_p = jnp.pad(attention_weights, pad[:-1])
    loc_s = loc_p.reshape(B, n_chunks, query_chunk,
                          *loc_p.shape[2:]).swapaxes(0, 1)
    attn_s = attn_p.reshape(B, n_chunks, query_chunk,
                            *attn_p.shape[2:]).swapaxes(0, 1)

    def body(_, inp):
        lc, ac = inp
        return None, sample_chunk(lc, ac)

    import jax

    _, chunks = jax.lax.scan(body, None, (loc_s, attn_s))
    return chunks.swapaxes(0, 1).reshape(B, Lq_pad, nH * D)[:, :Lq]


def time_fn(fn, *args, K=8):
    import jax

    out = fn(*args)
    np.asarray(out[..., :1].astype("float32"))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    np.asarray(outs[-1][..., :1].astype("float32"))
    return (time.perf_counter() - t0) / K * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_windowed,
                                             windowed_sampling_plan)

    value, shapes, loc, attn = make_inputs()
    segs = tuple(h * w for h, w in shapes)
    _, _, wins = windowed_sampling_plan(shapes)
    print(f"plan windows={wins}", flush=True)

    # reference output (exact, round-1 core)
    ref_fn = jax.jit(functools.partial(ms_deform_attn_core, value, shapes))
    ms, ref = time_fn(ref_fn, loc, attn)
    ref_np = np.asarray(ref.astype(jnp.float32))
    scale = np.abs(ref_np).max()
    print(f"core(exact)            : {ms:7.2f} ms", flush=True)

    def check(out):
        return np.abs(np.asarray(out.astype(jnp.float32)) - ref_np).max() / scale

    v0 = jax.jit(functools.partial(ms_deform_attn_windowed, value, shapes,
                                   query_segments=segs))
    ms, out = time_fn(lambda l, a: v0(sampling_locations=l,
                                      attention_weights=a)[0], loc, attn)
    print(f"v0 lib windowed        : {ms:7.2f} ms  relerr {check(out):.2e}",
          flush=True)

    qc = 1024
    for name, id_dt, w_dt in (
            ("v1 win i32/bf16", jnp.int32, jnp.bfloat16),
            ("v2 win i16/bf16", jnp.int16, jnp.bfloat16),
            ("v2b win i16/f32", jnp.int16, jnp.float32),
    ):
        fn = jax.jit(functools.partial(
            pmerged_win_variant, value, shapes, query_chunk=qc,
            window=wins, id_dtype=id_dt, w_dtype=w_dt))
        try:
            ms, out = time_fn(lambda l, a: fn(sampling_locations=l,
                                              attention_weights=a), loc, attn)
            print(f"{name:23s}: {ms:7.2f} ms  relerr {check(out):.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:23s}: FAIL {type(e).__name__}: {e}"[:160],
                  flush=True)

    # packed windows: same element windows but on the (h+1)(w+1) grid; round up
    wins_p = [0 if not w else int(-(-int(w * 1.1) // 128) * 128)
              for w in wins]
    for name, id_dt, w_dt in (
            ("v3 packed i32/f32", jnp.int32, jnp.float32),
            ("v4 packed i16/bf16", jnp.int16, jnp.bfloat16),
    ):
        fn = jax.jit(functools.partial(
            packed_win_variant, value, shapes, query_chunk=qc,
            window=wins_p, id_dtype=id_dt, w_dtype=w_dt))
        try:
            ms, out = time_fn(lambda l, a: fn(sampling_locations=l,
                                              attention_weights=a), loc, attn)
            print(f"{name:23s}: {ms:7.2f} ms  relerr {check(out):.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:23s}: FAIL {type(e).__name__}: {e}"[:160],
                  flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
