"""TPU probe 5: P-merged one-hot (exact + windowed segments) vs core.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/perf_probe5.py > /tmp/probe5.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np

SHAPES = [(75, 100), (38, 50), (19, 25)]
H, D, P = 8, 48, 4
B = 4
LQ = sum(h * w for h, w in SHAPES)
SEGS = [7500, 1900, 475]          # encoder query segments (per own level)


def timed(fn, args, K=6):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:4].astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    np.asarray(jax.tree.leaves(outs)[-1].ravel()[:4].astype(jnp.float32))
    return (time.perf_counter() - t0) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_pmerged)

    rng = np.random.default_rng(0)
    S = sum(h * w for h, w in SHAPES)
    val = rng.standard_normal((B, S, H, D)).astype(np.float32)
    # encoder-realistic sampling locations: ref = own pixel position,
    # offsets up to ~4 px at the sampled level
    locs = []
    for lvl, (h, w) in enumerate(SHAPES):
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        ref = np.stack([gx.ravel(), gy.ravel()], -1)       # [S_l, 2]
        locs.append(ref)
    ref_all = np.concatenate(locs, 0)                      # [LQ, 2]
    loc = np.zeros((B, LQ, H, len(SHAPES), P, 2), np.float32)
    for lvl, (h, w) in enumerate(SHAPES):
        off = rng.uniform(-4.0, 4.0, (B, LQ, H, P, 2)) / np.array([w, h])
        loc[:, :, :, lvl] = ref_all[None, :, None, None, :] + off
    attn = rng.uniform(0, 1, (B, LQ, H, len(SHAPES), P)).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    def run_full(name, core, dtype, qc, **kw):
        f = jax.jit(functools.partial(core, spatial_shapes=tuple(SHAPES),
                                      query_chunk=qc, **kw))
        args = (jnp.asarray(val, dtype), jnp.asarray(loc, dtype),
                jnp.asarray(attn, dtype))
        try:
            ms = timed(lambda *a: f(a[0], sampling_locations=a[1],
                                    attention_weights=a[2]), args)
            ms = round(ms, 2)
        except Exception as e:  # noqa: BLE001
            ms = f"FAIL {type(e).__name__}: {e}"[:140]
        print(f"{name}: {ms}", flush=True)

    run_full("core    bf16 qc=1024", ms_deform_attn_core, jnp.bfloat16, 1024)
    run_full("pmerged bf16 qc=1024", ms_deform_attn_pmerged, jnp.bfloat16,
             1024)
    run_full("pmerged bf16 qc=2048", ms_deform_attn_pmerged, jnp.bfloat16,
             2048)
    run_full("pmerged f32  qc=1024", ms_deform_attn_pmerged, jnp.float32,
             1024)

    # windowed, per query segment (queries of one level per call)
    def windowed_all(v, lo_, at_, qcs, wins):
        outs = []
        ov = jnp.zeros((), jnp.float32)
        q0 = 0
        for seg, qc, win in zip(SEGS, qcs, wins):
            o, of = ms_deform_attn_pmerged(
                v, tuple(SHAPES),
                jax.lax.slice_in_dim(lo_, q0, q0 + seg, axis=1),
                jax.lax.slice_in_dim(at_, q0, q0 + seg, axis=1),
                query_chunk=qc, window=win)
            outs.append(o)
            ov = ov + of
            q0 += seg
        return jnp.concatenate(outs, 1), ov

    for qcs, wins, tag in [
        ((1024, 256, 128), ([2048, 512, 0], [2048, 512, 0], [2048, 512, 0]),
         "w2048/512"),
        ((1024, 256, 128), ([3072, 1024, 0], [3072, 1024, 0],
                            [3072, 1024, 0]), "w3072/1024"),
        ((512, 128, 64), ([1024, 256, 0], [1024, 256, 0], [1024, 256, 0]),
         "qc512 w1024/256"),
    ]:
        f = jax.jit(functools.partial(windowed_all, qcs=qcs, wins=wins))
        args = (jnp.asarray(val, jnp.bfloat16), jnp.asarray(loc, jnp.bfloat16),
                jnp.asarray(attn, jnp.bfloat16))
        try:
            ms = round(timed(f, args), 2)
            out, ov = f(*args)
            ov = float(np.asarray(ov))
        except Exception as e:  # noqa: BLE001
            ms, ov = f"FAIL {type(e).__name__}: {e}"[:140], -1
        print(f"windowed {tag}: {ms} ms, overflow={ov}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
