"""TPU probe 18: 2D-windowed pmerged sampling sweep (round 3).

Hypothesis: the 1D windows pay 2*margin*w elements of select width per
window (whole rows); rectangular query blocks with rectangular windows cut
the width to (bh*sy + 2m + 2)(bw*sx + 2m + 2) — 2-4x less VPU select work
at level 0. Sweep block shapes x margins at encoder scale vs the shipped
1D windowed path.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe18.py > /tmp/probe18.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from perf_probe7 import make_inputs  # noqa: E402


def make_inputs_4px(key_seed=0):
    """Encoder-scale inputs with |offset| <= 4 px (the init-bias bound that
    the margin-5 production default relies on)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(key_seed)
    shapes = [(75, 100), (38, 50), (19, 25)]
    S = sum(h * w for h, w in shapes)
    B, H, D, P = 4, 8, 48, 4
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    refs = []
    for (h, w) in shapes:
        gy, gx = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    ref = np.concatenate(refs, 0)
    off = rng.uniform(-4, 4, (B, S, H, len(shapes), P, 2))
    norm = np.array([(w, h) for h, w in shapes], np.float64)
    loc = jnp.asarray(ref[None, :, None, None, None, :]
                      + off / norm[None, None, None, :, None, :], jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, S, H, len(shapes), P)),
                       jnp.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return value, shapes, loc, attn


def bench(fn, loc, attn, K=8):
    out, ov = fn(sampling_locations=loc, attention_weights=attn)
    np.asarray(out[..., :1].astype("float32"))
    t0 = time.perf_counter()
    for _ in range(K):
        out, ov = fn(sampling_locations=loc, attention_weights=attn)
    np.asarray(out[..., :1].astype("float32"))
    ms = (time.perf_counter() - t0) / K * 1e3
    return ms, float(np.asarray(ov))


def main():
    import jax

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_windowed,
                                             ms_deform_attn_windowed2d,
                                             windowed2d_plan)

    value, shapes, loc, attn = make_inputs_4px()
    segs = tuple(h * w for h, w in shapes)

    # baseline: shipped 1D windowed at production defaults
    for margin in (5, 8):
        fn = jax.jit(functools.partial(
            ms_deform_attn_windowed, value, shapes, query_segments=segs,
            base_chunk=512, margin_px=margin))
        ms, ov = bench(fn, loc, attn)
        print(f"1D bc=512 m={margin}: {ms:7.2f} ms  overflow={ov}",
              flush=True)

    for (bh, bw) in ((15, 20), (8, 20), (8, 10), (5, 10), (4, 8), (10, 13),
                     (15, 10), (5, 20), (3, 7)):
        for margin in (5, 8):
            blocks, wins = windowed2d_plan(shapes, bh, bw, margin)
            fn = jax.jit(functools.partial(
                ms_deform_attn_windowed2d, value, shapes,
                query_segments=segs, block_h=bh, block_w=bw,
                margin_px=margin))
            try:
                ms, ov = bench(fn, loc, attn)
                print(f"2D b=({bh:2d},{bw:2d}) m={margin}: {ms:7.2f} ms  "
                      f"overflow={ov}  wins={wins}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"2D b=({bh},{bw}) m={margin}: FAIL "
                      f"{type(e).__name__}: {e}"[:200], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
