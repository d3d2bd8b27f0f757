"""TPU perf probe: canonical-forward batch scaling + per-op profile.

Run ALONE (single TPU client):  nohup python scripts/perf_probe.py > /tmp/probe.log 2>&1 &

Measures steady-state ms/snippet for the canonical T=4 600x800 enc6/dec6
bf16 forward at several batch sizes (enqueue-K-then-tiny-readback timing —
block_until_ready lies over the axon tunnel), then captures a jax.profiler
trace at batch 1 and prints the per-source-line device-op breakdown.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timed(fn, args, K=8):
    out = fn(*args)                          # warm (compiled already)
    np.asarray(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    np.asarray(jax.tree.leaves(outs[-1])[0][..., :1].astype(jnp.float32))
    return (time.perf_counter() - t0) / K


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    cfg = Config.canonical_t4()
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)["pred_logits"])

    rng = np.random.default_rng(0)
    results = {}
    for bs in (1, 2, 4, 8):
        x = jnp.asarray(rng.uniform(
            0, 1, (bs, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
            jnp.bfloat16)
        t0 = time.perf_counter()
        o = fwd(params, x)
        np.asarray(o[..., :1].astype(jnp.float32))
        compile_s = time.perf_counter() - t0
        dt = timed(fwd, (params, x))
        results[bs] = dict(ms_per_call=round(dt * 1e3, 1),
                           ms_per_snippet=round(dt * 1e3 / bs, 1),
                           snippets_per_s=round(bs / dt, 2),
                           compile_s=round(compile_s, 1))
        print(f"bs={bs}: {results[bs]}", flush=True)

    # profile at batch 1 and batch 4
    from snipper_tpu.utils.profiling import summarize_trace, trace

    for bs in (1, 4):
        x = jnp.asarray(rng.uniform(
            0, 1, (bs, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
            jnp.bfloat16)
        fwd(params, x)
        tdir = f"/tmp/trace_b{bs}"
        with trace(tdir):
            outs = [fwd(params, x) for _ in range(2)]
            np.asarray(outs[-1][..., :1].astype(jnp.float32))
        print(f"--- per-op breakdown bs={bs} (ms per 2 calls) ---", flush=True)
        for src, ms in summarize_trace(tdir, top_k=25).items():
            print(f"{ms:9.2f}  {src}", flush=True)

    print("RESULTS " + json.dumps(results), flush=True)
