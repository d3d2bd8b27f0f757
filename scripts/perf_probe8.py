"""TPU probe 8: window-plan sweep (base_chunk x margin) + forward breakdown.

1. Encoder-scale op sweep over (base_chunk, margin_px) — select cost is
   ~16*Nq*window, window = chunk-span + 2*margin*w + 128, so smaller chunks
   should win until scan/dot overhead bites.
2. Full canonical T=4 forward: windowed best configs, and impl="skip"
   (sampling elided) to split sampling vs everything-else.
3. Batched forward (b=4) with windowed: overflow + per-snippet scaling.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/perf_probe8.py > /tmp/probe8.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np

from perf_probe7 import make_inputs, time_fn  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_windowed,
                                             windowed_sampling_plan)

    value, shapes, loc, attn = make_inputs()
    segs = tuple(h * w for h, w in shapes)

    for bc in (1024, 512, 384, 256):
        for margin in (8, 6):
            _, qcs, wins = windowed_sampling_plan(shapes, bc, margin)
            fn = jax.jit(functools.partial(
                ms_deform_attn_windowed, value, shapes, query_segments=segs,
                base_chunk=bc, margin_px=margin))
            try:
                ms, (out, ov) = time_fn(
                    lambda l, a: fn(sampling_locations=l,
                                    attention_weights=a), loc, attn,
                    K=8)
                ovf = float(np.asarray(ov))
                print(f"bc={bc:5d} m={margin}: {ms:7.2f} ms  overflow={ovf}"
                      f"  wins={wins} qcs={qcs}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bc={bc} m={margin}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)

    # ---- full canonical forward --------------------------------------------
    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    for impl, b in (("skip", 1), ("windowed", 1), ("windowed", 4),
                    ("pmerged", 1)):
        cfg = Config.canonical_t4().replace(deform_impl=impl)
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        x = jnp.asarray(rng.uniform(
            0, 1, (b, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
            jnp.bfloat16)
        fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
        try:
            t0 = time.perf_counter()
            out = fwd(params, x)
            np.asarray(out["pred_logits"][..., :1].astype(jnp.float32))
            comp = time.perf_counter() - t0
            ovf = float(np.asarray(out.get("sampling_overflow", 0.0)))
            K = 8
            t0 = time.perf_counter()
            outs = [fwd(params, x)["pred_logits"] for _ in range(K)]
            np.asarray(outs[-1][..., :1].astype(jnp.float32))
            ms = (time.perf_counter() - t0) / K * 1e3
            print(f"fwd impl={impl} b={b}: {ms:7.1f} ms/batch "
                  f"({ms / b:6.1f} ms/snippet) overflow={ovf} "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fwd impl={impl} b={b}: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
