"""Benchmark: inference snippet throughput on the canonical config.

Measures snippets/sec/chip of the flagship T=4, 600x800, enc6/dec6 forward
(the reference's canonical inference config, reference README.md:43-57 /
inference.py:39-76) on the attached TPU, bf16 weights/activations.

Methodology notes (axon TPU tunnel):
- enqueue K iterations then read one small output once: per-call readback
  adds ~1.6 s of tunnel round-trip that is NOT device time
- ONE process at a time (the tunnel grant is single-client)

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no numbers and no GPU is attached here, so
``vs_baseline`` is computed against an ESTIMATED A100 PyTorch throughput of
10 snippets/s (batch=1 eager inference.py with the CUDA deform-attn kernel;
see BASELINE.md "A100 baseline estimate").
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_SNIPPETS_PER_SEC = 10.0  # estimate; see BASELINE.md


def main():
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
    best, best_bs = 0.0, 1
    for bs in (1, 2):
        try:
            x = jnp.asarray(rng.uniform(
                0, 1, (bs, cfg.num_frames, cfg.input_height, cfg.input_width,
                       3)), jnp.bfloat16)
            o = fwd(params, x)                  # compile + warm
            np.asarray(o.astype(jnp.float32))
            K = 8
            t0 = time.perf_counter()
            outs = [fwd(params, x) for _ in range(K)]
            np.asarray(outs[-1].astype(jnp.float32))
            sps = bs * K / (time.perf_counter() - t0)
            if sps > best:
                best, best_bs = sps, bs
        except Exception as e:  # noqa: BLE001
            print(f"# batch {bs} failed: {type(e).__name__}", flush=True)
            break

    print(json.dumps({
        "metric": "inference_snippets_per_sec_per_chip_T4_600x800",
        "value": round(best, 3),
        "unit": "snippets/s",
        "vs_baseline": round(best / A100_BASELINE_SNIPPETS_PER_SEC, 3),
        "batch_size": best_bs,
        "dtype": "bfloat16",
        "note": "baseline is an estimated A100 PyTorch eager throughput "
                "(reference publishes no numbers); see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
