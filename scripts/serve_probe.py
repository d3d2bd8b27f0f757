"""TPU serve probe: exported StableHLO artifact vs live-jit forward.

Quantifies the cost of serving from a `cli.export` artifact (weights baked
in, no model code) relative to the live `jax.jit` forward on the same chip,
at the canonical T=4 config in bf16 — both on the pmerged (always-exact)
sampling path for apples-to-apples, plus the live windowed fast path for
reference against BENCH.

Run ALONE (one TPU process at a time):
  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u \
      scripts/serve_probe.py > /tmp/serve_probe.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def time_fwd(fn, x, K: int = 10) -> float:
    """ms/call: enqueue K, one tiny readback (tunnel methodology)."""
    import jax.numpy as jnp

    out = fn(x)  # compile/warm
    np.asarray(out["pred_logits"].reshape(-1)[:1].astype(jnp.float32))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(x)["pred_logits"] for _ in range(K)]
        np.asarray(outs[-1].reshape(-1)[:1].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.infer.export import export_forward, load_exported, \
        save_exported
    from snipper_tpu.models.snipper import build_model, init_model

    cfg = Config.canonical_t4().replace(deform_impl="pmerged")
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)

    path = "/tmp/serve_canonical_bf16.stablehlo"
    size = save_exported(export_forward(cfg, params, batch_size=1), path)
    print(f"artifact: {size / 1e6:.1f} MB (canonical_t4, bf16, pmerged)",
          flush=True)

    x = np.random.default_rng(0).uniform(
        0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width, 3)
    ).astype(np.float32)

    # serving shape: jitted Exported.call, device-resident input
    run_art = load_exported(path)
    ms_art = time_fwd(run_art, jnp.asarray(x))
    print(f"artifact forward (jit): {ms_art:.1f} ms/snippet "
          f"({1e3 / ms_art:.2f} snippets/s)", flush=True)

    # naive shape: eager Exported.call, numpy input per request (per-call
    # re-dispatch + 23 MB host->device upload through the tunnel)
    run_art_eager = load_exported(path, jit_call=False)
    ms_eager = time_fwd(run_art_eager, x)
    print(f"artifact forward (eager, numpy in): {ms_eager:.1f} ms/snippet "
          f"({1e3 / ms_eager:.2f} snippets/s)", flush=True)

    jit_live = jax.jit(lambda xx: model.apply({"params": params}, xx))
    ms_live = time_fwd(jit_live, jnp.asarray(x))
    print(f"live jit (pmerged): {ms_live:.1f} ms/snippet "
          f"({1e3 / ms_live:.2f} snippets/s)", flush=True)

    wcfg = cfg.replace(deform_impl="windowed")
    wmodel = build_model(wcfg)  # same params; no second init pass
    jit_win = jax.jit(lambda xx: wmodel.apply({"params": params}, xx))
    ms_win = time_fwd(jit_win, jnp.asarray(x))
    print(f"live jit (windowed m5): {ms_win:.1f} ms/snippet "
          f"({1e3 / ms_win:.2f} snippets/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
