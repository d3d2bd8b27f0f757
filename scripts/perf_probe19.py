"""TPU probe 19: non-sampling forward split (round-3 VERDICT item 2).

The sampling-elided (impl="skip") canonical forward costs 14.2 ms/snippet;
this probe decomposes it by timing (enc_layers, dec_layers) grid points and
solving t = c0 + e*ce + d*cd:
  c0 = backbone + input_proj + posenc + heatmaps + query prep + heads
  ce = one encoder layer MINUS sampling (Dense/LN/FFN/softmax on 39.5k tok)
  cd = one decoder layer (self-attn over T*q tokens + heads cross work)
Also times the backbone-ish floor (enc=0, dec=1) and a conv-dtype variant.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe19.py > /tmp/probe19.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def time_forward(cfg, K=10):
    import jax
    import jax.numpy as jnp

    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    x = jnp.asarray(rng.uniform(
        0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width, 3)),
        jnp.bfloat16)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    out = fwd(params, x)
    np.asarray(out["pred_logits"][..., :1].astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fwd(params, x)["pred_logits"] for _ in range(K)]
    np.asarray(outs[-1][..., :1].astype(jnp.float32))
    return (time.perf_counter() - t0) / K * 1e3


def main():
    from snipper_tpu.config import Config

    base = Config.canonical_t4().replace(deform_impl="skip")
    pts = {}
    for e, d in ((6, 6), (1, 6), (6, 1), (1, 1), (0, 1), (0, 6)):
        try:
            ms = time_forward(base.replace(enc_layers=e, dec_layers=d))
            pts[(e, d)] = ms
            print(f"skip e={e} d={d}: {ms:7.2f} ms", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"skip e={e} d={d}: FAIL {type(ex).__name__}: {ex}"[:200],
                  flush=True)
    if (6, 6) in pts and (1, 6) in pts and (6, 1) in pts:
        ce = (pts[(6, 6)] - pts[(1, 6)]) / 5
        cd = (pts[(6, 6)] - pts[(6, 1)]) / 5
        c0 = pts[(6, 6)] - 6 * ce - 6 * cd
        print(f"per-enc-layer(sans sampling) = {ce:.2f} ms, "
              f"per-dec-layer = {cd:.2f} ms, fixed(c0) = {c0:.2f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
