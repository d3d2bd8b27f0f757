"""TPU probe 24: throughput of the two new presets (light_t4, light_t1)
completing the shipped-checkpoint-matrix table in BASELINE.md
(probe14/15/16 measured the other four + recipes).

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe24.py > /tmp/probe24.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    for name, mk in (("light_t4", Config.light_t4),
                     ("light_t1", Config.light_t1)):
        try:
            cfg = mk().replace(deform_impl="windowed")
            model, params = init_model(cfg, jax.random.PRNGKey(0))
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            x = jnp.asarray(rng.uniform(0, 1, (1, cfg.num_frames,
                                               cfg.input_height,
                                               cfg.input_width, 3)),
                            jnp.bfloat16)
            fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
            out = fwd(params, x)
            np.asarray(out["pred_logits"][..., :1].astype(jnp.float32))
            ovf = float(np.asarray(out["sampling_overflow"]))
            best = float("inf")
            for _ in range(2):
                K = 8
                t0 = time.perf_counter()
                outs = [fwd(params, x)["pred_logits"] for _ in range(K)]
                np.asarray(outs[-1][..., :1].astype(jnp.float32))
                best = min(best, (time.perf_counter() - t0) / K * 1e3)
            print(f"{name:10s}: {best:6.1f} ms/snippet ({1e3 / best:5.2f} "
                  f"snippets/s) overflow={ovf} "
                  f"[{cfg.input_height}x{cfg.input_width} T={cfg.num_frames}"
                  f"+{cfg.num_future_frames} enc{cfg.enc_layers}/"
                  f"dec{cfg.dec_layers}]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
