"""TPU probe 16: base_chunk sweep at margin 5 (full canonical forward).

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python perf_probe16.py > /tmp/probe16.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import snipper_tpu.ops.deform_attn as da
    from snipper_tpu.config import Config
    from snipper_tpu.models.snipper import init_model

    rng = np.random.default_rng(0)
    orig = da.ms_deform_attn_windowed

    for bc in (512, 384, 256, 768):
        def patched(*a, _bc=bc, **k):
            k.setdefault("base_chunk", _bc)
            return orig(*a, **k)

        da.ms_deform_attn_windowed = patched
        try:
            cfg = Config.canonical_t4().replace(deform_impl="windowed")
            model, params = init_model(cfg, jax.random.PRNGKey(0))
            params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            x = jnp.asarray(rng.uniform(
                0, 1, (1, cfg.num_frames, cfg.input_height, cfg.input_width,
                       3)), jnp.bfloat16)
            fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
            out = fwd(params, x)
            np.asarray(out["pred_logits"][..., :1].astype(jnp.float32))
            ovf = float(np.asarray(out["sampling_overflow"]))
            K = 10
            t0 = time.perf_counter()
            outs = [fwd(params, x)["pred_logits"] for _ in range(K)]
            np.asarray(outs[-1][..., :1].astype(jnp.float32))
            ms = (time.perf_counter() - t0) / K * 1e3
            print(f"bc={bc}: {ms:6.1f} ms/snippet ({1e3 / ms:5.2f} "
                  f"snippets/s) overflow={ovf}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bc={bc}: FAIL {type(e).__name__}: {e}"[:200], flush=True)
        finally:
            da.ms_deform_attn_windowed = orig
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
