"""TPU probe 3: level-merged point-merged one-hot sampling vs round-1 core.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/perf_probe3.py > /tmp/probe3.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np

SHAPES = [(75, 100), (38, 50), (19, 25)]
H, D, P = 8, 48, 4
B = 4
LQ = sum(h * w for h, w in SHAPES)


def timed(fn, args, K=6):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(K)]
    np.asarray(jax.tree.leaves(outs)[-1][..., :1].astype(jnp.float32))
    return (time.perf_counter() - t0) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_core,
                                             ms_deform_attn_fused)

    rng = np.random.default_rng(0)
    S = sum(h * w for h, w in SHAPES)
    val = rng.standard_normal((B, S, H, D)).astype(np.float32)
    loc = rng.uniform(0, 1, (B, LQ, H, len(SHAPES), P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, LQ, H, len(SHAPES), P)).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    def run(name, core, dtype, qc):
        f = jax.jit(functools.partial(core, spatial_shapes=tuple(SHAPES),
                                      query_chunk=qc))
        args = (jnp.asarray(val, dtype), jnp.asarray(loc, dtype),
                jnp.asarray(attn, dtype))
        try:
            ms = timed(lambda *a: f(a[0], sampling_locations=a[1],
                                    attention_weights=a[2]), args)
            ms = round(ms, 2)
        except Exception as e:  # noqa: BLE001
            ms = f"FAIL {type(e).__name__}: {e}"[:120]
        print(f"{name}: {ms}", flush=True)

    run("core  bf16 qc=1024", ms_deform_attn_core, jnp.bfloat16, 1024)
    for qc in (512, 1024, 2048, 4096, 12000):
        run(f"fused bf16 qc={qc}", ms_deform_attn_fused, jnp.bfloat16, qc)
    run("fused f32  qc=1024", ms_deform_attn_fused, jnp.float32, 1024)
    run("fused f32  qc=2048", ms_deform_attn_fused, jnp.float32, 2048)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
