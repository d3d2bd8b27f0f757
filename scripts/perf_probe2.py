"""TPU probe 2: isolated deformable-sampling microbenchmarks at encoder
scale + compiled-HLO inspection.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/perf_probe2.py > /tmp/probe2.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np

SHAPES = [(75, 100), (38, 50), (19, 25)]   # canonical 600x800 strides 8/16/32
H, D, P = 8, 48, 4
B = 4            # folded batch (T=4 frames at bs=1)
LQ = sum(h * w for h, w in SHAPES)          # 9875


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

    from snipper_tpu.ops.deform_attn import ms_deform_attn_core

    rng = np.random.default_rng(0)
    S = sum(h * w for h, w in SHAPES)
    val = rng.standard_normal((B, S, H, D)).astype(np.float32)
    loc = rng.uniform(0, 1, (B, LQ, H, len(SHAPES), P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, LQ, H, len(SHAPES), P)).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    cases = {}

    def run(name, dtype, qc, max_s, shapes=SHAPES, only_level=None):
        if only_level is not None:
            sh = [shapes[only_level]]
            s0 = sum(h * w for h, w in shapes[:only_level])
            s1 = s0 + sh[0][0] * sh[0][1]
            v = val[:, s0:s1]
            lo = loc[:, :, :, only_level:only_level + 1]
            at = attn[:, :, :, only_level:only_level + 1]
        else:
            sh, v, lo, at = shapes, val, loc, attn
        f = jax.jit(functools.partial(
            ms_deform_attn_core, spatial_shapes=tuple(sh),
            query_chunk=qc, onehot_max_s=max_s))
        args = (jnp.asarray(v, dtype), jnp.asarray(lo, dtype),
                jnp.asarray(at, dtype))
        try:
            ms = timed(lambda *a: f(a[0], sampling_locations=a[1],
                                    attention_weights=a[2]), args)
        except Exception as e:  # noqa: BLE001
            ms = f"FAIL {type(e).__name__}"
        cases[name] = ms
        print(f"{name}: {ms if isinstance(ms, str) else round(ms, 2)} ms",
              flush=True)
        return f, args

    # dtype x chunking sweeps, one-hot everywhere
    run("onehot bf16 qc=1024", jnp.bfloat16, 1024, 8192)
    run("onehot bf16 qc=512", jnp.bfloat16, 512, 8192)
    run("onehot bf16 qc=256", jnp.bfloat16, 256, 8192)
    run("onehot bf16 qc=2048", jnp.bfloat16, 2048, 8192)
    run("onehot f32 qc=1024", jnp.float32, 1024, 8192)
    run("onehot f32 qc=341", jnp.float32, 341, 8192)
    # gather for level0, onehot for the rest
    run("gatherL0 bf16 qc=1024", jnp.bfloat16, 1024, 2048)
    run("all-gather bf16 qc=1024", jnp.bfloat16, 1024, 0)
    # per-level isolation
    run("L0-only bf16 qc=1024", jnp.bfloat16, 1024, 8192, only_level=0)
    run("L0-only f32 qc=1024", jnp.float32, 1024, 8192, only_level=0)
    run("L12-only bf16 qc=1024", jnp.bfloat16, 1024, 8192, only_level=1)
    run("L2-only bf16 qc=1024", jnp.bfloat16, 1024, 8192, only_level=2)

    # compiled HLO for the hot config (what does XLA turn the one-hot into?)
    f = jax.jit(functools.partial(
        ms_deform_attn_core, spatial_shapes=tuple([SHAPES[0]]),
        query_chunk=100000, onehot_max_s=8192))
    v = jnp.asarray(val[:, :7500], jnp.bfloat16)
    lo = jnp.asarray(loc[:, :2048, :, 0:1], jnp.bfloat16)
    at = jnp.asarray(attn[:, :2048, :, 0:1], jnp.bfloat16)
    try:
        txt = f.lower(v, sampling_locations=lo,
                      attention_weights=at).compile().as_text()
        with open("/tmp/onehot_hlo.txt", "w") as fh:
            fh.write(txt)
        import re

        kinds = {}
        for m in re.finditer(r"= \S+ (\w+)\(", txt):
            kinds[m.group(1)] = kinds.get(m.group(1), 0) + 1
        print("HLO op histogram (top):",
              sorted(kinds.items(), key=lambda kv: -kv[1])[:15], flush=True)
        print("has gather:", "gather(" in txt, "| has dot:", "dot(" in txt,
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"HLO dump failed: {type(e).__name__}: {e}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
