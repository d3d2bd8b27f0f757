"""TPU probe 8b: window-plan sweep (fixed tuple handling).

Run ALONE after probe8: PYTHONPATH=/root/.axon_site:/root/repo nohup python perf_probe8b.py > /tmp/probe8b.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import numpy as np

from perf_probe7 import make_inputs


def main():
    import jax

    from snipper_tpu.ops.deform_attn import (ms_deform_attn_windowed,
                                             windowed_sampling_plan)

    value, shapes, loc, attn = make_inputs()
    segs = tuple(h * w for h, w in shapes)

    for bc in (1024, 512, 384, 256, 768):
        for margin in (8, 6, 7):
            _, qcs, wins = windowed_sampling_plan(shapes, bc, margin)
            fn = jax.jit(functools.partial(
                ms_deform_attn_windowed, value, shapes, query_segments=segs,
                base_chunk=bc, margin_px=margin))
            try:
                out, ov = fn(sampling_locations=loc, attention_weights=attn)
                np.asarray(out[..., :1].astype("float32"))
                K = 8
                t0 = time.perf_counter()
                for _ in range(K):
                    out, ov = fn(sampling_locations=loc,
                                 attention_weights=attn)
                np.asarray(out[..., :1].astype("float32"))
                ms = (time.perf_counter() - t0) / K * 1e3
                ovf = float(np.asarray(ov))
                print(f"bc={bc:5d} m={margin}: {ms:7.2f} ms  overflow={ovf}"
                      f"  wins={wins} qcs={qcs}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bc={bc} m={margin}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
