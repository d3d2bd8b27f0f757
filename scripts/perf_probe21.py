"""TPU probe 21: Pallas 2D-window kernel sweep at encoder scale vs the
shipped 1D windowed XLA path (probe18 baseline: 16.4 ms at margin 5).

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe21.py > /tmp/probe21.log 2>&1 &
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from perf_probe18 import bench, make_inputs_4px  # noqa: E402


def main():
    import jax

    from snipper_tpu.ops.deform_attn import ms_deform_attn_windowed
    from snipper_tpu.ops.pallas_deform import ms_deform_attn_windowed2d_pallas

    value, shapes, loc, attn = make_inputs_4px()
    segs = tuple(h * w for h, w in shapes)

    fn = jax.jit(functools.partial(
        ms_deform_attn_windowed, value, shapes, query_segments=segs,
        base_chunk=512, margin_px=5))
    ms, ov = bench(fn, loc, attn)
    print(f"1D bc=512 m=5: {ms:7.2f} ms  overflow={ov}", flush=True)

    for (bh, bw) in ((8, 10), (8, 12), (15, 20), (8, 20), (5, 10), (10, 13),
                     (4, 8), (16, 20), (8, 16)):
        for margin in (5, 8):
            fn = jax.jit(functools.partial(
                ms_deform_attn_windowed2d_pallas, value, shapes,
                query_segments=segs, block_h=bh, block_w=bw,
                margin_px=margin, interpret=False))
            try:
                ms, ov = bench(fn, loc, attn)
                print(f"pallas2D b=({bh:2d},{bw:2d}) m={margin}: {ms:7.2f} ms"
                      f"  overflow={ov}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"pallas2D b=({bh},{bw}) m={margin}: FAIL "
                      f"{type(e).__name__}: {e}"[:300], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
