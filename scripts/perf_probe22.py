"""TPU probe 22: split the Pallas 2D-window cost — staging (XLA window
slices + ids/wgt relayouts) vs the kernel itself (pre-staged inputs).

Also times the s2d stem at canonical scale (probe20 follow-up).

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/perf_probe22.py > /tmp/probe22.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def readback_tiny(x):
    import jax.numpy as jnp

    return np.asarray(x.reshape(-1)[:1].astype(jnp.float32))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from snipper_tpu.ops.pallas_deform import _win2d_kernel_factory

    rng = np.random.default_rng(0)
    # seg0-equivalent shapes at blocks (15, 20): NB = 25, C = 300 -> Cp 304
    for (NB, C, widths) in ((25, 304, (896, 512, 384)),
                            (100, 80, (512, 384, 256)),
                            (15, 512, (1280, 640, 512))):
        BH = 32
        D = 48
        L = 3
        wins = [jnp.asarray(rng.standard_normal((NB, BH, Wd, D)),
                            jnp.bfloat16) for Wd in widths]
        ids = [jnp.asarray(rng.integers(0, Wd, (NB, BH, C, 16)), jnp.int32)
               for Wd in widths]
        wgts = [jnp.asarray(rng.uniform(0, 1, (NB, BH, C, 16)), jnp.float32)
                for _ in widths]

        def run(*bufs, NB=NB, C=C, widths=widths):
            ws, is_, gs = bufs[:L], bufs[L:2 * L], bufs[2 * L:]
            in_specs = (
                [pl.BlockSpec((1, 1, Wd, D), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM) for Wd in widths]
                + [pl.BlockSpec((1, 1, C, 16), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)] * (2 * L))
            return pl.pallas_call(
                _win2d_kernel_factory(L),
                grid=(NB, BH),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 1, C, D),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NB, BH, C, D), jnp.float32),
            )(*ws, *is_, *gs)

        fn = jax.jit(run)
        out = fn(*wins, *ids, *wgts)
        readback_tiny(out)
        K = 8
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*wins, *ids, *wgts)
        readback_tiny(out)
        ms = (time.perf_counter() - t0) / K * 1e3
        sel = BH * NB * C * 16 * sum(widths) / 1e9
        print(f"kernel-only NB={NB} C={C} widths={widths}: {ms:7.2f} ms "
              f"({sel:.2f} G select-elems -> "
              f"{sel / ms * 1e3:.1f} G/ms... {sel * 2 / (ms / 1e3) / 1e12:.2f}"
              f" Tops/s)", flush=True)

    # ---- s2d stem at canonical scale --------------------------------------
    from snipper_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.uniform(0, 1, (4, 600, 800, 3)), jnp.bfloat16)
    for s2d in (False, True):
        m = StemConv(64, s2d=s2d)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         m.init(jax.random.PRNGKey(0), x))
        f = jax.jit(lambda p, x, m=m: m.apply(p, x))
        readback_tiny(f(p, x))
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            out = f(p, x)
        readback_tiny(out)
        print(f"stem s2d={s2d}: {(time.perf_counter() - t0) / K * 1e3:6.2f} "
              f"ms", flush=True)

    # full backbone with s2d stem
    from snipper_tpu.models.resnet import RESNET_SPECS, ResNet

    for s2d in (False, True):
        net = ResNet(RESNET_SPECS["resnet50"], s2d_stem=s2d)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            net.init(jax.random.PRNGKey(0), x)["params"])
        f = jax.jit(lambda p, x, net=net: net.apply({"params": p}, x)[0])
        readback_tiny(f(params, x))
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            out = f(params, x)
        readback_tiny(out)
        print(f"backbone s2d={s2d}: "
              f"{(time.perf_counter() - t0) / K * 1e3:6.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
