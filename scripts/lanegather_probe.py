"""Hierarchical lane-gather probe (VERDICT r3 #3 — the last analytic-only
ceiling branch).

BASELINE.md dismissed the gather route as "per-(tap, y-candidate) masking
costs >= the XLA emitter" without a number. This module measures it. The
route mirrors what the reference's CUDA forward does per tap — fetch the
value row directly (`models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299`)
— in the only gather form this Mosaic toolchain lowers: the within-tile
[8, 128] lane gather (``jnp.take_along_axis`` on the lane axis of one
128-lane tile). Hierarchy:

  coarse  per-(segment, block) value window, already VMEM-staged (the
          windowed2d kernel layout, transposed to [D, Wd] so the gathered
          axis is the lane axis)
  fine    per source lane-tile t: in-bounds mask (id in [128t, 128t+128))
          + in-tile lane gather of the local index + weighted accumulate

Analytic framing (why this could win): per (query row, tap) the one-hot
select formulation costs 3 VPU ops x window width; the hierarchical
gather costs (Wd/128 tiles) x (D gather-elems + D select/madd) — a
constant 3*D/(3*128) = D/128 = 0.375 of the select work at D=48,
INDEPENDENT of window width — IF Mosaic's dynamic-gather retires
elements at VPU select rate. That throughput ratio is exactly what
``probe_primitive`` measures; ``probe_hier`` then times the full kernel
at the probe22 kernel-only fixture (NB=25, C=304, widths 896/512/384,
BH=32, D=48, 16 taps) so the number lands next to BASELINE.md's
14.85 ms (Pallas one-hot kernel floor) and 16.4 ms (shipped XLA 1D
windowed emitter).

Run (TPU, alone):
  PYTHONPATH=/root/.axon_site:/root/repo nohup python -u scripts/probe.py \
      lanegather > /tmp/lanegather.log 2>&1 &
"""

from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _readback(x):
    return np.asarray(x.reshape(-1)[:1].astype(jnp.float32))


def _time_ms(fn, *args, K: int = 8, repeats: int = 2) -> float:
    out = fn(*args)
    _readback(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        _readback(out)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


# ------------------------------------------------------------ primitive cost

def _chain_gather_kernel(x_ref, idx_ref, o_ref, *, n: int):
    x = x_ref[0]        # [R, 128] — Mosaic's gather lowers 2D only
    idx = idx_ref[0]
    for _ in range(n):
        # dependent chain: each gather consumes the previous result
        x = jnp.take_along_axis(x, idx, axis=1) + 1.0
    o_ref[0] = x


def _chain_select_kernel(x_ref, idx_ref, o_ref, *, n: int):
    # the one-hot build step the emitter floor is made of:
    # compare(broadcast id vs lane iota) + select + add = 3 VPU ops/elem
    x = x_ref[0]
    idx = idx_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for i in range(n):
        x = x + jnp.where(idx == lane - (i % 2), x, 0.0)
    o_ref[0] = x


def probe_primitive(K: int = 8, R: int = 512, n: int = 64,
                    grid: int = 64) -> dict:
    """ns/elem of a dependent in-tile lane-gather chain vs the equivalent
    compare+select+add chain, [R, 128] f32 tiles, `grid` independent
    blocks x `n` chained ops each."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, R, LANE)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, LANE, (grid, R, LANE)), jnp.int32)

    results = {}
    for name, kern in (("gather", _chain_gather_kernel),
                       ("select(3op)", _chain_select_kernel)):
        try:
            fn = jax.jit(lambda x, idx, kern=kern: pl.pallas_call(
                functools.partial(kern, n=n),
                grid=(grid,),
                in_specs=[pl.BlockSpec((1, R, LANE), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, R, LANE), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, R, LANE), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid, R, LANE), jnp.float32),
            )(x, idx))
            ms = _time_ms(fn, x, idx, K=K)
            elems = grid * R * LANE * n
            ns = ms * 1e6 / elems
            results[name] = ns
            print(f"  primitive {name:12s}: {ms:7.3f} ms / {n} chained ops "
                  f"on {grid}x[{R},128] = {ns:.4f} ns/elem", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = None
            print(f"  primitive {name:12s}: FAIL {type(e).__name__}: "
                  f"{e}"[:300], flush=True)
    if results.get("gather") and results.get("select(3op)"):
        print(f"  gather/select per-elem ratio: "
              f"{results['gather'] / results['select(3op)']:.2f}x "
              f"(win threshold < {LANE / 48:.2f}x at D=48)", flush=True)
    return results


# ------------------------------------------------- hierarchical gather kernel

def _hier_kernel_factory(n_levels: int, n_taps: int, lane_chunks: int):
    def kernel(*refs):
        wins = refs[:n_levels]                 # each [1, 1, D, Wd]
        ids = refs[n_levels:2 * n_levels]      # each [1, 1, n_taps, Cp]
        wgts = refs[2 * n_levels:3 * n_levels]
        out_ref = refs[-1]                     # [1, 1, D, Cp]
        D = out_ref.shape[2]
        chunks = []
        for c in range(lane_chunks):
            c0 = c * LANE
            acc = jnp.zeros((D, LANE), jnp.float32)
            for l in range(n_levels):
                winT = wins[l][0, 0]           # [D, Wd]
                id_c = ids[l][0, 0, :, c0:c0 + LANE]    # [n_taps, 128]
                wg_c = wgts[l][0, 0, :, c0:c0 + LANE]   # [n_taps, 128]
                Wd = winT.shape[1]
                for t in range(Wd // LANE):
                    tile = winT[:, t * LANE:(t + 1) * LANE]   # [D, 128]
                    local = id_c - t * LANE
                    inb = (local >= 0) & (local < LANE)
                    lidx = jnp.clip(local, 0, LANE - 1)
                    w_eff = jnp.where(inb, wg_c, 0.0)         # [n_taps,128]
                    for k in range(n_taps):
                        idxb = jnp.broadcast_to(lidx[k][None, :], (D, LANE))
                        g = jnp.take_along_axis(tile, idxb, axis=1)
                        acc = acc + w_eff[k][None, :] * g.astype(jnp.float32)
            chunks.append(acc)
        out_ref[0, 0] = jnp.concatenate(chunks, axis=1)

    return kernel


def hier_gather_sample(wins: Sequence[jax.Array], ids: Sequence[jax.Array],
                       wgts: Sequence[jax.Array], interpret: bool = False
                       ) -> jax.Array:
    """Kernel-only hierarchical gather: ``wins[l] [NB, BH, D, Wd]``
    (transposed, pre-staged), ``ids[l]/wgts[l] [NB, BH, n_taps, Cp]`` ->
    ``[NB, BH, D, Cp]`` f32 with
    ``out[..., :, c] = sum_l sum_k wgts[l][..., k, c] * wins[l][..., :, ids]``.
    """
    L = len(wins)
    NB, BH, D, _ = wins[0].shape
    n_taps, Cp = ids[0].shape[2], ids[0].shape[3]
    assert Cp % LANE == 0, Cp
    kern = _hier_kernel_factory(L, n_taps, Cp // LANE)
    in_specs = (
        [pl.BlockSpec((1, 1, D, w.shape[3]), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM) for w in wins]
        + [pl.BlockSpec((1, 1, n_taps, Cp), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)] * (2 * L))
    return pl.pallas_call(
        kern,
        grid=(NB, BH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, D, Cp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, BH, D, Cp), jnp.float32),
        interpret=interpret,
    )(*wins, *ids, *wgts)


def _fixture(NB: int, C: int, widths, BH: int = 32, D: int = 48,
             n_taps: int = 16, dtype=jnp.float32, seed: int = 0):
    """probe22's kernel-only fixture, in both layouts (one-hot [Wd, D] /
    ids [C, 16]; hierarchical transposed [D, Wd] / ids [16, Cp])."""
    rng = np.random.default_rng(seed)
    Cp = -(-C // LANE) * LANE
    wins, winsT, ids, idsT, wgts, wgtsT = [], [], [], [], [], []
    for Wd in widths:
        w = rng.standard_normal((NB, BH, Wd, D)).astype(np.float32)
        i = rng.integers(0, Wd, (NB, BH, C, n_taps)).astype(np.int32)
        g = rng.uniform(0, 1, (NB, BH, C, n_taps)).astype(np.float32)
        ip = np.zeros((NB, BH, Cp, n_taps), np.int32)
        gp = np.zeros((NB, BH, Cp, n_taps), np.float32)
        ip[:, :, :C] = i
        gp[:, :, :C] = g
        wins.append(jnp.asarray(w, dtype))
        winsT.append(jnp.asarray(w.transpose(0, 1, 3, 2), dtype))
        ids.append(jnp.asarray(i))
        idsT.append(jnp.asarray(ip.transpose(0, 1, 3, 2)))
        wgts.append(jnp.asarray(g))
        wgtsT.append(jnp.asarray(gp.transpose(0, 1, 3, 2)))
    return wins, winsT, ids, idsT, wgts, wgtsT, Cp


def _onehot_reference(wins, ids, wgts):
    """probe22's one-hot MXU kernel (the 14.85 ms floor) on the same data."""
    from snipper_tpu.ops.pallas_deform import _win2d_kernel_factory

    L = len(wins)
    NB, BH, _, D = wins[0].shape
    C, n_taps = ids[0].shape[2], ids[0].shape[3]
    in_specs = (
        [pl.BlockSpec((1, 1, w.shape[2], D), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM) for w in wins]
        + [pl.BlockSpec((1, 1, C, n_taps), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)] * (2 * L))
    return pl.pallas_call(
        _win2d_kernel_factory(L),
        grid=(NB, BH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, C, D), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, BH, C, D), jnp.float32),
    )(*wins, *ids, *wgts)


def probe_hier(K: int = 8) -> None:
    """Time the hierarchical kernel at the probe22 kernel-only fixtures and
    print it next to the one-hot kernel re-measured the same session.

    The third fixture uses the SHIPPED 1D windowed plan's actual widths at
    canonical scale/margin 5 (``windowed_sampling_plan([(75,100),(38,50),
    (19,25)], 512, 5)`` -> seg-0 windows [1664, 768, exact 475 -> padded
    512] = 23 lane tiles/tap) so the staging-free branch — run the gather
    kernel directly over the 1D plan the XLA emitter uses — is measured,
    not extrapolated.

    The fourth fixture is the FULL production op-call scale: NB=80 x
    Cp=128 = 10,240 query rows ~= the plan's 10,112 padded rows (7680 +
    1920 + 512), giving 5.80 G gather-elems / 15.4 G select-elems vs the
    real op-call's 5.78 G / 15.22 G — the scale at which the shipped XLA
    emitter measures 16.4 ms, so hier-vs-emitter reads off directly."""
    for (NB, C, widths) in ((25, 304, (896, 512, 384)),
                            (100, 80, (512, 384, 256)),
                            (25, 128, (1664, 768, 512)),
                            (80, 128, (1664, 768, 512))):
        wins, winsT, ids, idsT, wgts, wgtsT, Cp = _fixture(NB, C, widths)
        sel_g = 32 * NB * C * 16 * sum(widths) / 1e9
        gat_g = 32 * NB * Cp * 16 * sum(w // LANE for w in widths) \
            * 48 / 1e9
        label = f"NB={NB} C={C} widths={widths}"

        try:
            one = jax.jit(_onehot_reference)
            ms1 = _time_ms(one, wins, ids, wgts, K=K)
            print(f"  one-hot MXU kernel   {label}: {ms1:7.2f} ms "
                  f"({sel_g:.2f} G select-elems)", flush=True)
        except Exception as e:  # noqa: BLE001
            ms1 = None
            print(f"  one-hot MXU kernel   {label}: FAIL "
                  f"{type(e).__name__}: {e}"[:300], flush=True)

        try:
            hier = jax.jit(functools.partial(hier_gather_sample,
                                             interpret=False))
            out = hier(winsT, idsT, wgtsT)
            if ms1 is not None:
                ref = np.asarray(one(wins, ids, wgts))
                got = np.asarray(out).transpose(0, 1, 3, 2)[:, :, :C]
                err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
                assert err < 1e-5, f"hier kernel wrong: relerr {err:.2e}"
            ms2 = _time_ms(hier, winsT, idsT, wgtsT, K=K)
            note = f" ({ms2 / ms1:.2f}x one-hot)" if ms1 else ""
            print(f"  hierarchical gather  {label}: {ms2:7.2f} ms "
                  f"({gat_g:.2f} G gather-elems){note}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  hierarchical gather  {label}: FAIL "
                  f"{type(e).__name__}: {e}"[:300], flush=True)


def run(K: int = 8) -> None:
    print("lane-gather probe — BASELINE.md context: XLA 1D windowed emitter "
          "16.4 ms; one-hot Pallas kernel-only floor 14.85 ms", flush=True)
    print("[1] primitive per-element cost, in-tile lane gather vs "
          "compare/select/add:", flush=True)
    probe_primitive(K=K)
    print("[2] kernel-only encoder-scale fixtures:", flush=True)
    probe_hier(K=K)
