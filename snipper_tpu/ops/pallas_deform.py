"""Pallas TPU kernels for deformable-attention sampling.

Design notes (what is and is not expressible on this Mosaic toolchain —
probed empirically, see BASELINE.md):

- Arbitrary VMEM gathers (``take_along_axis`` with mismatched shapes, or
  sublane gathers) are NOT lowerable — only the within-tile [8, 128]
  lane-gather compiles. A CUDA-style fused bilinear-gather kernel is
  therefore not available; large levels use the XLA corner-packed gather
  (ops/deform_attn.py).

- What IS fast on the MXU: sampling as a **weighted-one-hot contraction**.
  ``out[r] = sum_s W[r, s] * v[s]`` where ``W`` has four bilinear-weighted
  nonzeros per row. This kernel builds each [R_BLK, 128] W tile on the fly
  (iota compare against the corner indices) and feeds the MXU directly.

MEASURED OUTCOME (v5e): the kernel compiles and is numerically exact, but
the per-tile compare/select chain runs on the VPU serially with the MXU and
loses to XLA's version of the same formulation by 4-6x — XLA fuses the
one-hot construction into the dot operand (no W materialization) and
pipelines it better. The production default therefore stays
``deform_impl='xla'`` (ops/deform_attn.py, which uses exactly this
weighted-one-hot for small levels and corner-packed gathers for large
ones); this kernel is kept as the starting point for a future Mosaic with
either working VMEM gathers or cheaper masked-iota generation.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLK = 512
S_TILE = 128


def _kernel(ids_ref, wgt_ref, v_ref, out_ref):
    """One (bh, r-block): out[R_BLK, D] = sum_s W[R_BLK, s] v[s, D].
    Block refs carry a leading length-1 grid dim."""
    S = v_ref.shape[1]
    D = v_ref.shape[2]
    ids = ids_ref[0]                     # [R_BLK, 4] int32
    wgt = wgt_ref[0]                     # [R_BLK, 4] f32

    def body(t, acc):
        s0 = t * S_TILE
        lane = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, S_TILE), 1) + s0
        w_tile = jnp.zeros((R_BLK, S_TILE), jnp.float32)
        for c in range(4):
            w_tile = w_tile + jnp.where(
                ids[:, c:c + 1] == lane, wgt[:, c:c + 1], 0.0)
        v_tile = v_ref[0, pl.ds(s0, S_TILE), :]
        # f32 inputs must not silently drop to the bf16 MXU default
        # (measured ~3e-3 rel error); HIGHEST = full-precision passes
        prec = (None if v_tile.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        return acc + jax.lax.dot_general(
            w_tile.astype(v_tile.dtype), v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)

    out_ref[0] = jax.lax.fori_loop(0, S // S_TILE, body,
                                   jnp.zeros((R_BLK, D), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def weighted_onehot_sample(v: jax.Array, ids: jax.Array, wgt: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """``v [BH, S, D]``, ``ids [BH, R, 4]`` int32 (corner pixel indices,
    < S), ``wgt [BH, R, 4]`` f32 -> ``[BH, R, D]`` f32.

    R must be padded to a multiple of R_BLK by the caller (extra rows with
    wgt 0); S is padded to a multiple of 128 here.
    """
    BH, S, D = v.shape
    R = ids.shape[1]
    assert R % R_BLK == 0, R
    s_pad = (-S) % S_TILE
    if s_pad:
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0)))
    grid = (BH, R // R_BLK)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R_BLK, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_BLK, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + s_pad, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_BLK, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, R, D), jnp.float32),
        interpret=interpret,
    )(ids, wgt, v)


def ms_deform_attn_pallas(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    onehot_max_s: int = 32768,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for ``ms_deform_attn_core`` using the Pallas weighted-one-hot
    kernel per level.

    ``onehot_max_s`` bounds the per-level VMEM value block
    (``[S, D] f32`` = 6.3 MB at the 32768 default with D=48, within the
    ~16 MB/core budget alongside the one-hot tiles); larger levels are
    rejected (use ``deform_impl='xla'``, whose corner-packed gather handles
    any size). Covers every shipped config up to ~1080p inputs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, S, nH, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    value_hm = value.transpose(0, 2, 1, 3)             # [B, H, S, D]
    out = jnp.zeros((B, Lq, nH * D), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(value_hm, start, start + h * w, axis=2)
        start += h * w
        loc = sampling_locations[:, :, :, lvl]          # [B, Lq, H, P, 2]
        attn = attention_weights[:, :, :, lvl]
        if h * w > onehot_max_s:
            raise NotImplementedError(
                f"level {lvl} ({h}x{w}) exceeds onehot_max_s="
                f"{onehot_max_s}; use deform_impl='xla' for this config")
        x = loc[..., 0].astype(jnp.float32) * w - 0.5
        y = loc[..., 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ids, wgts = [], []
        for dy in (0, 1):
            for dx in (0, 1):
                cw = ((1.0 - jnp.abs(x - x0 - dx))
                      * (1.0 - jnp.abs(y - y0 - dy)))
                valid = ((x0 + dx >= 0) & (x0 + dx < w)
                         & (y0 + dy >= 0) & (y0 + dy < h))
                wgts.append(cw * valid.astype(cw.dtype))
                xi = jnp.clip(x0 + dx, 0, w - 1)
                yi = jnp.clip(y0 + dy, 0, h - 1)
                ids.append((yi * w + xi).astype(jnp.int32))
        ids = jnp.stack(ids, -1)                         # [B, Lq, H, P, 4]
        wgt = jnp.stack(wgts, -1) * attn.astype(jnp.float32)[..., None]

        # fold to [BH, R, 4]
        ids = ids.transpose(0, 2, 1, 3, 4).reshape(B * nH, Lq * P, 4)
        wgt = wgt.transpose(0, 2, 1, 3, 4).reshape(B * nH, Lq * P, 4)
        R = Lq * P
        r_pad = (-R) % R_BLK
        if r_pad:
            ids = jnp.pad(ids, ((0, 0), (0, r_pad), (0, 0)))
            wgt = jnp.pad(wgt, ((0, 0), (0, r_pad), (0, 0)))
        part = weighted_onehot_sample(
            v.reshape(B * nH, h * w, D), ids, wgt, interpret=interpret)
        part = part[:, :R].reshape(B, nH, Lq, P, D).sum(3)
        out = out + part.transpose(0, 2, 1, 3).reshape(B, Lq, nH * D)
    return out.astype(value.dtype)
