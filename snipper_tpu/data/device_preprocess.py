"""Device-side (XLA) snippet preprocessing — the north-star "fused XLA
preprocessing graph".

The reference preprocesses on the host with cv2 (``inference_utils.py:
143-195``: imread, BGR->RGB, center affine to the input shape, /255). The
host pipeline here (``infer/pipeline.py:load_snippet_samples``) reproduces
that with a C++/numpy warp; this module moves the warp + normalization onto
the TPU so the host only decodes JPEGs — on a 1-core host the warp
otherwise dominates the input pipeline once the model is fast.

TPU-first formulation: the inference transform is an AXIS-ALIGNED affine
(center crop-resize, rot=0), so the bilinear warp is separable and becomes
two small weighted-one-hot matmuls

    out[y, x, c] = sum_{sy, sx} Wy[y, sy] * Wx[x, sx] * img[sy, sx, c]

with ``Wy [out_h, H]`` / ``Wx [out_w, W]`` carrying the two bilinear taps
per row (zero-border validity folded in) — built on device from the
runtime affine with two iota compares each, exactly matching
``data/transforms.py:warp_affine`` (cv2.warpAffine INTER_LINEAR
semantics). No gathers, MXU-friendly, one fused XLA program per
(image-size, input-size) pair.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(m_scale, m_off, out_size: int, src_size: int):
    """Bilinear weight matrix [out_size, src_size] for src = m_scale * dst
    + m_off along one axis, zero outside [0, src_size)."""
    dst = jnp.arange(out_size, dtype=jnp.float32)
    s = m_scale * dst + m_off
    s0 = jnp.floor(s)
    f = s - s0
    src = jnp.arange(src_size, dtype=jnp.float32)[None, :]
    w0 = (1.0 - f)[:, None] * (src == s0[:, None])
    w1 = f[:, None] * (src == (s0[:, None] + 1.0))
    return w0 + w1  # invalid taps simply match no column -> zero border


@functools.partial(jax.jit, static_argnames=("out_shape", "do_flip"))
def warp_affine_device(imgs: jax.Array, inv_trans: jax.Array,
                       out_shape: Tuple[int, int],
                       do_flip: bool = False) -> jax.Array:
    """Warp ``imgs [..., H, W, C]`` by an AXIS-ALIGNED inverse affine
    ``inv_trans [2, 3]`` (dst->src, i.e. ``src_x = m[0,0]*x + m[0,2]``,
    ``src_y = m[1,1]*y + m[1,2]``; ``m[0,1]``/``m[1,0]`` must be zero — the
    no-rotation inference transform) to ``out_shape (out_h, out_w)``,
    divides by 255 (reference ``generate_patch_image``,
    ``datasets/transforms.py:137-144``). ``do_flip`` mirrors x first.
    """
    out_h, out_w = out_shape
    H, W = imgs.shape[-3], imgs.shape[-2]
    x = imgs.astype(jnp.float32)
    if do_flip:
        x = x[..., :, ::-1, :]
    wy = _axis_weights(inv_trans[1, 1], inv_trans[1, 2], out_h, H)
    wx = _axis_weights(inv_trans[0, 0], inv_trans[0, 2], out_w, W)
    # exact f32 contractions (image values up to 255; default bf16 MXU
    # precision would round visibly)
    out = jnp.einsum("oh,...hwc->...owc", wy, x,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,...owc->...opc", wx, out,
                     precision=jax.lax.Precision.HIGHEST)
    return out / 255.0


def invert_axis_aligned(trans: np.ndarray) -> np.ndarray:
    """Invert a 2x3 axis-aligned forward affine (dst = trans @ src)."""
    t = np.asarray(trans, np.float64)
    assert abs(t[0, 1]) < 1e-9 and abs(t[1, 0]) < 1e-9, (
        "device warp supports axis-aligned transforms only")
    inv = np.zeros((2, 3), np.float32)
    inv[0, 0] = 1.0 / t[0, 0]
    inv[1, 1] = 1.0 / t[1, 1]
    inv[0, 2] = -t[0, 2] / t[0, 0]
    inv[1, 2] = -t[1, 2] / t[1, 1]
    return inv


def preprocess_snippet_device(raw_imgs: np.ndarray, trans: np.ndarray,
                              input_shape: Tuple[int, int]) -> jax.Array:
    """Device equivalent of the host path in ``load_snippet_samples``:
    uint8 frames ``[T, H, W, 3]`` + the FORWARD center-crop affine ->
    normalized ``[T, out_h, out_w, 3]`` on device."""
    inv = invert_axis_aligned(trans)
    return warp_affine_device(jnp.asarray(raw_imgs), jnp.asarray(inv),
                              tuple(input_shape))


def warp_train_batch_device(raw: jax.Array, inv: jax.Array,
                            color: jax.Array,
                            out_shape: Tuple[int, int]) -> jax.Array:
    """GENERAL (rotation-capable) fused train preprocessing on device:
    flip (folded into ``inv`` by ``transforms.fold_flip_inverse``) +
    bilinear warp + /255 + per-channel color scale + clip — the device
    equivalent of the host ``native_ops.warp_patch`` (reference
    ``generate_patch_image`` + color jitter, ``datasets/transforms.py:
    137-144``).

    ``raw [B, T, H, W, 3]`` uint8 (zero-PADDED to a shared batch shape —
    zero padding IS the warp's zero border, so padding needs no size
    bookkeeping), ``inv [B, T, 2, 3]`` dst->src affines,
    ``color [B, 3]``. Returns ``[B, T, out_h, out_w, 3]`` float32 in
    [0, 1].

    The train augmentation rotates (±25°, ``get_aug_config``), which
    couples the two axes — the separable two-matmul trick of
    :func:`warp_affine_device` does not apply. The sampling is the
    4-corner bilinear gather (one batched ``take_along_axis`` per corner
    over the flattened frame): XLA's TPU gather pays a ~4 KiB tile read
    per row, bounding this at roughly out_pixels * 4 corners * 4 KiB of
    HBM traffic — ~10 ms/frame at 600x800, small next to the ~1 s train
    step it fuses into, and it frees the host core for decoding (the
    measured train bottleneck on 1-core hosts, BASELINE.md round-5).
    Meant to be called INSIDE the jitted train step so XLA fuses the
    normalization into the backbone's first conv input.
    """
    out_h, out_w = out_shape
    B, T, H, W, C = raw.shape
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    m = inv[..., None, None]                       # [B, T, 2, 3, 1, 1]
    sx = (m[:, :, 0, 0] * xs[None, None, None, :]
          + m[:, :, 0, 1] * ys[None, None, :, None] + m[:, :, 0, 2])
    sy = (m[:, :, 1, 0] * xs[None, None, None, :]
          + m[:, :, 1, 1] * ys[None, None, :, None] + m[:, :, 1, 2])
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    flat = raw.reshape(B, T, H * W, C).astype(jnp.float32)
    out = jnp.zeros((B, T, out_h, out_w, C), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
            idx = (jnp.clip(yi, 0, H - 1) * W
                   + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
            g = jnp.take_along_axis(
                flat, idx.reshape(B, T, -1, 1), axis=2)
            w = ((fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
                 * valid)
            out = out + w[..., None] * g.reshape(B, T, out_h, out_w, C)
    out = out / 255.0 * color[:, None, None, None, :]
    return jnp.clip(out, 0.0, 1.0)
