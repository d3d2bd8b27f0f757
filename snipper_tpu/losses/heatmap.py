"""Device-side Gaussian-blurred keypoint heatmap targets.

Replaces the reference's host-ish per-sample/per-frame/per-joint Python loops
(reference ``models/model.py:448-482``) with one batched scatter + a static
reflect-padded separable blur, all inside the jitted step.

Blur semantics follow ``torchvision.transforms.functional.gaussian_blur``
exactly: ``sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8``, normalized Gaussian
kernel, reflect padding (the reference calls ``TF.gaussian_blur`` at
``models/model.py:478``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def heatmap_kernel_size(h: int, w: int) -> int:
    """Reference ``models/model.py:456`` — clamped to >= 1 so tiny feature
    maps (h, w < 10, below anything the reference ever ran) degrade to an
    identity blur instead of a negative kernel size."""
    k = max(h // 10 + (h // 10) % 2 - 1, w // 10 + (w // 10) % 2 - 1)
    return max(k, 1)


def _reflect_index(j: int, size: int) -> int:
    """Index under repeated 'reflect' (mirror-without-edge) padding."""
    if size == 1:
        return 0
    period = 2 * size - 2
    j = j % period
    if j < 0:
        j += period
    return j if j < size else period - j


@functools.lru_cache(maxsize=None)
def blur_matrix(size: int, ksize: int) -> np.ndarray:
    """Dense ``[size, size]`` matrix applying a 1D reflect-padded Gaussian
    blur (row i of the output = blurred row i)."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    x = np.linspace(-half, half, ksize)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    kernel = (pdf / pdf.sum()).astype(np.float32)
    B = np.zeros((size, size), np.float32)
    for i in range(size):
        for k in range(ksize):
            B[i, _reflect_index(i + k - ksize // 2, size)] += kernel[k]
    return B


def scatter_keypoint_maps(
    kpts2d: jnp.ndarray,   # [B, M, T, K, 3] normalized (x, y, vis)
    valid: jnp.ndarray,    # [B, M]
    t_frames: int,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Binary keypoint occupancy maps ``[B, T, h, w, K]`` over the observed
    frames, matching reference ``generate_heatmap`` (models/model.py:454-474):
    a pixel is 1 if any visible keypoint of that type truncates into it."""
    B, M, _, K, _ = kpts2d.shape
    k = kpts2d[:, :, :t_frames]
    x = (k[..., 0] * w).astype(jnp.int32)   # trunc toward 0, matches .long()
    y = (k[..., 1] * h).astype(jnp.int32)
    vis = (k[..., 2] > 0) & valid[:, :, None, None]
    ok = vis & (x >= 0) & (x < w) & (y >= 0) & (y < h)
    flat = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)  # [B, M, T, K]

    maps = jnp.zeros((B, t_frames, h * w, K), jnp.float32)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 2)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 3)
    maps = maps.at[b_idx, t_idx, flat, k_idx].add(ok.astype(jnp.float32))
    maps = jnp.minimum(maps, 1.0)  # set-to-1 semantics under overlap
    return maps.reshape(B, t_frames, h, w, K)


def gaussian_blur_maps(maps: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Separable reflect-padded Gaussian blur over (h, w) of
    ``[B, T, h, w, K]`` via two static blur matrices (exact f32)."""
    h, w = maps.shape[2], maps.shape[3]
    By = jnp.asarray(blur_matrix(h, ksize))
    Bx = jnp.asarray(blur_matrix(w, ksize))
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ij,btjwk->btiwk", By, maps, precision=hp)
    out = jnp.einsum("ij,btujk->btuik", Bx, out, precision=hp)
    return out


def heatmap_targets(kpts2d, valid, t_frames, h, w):
    maps = scatter_keypoint_maps(kpts2d, valid, t_frames, h, w)
    return gaussian_blur_maps(maps, heatmap_kernel_size(h, w))
