"""3D (t, y, x) sinusoidal position encoding.

Counterpart of the reference ``PositionEmbeddingSine``
(``models/position_encoding.py:20-63``): cumulative-sum embeddings over the
frame, row and column axes of the (non-padded) mask, each normalized to
``[0, 2*pi]`` and expanded into ``hidden_dim // 3`` sin/cos features; the
final channel order is ``(z, y, x)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_encoding_3d(
    mask: jnp.ndarray,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """Compute the 3D sine embedding.

    Args:
      mask: ``[B, T, h, w]`` bool, True on padded pixels.
      num_pos_feats: features per axis (``hidden_dim // 3``).

    Returns:
      ``[B, T, h, w, 3 * num_pos_feats]`` with channel order (z, y, x).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    z_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    if normalize:
        eps = 1e-6
        z_embed = z_embed / (z_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def _feat(e):
        p = e[..., None] / dim_t                      # [B, T, h, w, F]
        # interleave sin(even) / cos(odd) exactly as the reference's
        # stack+flatten (position_encoding.py:59-61). For ODD F the two
        # strided halves differ by one channel (the reference's torch.stack
        # would crash there, e.g. hidden_dim=256 -> F=85): pad to even,
        # interleave, slice back — identical values for even F.
        if p.shape[-1] % 2:
            p = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, 1)])
        out = jnp.stack(
            (jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])), axis=-1
        ).reshape(*p.shape[:-1], -1)
        return out[..., :num_pos_feats]

    return jnp.concatenate((_feat(z_embed), _feat(y_embed), _feat(x_embed)),
                           axis=-1)
