"""Temporal deformable transformer (encoder/decoder) in flax.

Counterpart of the reference ``models/deformable_transformer.py`` and the
temporal MSDeformAttn module (``models/ops/modules/ms_deform_attn.py``),
re-designed for XLA: no per-frame Python loops in the hot path (the neighbor
structure is a static adjacency folded into value aggregation, see
snipper_tpu.ops.deform_attn), static shapes everywhere, one traced program.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name

from snipper_tpu.ops.deform_attn import temporal_adjacency, temporal_deform_sample

xavier_uniform = nn.initializers.xavier_uniform()


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Matches reference ``util/misc.py:481-485``."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Initial sampling offsets uniformly distributed over head directions,
    scaled by point index (reference ``ms_deform_attn.py:78-90``)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)      # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class TemporalDeformAttn(nn.Module):
    """Multi-scale temporal deformable attention.

    The reference keeps per-frame ModuleLists of offset/weight Linears that
    all alias ONE shared module (``ms_deform_attn.py:68-71``); here that
    sharing is explicit: a single pair of projections, with the per-frame
    neighbor sampling expressed through the static adjacency.
    """

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    n_frames: int          # observed frames T2
    impl: str = "xla"
    sampling_margin: int = 8     # windowed-sampling margin rows; must cover
                                 # max |learned offset| + 1 (init bias max
                                 # component = 4 px -> 5 is exact at init);
                                 # overflow is counted at runtime
    sampling_block: Tuple[int, int] = (8, 20)  # windowed2d query-block rect
    sample_dtype: str = "auto"   # "float32": run the sampling op in f32
                                 # regardless of activation dtype (bf16
                                 # (16,128) tiling around the remat'd chunk
                                 # scan is the measured mixed-precision
                                 # train cliff; see BASELINE.md)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # [B, T1, Lq, C]
        reference_points: jnp.ndarray,  # [B, T1, Lq, L, 2] in [0, 1]
        value_feats: jnp.ndarray,       # [B, T2, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
        padding_mask: Optional[jnp.ndarray] = None,  # [B, T2, S] True=pad
        return_attn: bool = False,
        query_segments: Optional[Tuple[int, ...]] = None,
    ):
        B, T1, Lq, C = query.shape
        _, T2, S, _ = value_feats.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // H

        value = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                         name="value_proj")(value_feats)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(B, T2, S, H, D)

        off = nn.Dense(
            H * L * P * 2, kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(H, L, P), dtype),
            name="sampling_offsets")(query)
        off = off.reshape(B, T1, Lq, H, L, P, 2)
        # normalize offsets by (W_l, H_l) (reference ms_deform_attn.py:126-164)
        normalizer = jnp.asarray(
            [(w, h) for h, w in spatial_shapes], jnp.float32)  # [L, 2]
        off = off / normalizer[None, None, None, None, :, None, :]
        loc = reference_points[:, :, :, None, :, None, :] + off

        logits = nn.Dense(H * L * P, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="attention_weights")(query)
        logits = logits.reshape(B, T1, Lq, H, L, P)

        adjacency = temporal_adjacency(self.n_frames, T1)  # static numpy
        if self.sample_dtype == "float32":
            value = value.astype(jnp.float32)
            loc = loc.astype(jnp.float32)
            logits = logits.astype(jnp.float32)
        out, overflow = temporal_deform_sample(
            value, spatial_shapes, loc, logits, adjacency, impl=self.impl,
            query_segments=query_segments, margin_px=self.sampling_margin,
            block_hw=self.sampling_block)
        out = checkpoint_name(out, "deform_out")
        out = out.astype(query.dtype)
        out = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                       name="output_proj")(out)
        if return_attn:
            # per-frame sampling locations/weights are identical across
            # sampled frames (shared projections); expose the shared ones
            attn = jax.nn.softmax(
                logits.reshape(B, T1, Lq, H, L * P), -1
            ).reshape(B, T1, Lq, H, L, P)
            return out, overflow, (loc, attn)
        return out, overflow


class TorchMultiheadAttention(nn.Module):
    """Standard MHA with torch's packed qkv parameterization
    (``in_proj_weight [3C, C]``) so checkpoints convert 1:1. Dropout is
    applied to attention probabilities, as in torch."""

    d_model: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        # q, k, v: [B, N, C]
        C, H = self.d_model, self.n_heads
        D = C // H
        in_w = self.param("in_proj_weight", xavier_uniform, (3 * C, C))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))

        def proj(x, i):
            w = jax.lax.dynamic_slice_in_dim(in_w, i * C, C, 0)   # [C, C]
            b = jax.lax.dynamic_slice_in_dim(in_b, i * C, C, 0)
            return x @ w.T + b

        qh = proj(q, 0).reshape(*q.shape[:-1], H, D)
        kh = proj(k, 1).reshape(*k.shape[:-1], H, D)
        vh = proj(v, 2).reshape(*v.shape[:-1], H, D)
        # Precision.HIGH: the TPU MXU default silently truncates f32
        # operands to bf16 (CLAUDE.md invariant; preferred_element_type
        # only fixes the ACCUMULATOR dtype) — without it the f32
        # (--no-mixed_precision) path loses ~1e-3 in the decoder self-attn
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGH)
        logits = logits / math.sqrt(D)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGH)
        out = out.reshape(*q.shape[:-1], C).astype(q.dtype)
        return nn.Dense(C, name="out_proj",
                        kernel_init=nn.initializers.xavier_uniform())(out)


class EncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    n_frames: int
    dropout: float = 0.1
    impl: str = "xla"
    sample_dtype: str = "auto"
    sampling_margin: int = 8
    sampling_block: Tuple[int, int] = (8, 20)

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 padding_mask=None, train: bool = False):
        # deformable self-attention (reference EncoderLayer.forward :200-210);
        # encoder queries are the level-concatenated pixel grid, so pass the
        # per-level segments to enable windowed sampling
        segments = tuple(h * w for h, w in spatial_shapes)
        src2, overflow = TemporalDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.n_frames, impl=self.impl, sample_dtype=self.sample_dtype,
            sampling_margin=self.sampling_margin,
            sampling_block=self.sampling_block, name="self_attn")(
                src + pos, reference_points, src, spatial_shapes,
                padding_mask, query_segments=segments)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(src2)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)

        # ffn
        h = nn.relu(nn.Dense(self.d_ffn, name="linear1",
                             kernel_init=nn.initializers.xavier_uniform())(src))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="linear2",
                     kernel_init=nn.initializers.xavier_uniform())(h)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src), overflow


class DecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    n_frames: int
    dropout: float = 0.1
    impl: str = "xla"
    sample_dtype: str = "auto"
    sampling_margin: int = 8

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask=None, train: bool = False):
        B, T1, Lq, C = tgt.shape
        # self-attention over all (frame, slot) tokens
        # (reference DecoderLayer.forward :282-287)
        t2d = tgt.reshape(B, T1 * Lq, C)
        p2d = query_pos.reshape(B, T1 * Lq, C)
        q = k = t2d + p2d
        tgt2 = TorchMultiheadAttention(self.d_model, self.n_heads,
                                       self.dropout, name="self_attn")(
                                           q, k, t2d, train=train)
        t2d = t2d + nn.Dropout(self.dropout, deterministic=not train)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(t2d).reshape(B, T1, Lq, C)

        # temporal deformable cross-attention (:289-295); decoder queries are
        # unordered slots — always exact (no windowing)
        tgt2, _, attn_data = TemporalDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.n_frames, impl=self.impl, sample_dtype=self.sample_dtype,
            sampling_margin=self.sampling_margin, name="cross_attn")(
                tgt + query_pos, reference_points, src, spatial_shapes,
                src_padding_mask, return_attn=True)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        # ffn
        h = nn.relu(nn.Dense(self.d_ffn, name="linear1",
                             kernel_init=nn.initializers.xavier_uniform())(tgt))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="linear2",
                     kernel_init=nn.initializers.xavier_uniform())(h)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt), attn_data


def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,  # [B, L, 2] (w_ratio, h_ratio)
) -> jnp.ndarray:
    """Per-pixel reference points, reference ``get_reference_points``
    (``deformable_transformer.py:219-232``). Returns ``[B, S, L, 2]``."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack((gx, gy), -1))          # [B, hw, 2]
    ref = jnp.concatenate(refs, 1)                    # [B, S, 2]
    return ref[:, :, None] * valid_ratios[:, None]    # [B, S, L, 2]


class DeformableTransformer(nn.Module):
    """Top-level transformer (reference ``DeformableTransformer:20-167``)."""

    d_model: int
    n_heads: int
    num_encoder_layers: int
    num_decoder_layers: int
    dim_feedforward: int
    num_feature_levels: int
    enc_n_points: int
    dec_n_points: int
    n_frames: int
    n_future_frames: int
    num_keypoints: int
    dropout: float = 0.1
    impl: str = "xla"
    sample_dtype: str = "auto"
    sampling_margin: int = 8
    sampling_block: Tuple[int, int] = (8, 20)
    # rematerialize encoder/decoder layers in the backward pass: the
    # deformable-sampling intermediates (gathered corners, one-hot
    # matrices) otherwise get saved per chunk per layer and blow HBM at
    # training time (measured 168GB at canonical scale)
    remat: bool = True
    # remat policy: "full" recomputes everything in the backward;
    # "save_sampling" keeps each layer's (small) deformable-sampling
    # output as a residual so the expensive select-bound sampling forward
    # is not recomputed during the layer's backward (~60 MB/layer at
    # canonical scale — measured 20-22% faster steps on v5e, BASELINE.md).
    # Default matches Config.remat_policy (single source of truth).
    remat_policy: str = "save_sampling"

    @nn.compact
    def __call__(
        self,
        srcs: List[jnp.ndarray],        # per level [B, T, h, w, C]
        masks: Optional[List[jnp.ndarray]],  # per level [B, T, h, w] True=pad
        pos_embeds: List[jnp.ndarray],  # per level [B, T, h, w, C]
        query_embed: jnp.ndarray,       # [num_queries*(T+Tf), 2C]
        train: bool = False,
    ):
        B, T, _, _, C = srcs[0].shape
        L = self.num_feature_levels
        spatial_shapes = tuple((s.shape[2], s.shape[3]) for s in srcs)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (L, self.d_model))
        t_total = self.n_frames + self.n_future_frames
        temporal_embed = self.param("temporal_embed", xavier_uniform,
                                    (t_total, self.d_model))

        # flatten levels -> [B, T, S, C]
        src_flat = jnp.concatenate(
            [s.reshape(B, T, -1, C) for s in srcs], axis=2)
        pos_flat = jnp.concatenate(
            [(p + level_embed[lvl][None, None, None, None, :]).reshape(B, T, -1, C)
             for lvl, p in enumerate(pos_embeds)], axis=2)
        if masks is not None:
            mask_flat = jnp.concatenate(
                [m.reshape(B, T, -1) for m in masks], axis=2)
            valid_ratios = jnp.stack(
                [jnp.stack([jnp.sum(~m[:, 0, 0, :], 1) / m.shape[3],
                            jnp.sum(~m[:, 0, :, 0], 1) / m.shape[2]], -1)
                 for m in masks], axis=1).astype(jnp.float32)  # [B, L, 2]
        else:
            mask_flat = None
            valid_ratios = jnp.ones((B, L, 2), jnp.float32)

        # ---- encoder -------------------------------------------------------
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        enc_ref = jnp.broadcast_to(enc_ref[:, None],
                                   (B, T, enc_ref.shape[1], L, 2))
        # static_argnums for flax nn.remat count self as arg 0:
        # (self, src, pos, ref, spatial_shapes=4, padding_mask, train=6)
        policy = (jax.checkpoint_policies.save_only_these_names(
            "deform_out") if self.remat_policy == "save_sampling" else None)
        enc_cls = (nn.remat(EncoderLayer, static_argnums=(4, 6),
                            policy=policy)
                   if self.remat else EncoderLayer)
        memory = src_flat
        sampling_overflow = jnp.zeros((), jnp.float32)
        for i in range(self.num_encoder_layers):
            memory, ov = enc_cls(
                self.d_model, self.dim_feedforward, L, self.n_heads,
                self.enc_n_points, self.n_frames, self.dropout,
                impl=self.impl, sample_dtype=self.sample_dtype,
                sampling_margin=self.sampling_margin,
                sampling_block=self.sampling_block,
                name=f"encoder_layer{i}")(
                    memory, pos_flat, enc_ref, spatial_shapes, mask_flat,
                    train)
            sampling_overflow = sampling_overflow + ov

        # ---- heatmaps from encoder memory ---------------------------------
        # first num_keypoints channels of each head
        # (reference deformable_transformer.py:140-149)
        heatmaps = []
        start = 0
        hd = self.d_model // self.n_heads
        for (h, w) in spatial_shapes:
            m = jax.lax.slice_in_dim(memory, start, start + h * w, axis=2)
            start += h * w
            m = m.reshape(B, T, h, w, self.n_heads, hd)
            heatmaps.append(m[..., : self.num_keypoints])

        # ---- decoder -------------------------------------------------------
        n_query = query_embed.shape[0] // t_total
        query_pos, query_obj = jnp.split(query_embed, 2, axis=-1)
        query_pos = query_pos.reshape(t_total, n_query, C)[None]
        query_pos = jnp.broadcast_to(query_pos, (B, t_total, n_query, C))
        query_pos = query_pos + temporal_embed[None, :, None, :]
        query_obj = query_obj.reshape(t_total, n_query, C)[None]
        query_obj = jnp.broadcast_to(query_obj, (B, t_total, n_query, C))

        ref_linear = nn.Dense(
            2, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name="reference_points")
        reference_points = jax.nn.sigmoid(ref_linear(query_pos))  # [B,T1,q,2]
        init_reference = reference_points

        # shared root head, also used for iterative refinement
        # (reference models/model.py:95-104 — ONE Linear shared across all
        # decoder layers and installed into the decoder)
        root_linear = nn.Dense(4, name="root_embed")

        # (self, tgt, query_pos, ref, src, spatial_shapes=5, mask, train=7)
        dec_cls = (nn.remat(DecoderLayer, static_argnums=(5, 7),
                            policy=policy)
                   if self.remat else DecoderLayer)
        hs, refs_in, roots_raw, attn_all = [], [], [], []
        output = query_obj
        for i in range(self.num_decoder_layers):
            ref_input = (reference_points[:, :, :, None, :]
                         * valid_ratios[:, None, None, :, :])
            output, attn_data = dec_cls(
                self.d_model, self.dim_feedforward, L, self.n_heads,
                self.dec_n_points, self.n_frames, self.dropout,
                impl=self.impl, sample_dtype=self.sample_dtype,
                sampling_margin=self.sampling_margin,
                name=f"decoder_layer{i}")(
                    output, query_pos, ref_input, memory, spatial_shapes,
                    mask_flat, train)
            root4 = root_linear(output)                # [B, T1, q, 4]
            xy_logit = root4[..., 0:2] + inverse_sigmoid(reference_points)
            hs.append(output)
            refs_in.append(reference_points)
            roots_raw.append(jnp.concatenate(
                [xy_logit, root4[..., 2:4]], axis=-1))
            attn_all.append(attn_data)
            # iterative refinement (reference decoder :329-333)
            reference_points = jax.lax.stop_gradient(jax.nn.sigmoid(xy_logit))

        return {
            "hs": jnp.stack(hs),                       # [nl, B, T1, q, C]
            "roots_raw": jnp.stack(roots_raw),         # [nl, B, T1, q, 4]
            "heatmaps": heatmaps,
            "init_reference": init_reference,
            "references": jnp.stack(refs_in),          # per-layer input refs
            "attn_data": attn_all,
            # dropped-tap count of windowed sampling (0 for exact impls);
            # consumers of impl="windowed" must check this is zero
            "sampling_overflow": sampling_overflow,
        }
