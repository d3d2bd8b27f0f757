"""Snipper: single-stage spatiotemporal transformer for multi-person 3D pose
estimation, tracking and forecasting — TPU-native rebuild of the reference
``models/model.py`` ``SnipperDeformable``.

Input layout is TPU-native NHWC: a snippet batch ``[B, T, H, W, 3]`` (the
reference packs ``[B, T*3, H, W]``; converters live in snipper_tpu.data).
Everything runs in ONE jitted program with static shapes.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.models.position_encoding import position_encoding_3d
from snipper_tpu.models.resnet import RESNET_SPECS, ResNet
from snipper_tpu.models.transformer import DeformableTransformer, xavier_uniform


class InputProj(nn.Module):
    """1x1 conv + GroupNorm(32) level projection (reference
    ``models/model.py:67-89``); stride-2 3x3 for extra pyramid levels."""

    hidden_dim: int
    stride2: bool = False

    @nn.compact
    def __call__(self, x):
        if self.stride2:
            x = nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name="conv")(x)
        else:
            x = nn.Conv(self.hidden_dim, (1, 1), name="conv")(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(x)


class Snipper(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,                 # [B, T, H, W, 3] float in [0,1]
        mask: Optional[jnp.ndarray] = None,  # [B, T, H, W] bool True=pad
        train: bool = False,
        return_attn: bool = False,
    ):
        cfg = self.cfg
        B, T, H, W, _ = images.shape
        assert T == cfg.num_frames, (T, cfg.num_frames)
        C = cfg.hidden_dim

        # ---- backbone on folded frames ------------------------------------
        x = images.reshape(B * T, H, W, 3)
        taps = ResNet(RESNET_SPECS[cfg.backbone], name="backbone")(x)

        # ---- input projections + extra levels -----------------------------
        srcs: List[jnp.ndarray] = []
        for lvl in range(min(cfg.num_feature_levels, len(taps))):
            srcs.append(InputProj(C, name=f"input_proj{lvl}")(taps[lvl]))
        extra_src = taps[-1]
        for lvl in range(len(taps), cfg.num_feature_levels):
            extra_src = InputProj(C, stride2=True,
                                  name=f"input_proj{lvl}")(extra_src)
            srcs.append(extra_src)

        # ---- masks + position encodings per level -------------------------
        masks, pos_embeds = [], []
        n_pos_feats = C // 3
        for src in srcs:
            _, h, w, _ = src.shape
            if mask is not None:
                # nearest-neighbor downsample of the pad mask with TORCH's
                # convention src = floor(dst * in/out) (reference
                # ``F.interpolate(m.float(), size)`` , models/backbone.py:93;
                # jax.image.resize samples pixel centers, which differs on
                # non-block-aligned masks)
                iy = (jnp.arange(h) * H) // h
                ix = (jnp.arange(w) * W) // w
                m = mask[:, :, iy][:, :, :, ix]
            else:
                m = jnp.zeros((B, T, h, w), bool)
            masks.append(m)
            pe = position_encoding_3d(m, n_pos_feats)
            if pe.shape[-1] != C:  # hidden_dim not divisible by 3: zero-pad
                pe = jnp.pad(pe, [(0, 0)] * 4 + [(0, C - pe.shape[-1])])
            pos_embeds.append(pe.astype(src.dtype))
            # fold [B*T, h, w, C] -> [B, T, h, w, C]
        srcs = [s.reshape(B, T, *s.shape[1:]) for s in srcs]

        # ---- transformer ---------------------------------------------------
        t_total = cfg.total_frames
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (cfg.num_queries * t_total, 2 * C))
        tr = DeformableTransformer(
            d_model=C, n_heads=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            num_feature_levels=cfg.num_feature_levels,
            enc_n_points=cfg.enc_n_points, dec_n_points=cfg.dec_n_points,
            n_frames=cfg.num_frames, n_future_frames=cfg.num_future_frames,
            num_keypoints=cfg.num_kpts, dropout=cfg.dropout,
            impl=cfg.deform_impl, sample_dtype=cfg.deform_dtype,
            sampling_margin=cfg.sampling_margin,
            sampling_block=(cfg.sampling_block_h, cfg.sampling_block_w),
            remat_policy=cfg.remat_policy, name="transformer",
        )(srcs, masks if mask is not None else None, pos_embeds, query_embed,
          train=train)

        hs = tr["hs"]                    # [nl, B, T1, q, C]
        roots_raw = tr["roots_raw"]      # [nl, B, T1, q, 4] (xy logit, vis, d)
        nl = hs.shape[0]

        # ---- heads (shared across decoder layers, reference
        # models/model.py:93-104) ------------------------------------------
        class_linear = nn.Dense(2, name="class_embed")
        joint_linears = [nn.Dense(4, name=f"joint_embed{i}")
                        for i in range(cfg.num_kpts - 1)]

        logits = class_linear(hs)                        # [nl, B, T1, q, 2]
        logits = jnp.swapaxes(logits, 2, 3)              # [nl, B, q, T1, 2]

        roots = jax.nn.sigmoid(roots_raw)                # [nl, B, T1, q, 4]
        roots = jnp.swapaxes(roots, 2, 3)[..., None, :]  # [nl, B, q, T1, 1, 4]

        joints = jnp.stack([jl(hs) for jl in joint_linears], axis=-2)
        joints = jnp.swapaxes(joints, 2, 3)              # [nl, B, q, T1, K-1, 4]

        kpts = jnp.concatenate([roots, joints], axis=-2)  # [nl,B,q,T1,K,4]

        out = {
            "pred_logits": logits[-1],       # [B, q, T1, 2]
            "pred_kpts2d": kpts[-1, ..., 0:3],
            "pred_depth": kpts[-1, ..., 3:4],
            "heatmaps": tr["heatmaps"],      # [(B, T, h, w, nhead, K)]
        }
        if cfg.aux_loss and nl > 1:
            out["aux_logits"] = logits[:-1]        # [nl-1, B, q, T1, 2]
            out["aux_kpts2d"] = kpts[:-1, ..., 0:3]
            out["aux_depth"] = kpts[:-1, ..., 3:4]
        out["init_reference"] = tr["init_reference"]
        out["references"] = tr["references"]
        out["sampling_overflow"] = tr["sampling_overflow"]
        if return_attn:
            # per-decoder-layer (sampling_locations, attention_weights) for
            # visualization (reference attention_vis plumbing,
            # models/model.py:221 / ms_deform_attn.py:167-233); locations
            # are shared across sampled frames (shared projections)
            out["attn_data"] = tr["attn_data"]
        return out


def build_model(cfg: Config) -> Snipper:
    cfg.validate()
    return Snipper(cfg)


def init_model(cfg: Config, rng: jax.Array, batch_size: int = 1):
    """Initialize parameters with a dummy batch; returns (model, params)."""
    model = build_model(cfg)
    dummy = jnp.zeros((batch_size, cfg.num_frames, cfg.input_height,
                       cfg.input_width, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng}, dummy)["params"]
    return model, params
