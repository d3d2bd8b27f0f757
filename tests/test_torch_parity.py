"""Full-model output parity: flax Snipper (with weights imported through the
torch-checkpoint converter) vs an independent PyTorch replica of the
reference architecture.

The torch replica below is written from the documented reference semantics
(SURVEY.md §3.2 call stack; reference models/model.py, deformable_transformer
.py, ms_deform_attn.py, backbone.py, position_encoding.py) and emits a state
dict with the reference's parameter naming — so this test exercises BOTH the
converter's name mapping and the numerical equivalence of every layer,
end to end, at float32.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.models.snipper import build_model
from snipper_tpu.train.checkpoint import import_torch_state_dict

CFG = Config(num_frames=2, num_future_frames=1, hidden_dim=96, nheads=4,
             enc_layers=1, dec_layers=2, dim_feedforward=128, num_queries=8,
             num_kpts=15, input_height=64, input_width=96, max_persons=4,
             backbone="resnet_test", dropout=0.0)
T1 = CFG.total_frames
L = CFG.num_feature_levels


# --------------------------------------------------------------- backbone
class FrozenBN(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n) * 0.1)
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * (self.running_var + 1e-5).rsqrt()
        return x * scale[None, :, None, None] + \
            (self.bias - self.running_mean * scale)[None, :, None, None]


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = FrozenBN(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = FrozenBN(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBN(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            FrozenBN(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + self.downsample(x))


class TorchResNet(nn.Module):
    """resnet_test spec: one bottleneck per stage."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = FrozenBN(64)
        cin = 64
        for s, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if s == 0 else 2
            setattr(self, f"layer{s + 1}",
                    nn.Sequential(Bottleneck(cin, planes, stride)))
            cin = planes * 4

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c3, c4, c5]


# ------------------------------------------------------ deformable pieces
def grid_sample_msda(value, shapes, loc, attn):
    """Pure-torch MSDA core (grid_sample, align_corners=False, zeros)."""
    B, S, H, D = value.shape
    _, Lq, _, Ln, P, _ = loc.shape
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    out = torch.zeros(B, Lq, H, D)
    for lvl, (h, w) in enumerate(shapes):
        v = vals[lvl].permute(0, 2, 3, 1).reshape(B * H, D, h, w)
        g = 2 * loc[:, :, :, lvl] - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * H, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        s = s.reshape(B, H, D, Lq, P)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3)
        out = out + torch.einsum("bhdqp,bhqp->bqhd", s, a)
    return out.reshape(B, Lq, H * D)


class TorchTemporalDeformAttn(nn.Module):
    def __init__(self, d, n_levels, n_heads, n_points, n_frames):
        super().__init__()
        self.d, self.L, self.H, self.P, self.T = (d, n_levels, n_heads,
                                                  n_points, n_frames)
        off = nn.Linear(d, n_heads * n_levels * n_points * 2)
        self.sampling_offsets = nn.ModuleList([off] * n_frames)
        w = nn.Linear(d, n_heads * n_levels * n_points)
        self.attention_weights = nn.ModuleList([w] * n_frames)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)

    def forward(self, query, ref, src, shapes, padding_mask=None):
        # query [B, T1, Lq, C], ref [B, T1, Lq, L, 2], src [B, T2, S, C]
        B, T1, Lq, C = query.shape
        T2 = src.shape[1]
        value = self.value_proj(src)
        if padding_mask is not None:  # [B, T2, S] True = pad
            value = value.masked_fill(padding_mask[..., None], 0.0)
        value = value.view(B, T2, -1, self.H, C // self.H)
        normalizer = torch.tensor([[w, h] for h, w in shapes],
                                  dtype=torch.float32)
        outs = []
        for t1 in range(T1):
            frames = ([t2 for t2 in (t1 - 1, t1, t1 + 1) if 0 <= t2 < self.T]
                      if t1 < self.T else list(range(T2)))
            logits = [self.attention_weights[t2](query[:, t1]).view(
                B, Lq, self.H, self.L, self.P) for t2 in frames]
            aw = torch.stack(logits, -1)
            aw = F.softmax(aw.flatten(3), -1).view(B, Lq, self.H, self.L,
                                                   self.P, len(frames))
            acc = 0
            for k, t2 in enumerate(frames):
                off = self.sampling_offsets[t2](query[:, t1]).view(
                    B, Lq, self.H, self.L, self.P, 2)
                off = off / normalizer[None, None, None, :, None, :]
                loc = ref[:, t1, :, None, :, None, :] + off
                acc = acc + grid_sample_msda(value[:, t2], shapes, loc,
                                             aw[..., k])
            outs.append(acc)
        return self.output_proj(torch.stack(outs, 1))


class TorchEncLayer(nn.Module):
    def __init__(self, d, ffn, L_, H_, P_, T_):
        super().__init__()
        self.self_attn = TorchTemporalDeformAttn(d, L_, H_, P_, T_)
        self.norm1 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos, ref, shapes, padding_mask=None):
        src = self.norm1(src + self.self_attn(src + pos, ref, src, shapes,
                                              padding_mask))
        return self.norm2(src + self.linear2(F.relu(self.linear1(src))))


class TorchDecLayer(nn.Module):
    def __init__(self, d, ffn, L_, H_, P_, T_):
        super().__init__()
        self.cross_attn = TorchTemporalDeformAttn(d, L_, H_, P_, T_)
        self.norm1 = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, H_, dropout=0.0)
        self.norm2 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, qpos, ref, src, shapes, padding_mask=None):
        B, t, lq, c = tgt.shape
        t2d = tgt.view(B, t * lq, c)
        p2d = qpos.reshape(B, t * lq, c)
        q = (t2d + p2d).transpose(0, 1)
        sa = self.self_attn(q, q, t2d.transpose(0, 1))[0].transpose(0, 1)
        tgt = self.norm2(t2d + sa).view(B, t, lq, c)
        ca = self.cross_attn(tgt + qpos, ref, src, shapes, padding_mask)
        tgt = self.norm1(tgt + ca)
        return self.norm3(tgt + self.linear2(F.relu(self.linear1(tgt))))


class TorchSnipper(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_dim
        self.cfg = cfg
        self.L = cfg.num_feature_levels
        self.T1 = cfg.num_frames + cfg.num_future_frames
        self.body = TorchResNet()
        chans = (512, 1024, 2048)
        projs = [nn.Sequential(nn.Conv2d(c, d, 1), nn.GroupNorm(32, d))
                 for c in chans[: self.L]]
        # extra pyramid levels: stride-2 3x3 conv, first from C5 then chained
        # (reference models/model.py:67-89 / deformable-DETR convention)
        cin = chans[-1]
        for _ in range(len(chans), self.L):
            projs.append(nn.Sequential(
                nn.Conv2d(cin, d, 3, stride=2, padding=1),
                nn.GroupNorm(32, d)))
            cin = d
        self.input_proj = nn.ModuleList(projs)
        self.query_embed = nn.Embedding(cfg.num_queries * self.T1, d * 2)
        self.level_embed = nn.Parameter(torch.randn(self.L, d))
        self.temporal_embed = nn.Parameter(torch.randn(self.T1, d))
        self.reference_points = nn.Linear(d, 2)
        self.enc = nn.ModuleList([
            TorchEncLayer(d, cfg.dim_feedforward, self.L, cfg.nheads,
                          cfg.enc_n_points, cfg.num_frames)
            for _ in range(cfg.enc_layers)])
        self.dec = nn.ModuleList([
            TorchDecLayer(d, cfg.dim_feedforward, self.L, cfg.nheads,
                          cfg.dec_n_points, cfg.num_frames)
            for _ in range(cfg.dec_layers)])
        self.class_embed = nn.Linear(d, 2)
        self.root_embed = nn.Linear(d, 4)
        self.joint_embed = nn.ModuleList(
            [nn.Linear(d, 4) for _ in range(cfg.num_kpts - 1)])

    @staticmethod
    def posenc3d(not_mask, feats):
        # not_mask [B, T, h, w] float
        z = not_mask.cumsum(1)
        y = not_mask.cumsum(2)
        x = not_mask.cumsum(3)
        eps, scale = 1e-6, 2 * math.pi
        z = z / (z[:, -1:] + eps) * scale
        y = y / (y[:, :, -1:] + eps) * scale
        x = x / (x[:, :, :, -1:] + eps) * scale
        dim_t = torch.arange(feats, dtype=torch.float32)
        dim_t = 10000 ** (2 * (dim_t // 2) / feats)

        def f(e):
            p = e[..., None] / dim_t
            return torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                               -1).flatten(-2)
        return torch.cat((f(z), f(y), f(x)), -1)

    def forward(self, images, mask=None):
        # images [B, T, H, W, 3]; mask [B, T, H, W] bool True = pad
        cfg = self.cfg
        L = self.L
        T1 = self.T1
        B, T, H, W = images.shape[:4]
        x = images.reshape(B * T, *images.shape[2:]).permute(0, 3, 1, 2)
        feats = self.body(x)
        projected = [self.input_proj[lvl](f_)
                     for lvl, f_ in enumerate(feats[:L])]
        extra = feats[-1]
        for lvl in range(len(feats), L):
            extra = self.input_proj[lvl](extra)
            projected.append(extra)
        srcs, poses, shapes, masks = [], [], [], []
        for lvl, s in enumerate(projected):
            n, c, h, w = s.shape
            shapes.append((h, w))
            srcs.append(s.reshape(B, T, c, h, w).permute(0, 1, 3, 4, 2))
            if mask is not None:
                # F.interpolate(nearest) convention: src = floor(dst*in/out)
                m = F.interpolate(mask.float().view(B * T, 1, H, W),
                                  size=(h, w)).bool().view(B, T, h, w)
            else:
                m = torch.zeros(B, T, h, w, dtype=torch.bool)
            masks.append(m)
            pe = self.posenc3d((~m).float(), c // 3)
            poses.append(pe + self.level_embed[lvl][None, None, None, None])
        src = torch.cat([s.reshape(B, T, -1, s.shape[-1]) for s in srcs], 2)
        pos = torch.cat([p.reshape(B, T, -1, p.shape[-1]) for p in poses], 2)
        if mask is not None:
            pad_flat = torch.cat([m.reshape(B, T, -1) for m in masks], 2)
            # per-level valid ratios from frame 0 (w_ratio, h_ratio)
            valid_ratios = torch.stack(
                [torch.stack([(~m[:, 0, 0, :]).sum(1) / m.shape[3],
                              (~m[:, 0, :, 0]).sum(1) / m.shape[2]], -1)
                 for m in masks], 1).float()           # [B, L, 2]
        else:
            pad_flat = None
            valid_ratios = torch.ones(B, L, 2)

        # encoder ref points (reference get_reference_points with
        # valid-ratio normalization, deformable_transformer.py:219-232)
        refs = []
        for lvl, (h, w) in enumerate(shapes):
            gy, gx = torch.meshgrid(torch.arange(h) + 0.5,
                                    torch.arange(w) + 0.5, indexing="ij")
            ry = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
            rx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
            refs.append(torch.stack([rx, ry], -1))      # [B, hw, 2]
        enc_ref = torch.cat(refs, 1)                     # [B, S, 2]
        enc_ref = enc_ref[:, :, None] * valid_ratios[:, None]  # [B, S, L, 2]
        enc_ref = enc_ref[:, None].expand(B, T, -1, L, -1)
        mem = src
        for layer in self.enc:
            mem = layer(mem, pos, enc_ref, shapes, pad_flat)

        # heatmaps: first num_kpts channels of each head of encoder memory
        heatmaps = []
        start = 0
        hd = cfg.hidden_dim // cfg.nheads
        for (h, w) in shapes:
            m_ = mem[:, :, start:start + h * w]
            start += h * w
            heatmaps.append(m_.reshape(B, T, h, w, cfg.nheads,
                                       hd)[..., : cfg.num_kpts])

        d = cfg.hidden_dim
        qe = self.query_embed.weight
        qpos, qobj = torch.split(qe, d, -1)
        qpos = qpos.reshape(T1, cfg.num_queries, d)[None].expand(B, -1, -1, -1)
        qpos = qpos + self.temporal_embed[None, :, None]
        qobj = qobj.reshape(T1, cfg.num_queries, d)[None].expand(
            B, -1, -1, -1).contiguous()
        ref = self.reference_points(qpos).sigmoid()

        out_logits, out_kpts = [], []
        output = qobj
        for lid, layer in enumerate(self.dec):
            ref_in = (ref[:, :, :, None, :]
                      * valid_ratios[:, None, None, :, :])
            output = layer(output, qpos, ref_in, mem, shapes, pad_flat)
            root4 = self.root_embed(output)
            inv = torch.logit(ref.clamp(1e-5, 1 - 1e-5))
            xy_logit = root4[..., 0:2] + inv
            roots = torch.sigmoid(torch.cat([xy_logit, root4[..., 2:4]], -1))
            joints = torch.stack([jl(output) for jl in self.joint_embed], -2)
            kpts = torch.cat([roots[..., None, :], joints], -2)
            out_logits.append(self.class_embed(output).transpose(1, 2))
            out_kpts.append(kpts.transpose(1, 2))
            ref = torch.sigmoid(xy_logit).detach()
        return out_logits[-1], out_kpts[-1], heatmaps


def _reference_state_dict(tm: TorchSnipper):
    """Rename the replica's params to the reference checkpoint naming."""
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("body."):
            nk = "backbone.0.body." + k[len("body."):]
            nk = nk.replace("layer1.0.downsample.0", "layer1.0.downsample.0")
        elif k.startswith("input_proj."):
            nk = k
        elif k == "query_embed.weight":
            nk = k
        elif k in ("level_embed", "temporal_embed"):
            nk = "transformer." + k
        elif k.startswith("reference_points."):
            nk = "transformer." + k
        elif k.startswith("enc."):
            nk = "transformer.encoder.layers." + k[len("enc."):]
        elif k.startswith("dec."):
            nk = "transformer.decoder.layers." + k[len("dec."):]
        elif k.startswith("class_embed."):
            nk = "class_embed.0." + k[len("class_embed."):]
        elif k.startswith("root_embed."):
            nk = "root_embed.0.layers.0." + k[len("root_embed."):]
        elif k.startswith("joint_embed."):
            j, rest = k[len("joint_embed."):].split(".", 1)
            nk = f"joint_embed.0.{j}.layers.0.{rest}"
        else:
            raise KeyError(k)
        # ModuleList-of-shared-module aliasing: sampling_offsets.0 etc.
        sd[nk] = v.detach().numpy()
    # downsample naming inside bottlenecks: replica uses
    # layerX.0.downsample.{0,1}; converter expects the same
    return sd


def _run_parity(cfg, with_mask=False, train_mode=False, check_heatmaps=False,
                seed=0):
    torch.manual_seed(seed)
    tm = TorchSnipper(cfg).eval()
    sd = _reference_state_dict(tm)
    params = import_torch_state_dict(sd, cfg, strict=True)

    model = build_model(cfg)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (2, cfg.num_frames, cfg.input_height,
                           cfg.input_width, 3)).astype(np.float32)
    mask = None
    if with_mask:
        # ragged right/bottom zero-padding per batch element, deliberately
        # NOT aligned to feature strides (exercises the floor-convention
        # nearest downsample and valid_ratios)
        mask = np.zeros((2, cfg.num_frames, cfg.input_height,
                         cfg.input_width), bool)
        mask[0, :, :, cfg.input_width - 27:] = True
        mask[0, :, cfg.input_height - 13:, :] = True
        mask[1, :, :, cfg.input_width - 5:] = True
        x = np.where(mask[..., None], 0.0, x)

    with torch.no_grad():
        t_logits, t_kpts, t_heat = tm(
            torch.from_numpy(x),
            torch.from_numpy(mask) if mask is not None else None)
    kw = {}
    if train_mode:  # dropout=0 configs: train path must equal eval
        kw = dict(train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    out = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(mask) if mask is not None else None, **kw)
    j_logits = np.asarray(out["pred_logits"])
    j_kpts = np.concatenate([np.asarray(out["pred_kpts2d"]),
                             np.asarray(out["pred_depth"])], -1)

    np.testing.assert_allclose(j_logits, t_logits.numpy(), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(j_kpts, t_kpts.numpy(), rtol=1e-3, atol=2e-4)
    if check_heatmaps:
        assert len(out["heatmaps"]) == cfg.num_feature_levels
        for lvl in range(cfg.num_feature_levels):
            np.testing.assert_allclose(
                np.asarray(out["heatmaps"][lvl]), t_heat[lvl].numpy(),
                rtol=1e-3, atol=2e-4)


def test_full_model_output_parity():
    _run_parity(CFG, check_heatmaps=True)


def test_full_model_parity_masked_4levels():
    """Padding masks + valid_ratios + the stride-2 extra feature level +
    the train codepath (dropout 0), none covered by the base test
    (reference models/model.py:106-221, util/misc.py:310-330)."""
    cfg = CFG.replace(num_feature_levels=4)
    _run_parity(cfg, with_mask=True, train_mode=True, check_heatmaps=True,
                seed=1)


def test_full_model_parity_t1():
    """T=1 canonical shape family (single-frame checkpoints)."""
    cfg = CFG.replace(num_frames=1, num_future_frames=0)
    _run_parity(cfg, seed=2)


def test_full_model_parity_masked_t4f2():
    """Masked T=4+2 (forecasting) shape family."""
    cfg = CFG.replace(num_frames=4, num_future_frames=2)
    _run_parity(cfg, with_mask=True, seed=3)
