"""Serving-time speed/accuracy tradeoff profiles (``--fast``).

Opt-in levers that raise throughput on a TRAINED canonical checkpoint
without retraining: each profile transforms the config and, where needed,
the trained parameter tree (VERDICT r4 #3). The per-chip EXACT-numerics
inference ceiling is ~13-16 snippets/s on v5e (BASELINE.md "North-star
status"); anything past it must give something up, and these profiles make
that tradeoff explicit and measured (BASELINE.md fast-profile table:
snippets/s + overfit-protocol 3DPCK delta per mode).

Profiles (comma-separated, e.g. ``--fast enc4,p2,r480``):

- ``m{N}``   : windowed-sampling margin N (below the default 5). Runtime
               exactness-guarded — the ExactnessGuard cascade re-runs any
               snippet whose overflow counter fires — so predictions stay
               exact; this is a latency lever, not an accuracy tradeoff.
- ``r{H}``   : input height H, width scaled by the config's aspect ratio.
               Checkpoint-compatible (sine position encodings and convs are
               resolution-agnostic); accuracy degrades away from the
               training resolution.
- ``enc{N}`` : truncate the encoder to its FIRST N layers, dropping the
               trained layers N..E-1 (the iterative-refinement decoder is
               kept whole — it produces the outputs).
- ``p{N}``   : keep the FIRST N of the P sampling points per (head, level)
               in every deformable-attention module; attention weights
               renormalize through the post-slice softmax (the op softmaxes
               over levels*points jointly, ops/deform_attn.py). The
               offset-bias init orders points by reach — point i starts at
               (i+1) px (reference ``ms_deform_attn.py:78-90``) — so the
               first points are the short-range taps.

The reference has no serving-time capacity levers beyond input resolution:
its ``inference.py:39-76`` fixes the canonical config, and its checkpoints
only load into the exact architecture that trained them.
"""

from __future__ import annotations

import re
from typing import Callable, Tuple

import numpy as np

from snipper_tpu.config import Config

_PROFILE_RE = re.compile(r"^(m|r|enc|p)(\d+)$")

PROFILE_HELP = (
    "comma-separated serving profiles applied to the config and the loaded "
    "checkpoint: m{N} (windowed margin N, exactness-guarded), r{H} (input "
    "height H, width by aspect), enc{N} (first N encoder layers), p{N} "
    "(first N sampling points per head/level). Example: enc4,p2,r480. "
    "Measured speed/accuracy costs: BASELINE.md fast-profile table."
)


def _truncate_encoder(n: int) -> Callable:
    def t(params):
        tr = dict(params["transformer"])
        drop = [k for k in tr if k.startswith("encoder_layer")
                and int(k[len("encoder_layer"):]) >= n]
        if not drop:
            raise ValueError(
                f"enc{n}: checkpoint has no encoder layers >= {n} to drop "
                f"(keys: {sorted(k for k in tr if 'encoder' in k)})")
        for k in drop:
            tr.pop(k)
        out = dict(params)
        out["transformer"] = tr
        return out

    return t


def _slice_points(orig: Config, p: int) -> Callable:
    """Slice the sampling_offsets / attention_weights projections of every
    deformable-attention module from P to the first ``p`` points.

    The Dense output dims are ordered (head, level, point[, xy]) — the
    module reshapes its output to ``[..., H, L, P, 2]`` / ``[..., H, L, P]``
    (models/transformer.py::TemporalDeformAttn), so the kernel columns and
    bias entries carry the same ordering.
    """
    H, L = orig.nheads, orig.num_feature_levels

    def slice_node(node, P):
        node = dict(node)
        off = dict(node["sampling_offsets"])
        k = np.asarray(off["kernel"])
        off["kernel"] = (k.reshape(k.shape[0], H, L, P, 2)[:, :, :, :p, :]
                         .reshape(k.shape[0], H * L * p * 2))
        b = np.asarray(off["bias"])
        off["bias"] = (b.reshape(H, L, P, 2)[:, :, :p, :]
                       .reshape(H * L * p * 2))
        node["sampling_offsets"] = off

        aw = dict(node["attention_weights"])
        k = np.asarray(aw["kernel"])
        aw["kernel"] = (k.reshape(k.shape[0], H, L, P)[:, :, :, :p]
                        .reshape(k.shape[0], H * L * p))
        b = np.asarray(aw["bias"])
        aw["bias"] = b.reshape(H, L, P)[:, :, :p].reshape(H * L * p)
        node["attention_weights"] = aw
        return node

    def t(params):
        out = dict(params)
        tr = dict(out["transformer"])
        hit = 0
        for key in list(tr):
            if key.startswith("encoder_layer"):
                lay = dict(tr[key])
                lay["self_attn"] = slice_node(lay["self_attn"],
                                              orig.enc_n_points)
                tr[key] = lay
                hit += 1
            elif key.startswith("decoder_layer"):
                lay = dict(tr[key])
                lay["cross_attn"] = slice_node(lay["cross_attn"],
                                               orig.dec_n_points)
                tr[key] = lay
                hit += 1
        if not hit:
            raise ValueError("p-profile: no encoder/decoder layers found "
                             "in the parameter tree")
        out["transformer"] = tr
        return out

    return t


def fast_profiles(cfg: Config, spec: str) -> Tuple[Config, Callable]:
    """Parse ``spec`` (e.g. ``"enc4,p2,r480"``) against ``cfg``.

    Returns ``(new_cfg, transform)`` where ``transform`` maps a parameter
    tree of the ORIGINAL config (a full trained checkpoint) to the new
    config's tree. Callers that init from scratch under ``new_cfg`` must
    NOT apply ``transform`` (the tree is already profile-shaped).
    """
    orig = cfg
    transforms = []
    names = [s.strip() for s in spec.split(",") if s.strip()]
    if not names:
        raise ValueError(f"--fast: empty profile spec {spec!r}")
    for name in names:
        m = _PROFILE_RE.match(name)
        if not m:
            raise ValueError(f"--fast: unknown profile {name!r} "
                             f"(expected m{{N}}/r{{H}}/enc{{N}}/p{{N}})")
        kind, n = m.group(1), int(m.group(2))
        if kind == "m":
            if n < 1:
                raise ValueError(f"--fast m{n}: margin must be >= 1")
            cfg = cfg.replace(sampling_margin=n)
        elif kind == "r":
            if n < 32:
                raise ValueError(f"--fast r{n}: input height too small")
            w = int(round(n * orig.input_width / orig.input_height / 2)) * 2
            cfg = cfg.replace(input_height=n, input_width=w)
        elif kind == "enc":
            if not 1 <= n < orig.enc_layers:
                raise ValueError(f"--fast enc{n}: need 1 <= N < "
                                 f"enc_layers ({orig.enc_layers})")
            cfg = cfg.replace(enc_layers=n)
            transforms.append(_truncate_encoder(n))
        elif kind == "p":
            if not 1 <= n < min(orig.enc_n_points, orig.dec_n_points):
                raise ValueError(
                    f"--fast p{n}: need 1 <= N < n_points "
                    f"(enc {orig.enc_n_points}, dec {orig.dec_n_points})")
            cfg = cfg.replace(enc_n_points=n, dec_n_points=n)
            transforms.append(_slice_points(orig, n))

    def transform(params):
        for t in transforms:
            params = t(params)
        return params

    return cfg, transform
