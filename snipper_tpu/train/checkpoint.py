"""Checkpointing: Orbax save/restore + PyTorch state-dict import.

The reference saves ``{model, optimizer, lr_scheduler, epoch, args}`` via
``torch.save`` on rank 0 each epoch (reference ``main.py:260-273``,
``util/misc.py:395-397``) and resumes with ``--resume``
(``main.py:242-248``). Here: Orbax for native checkpoints, plus an importer
that maps the reference's torch parameter names onto the flax tree so the six
shipped checkpoints (reference README.md:28-38) load directly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import jax
import numpy as np


# --------------------------------------------------------------------------
# orbax native checkpoints
# --------------------------------------------------------------------------
def save_checkpoint(ckpt_dir: str, state, epoch: int, keep: int = 100):
    """Save one epoch checkpoint; retain only the newest ``keep`` (the
    rotation torch users get by overwriting ``checkpoint.pth``,
    reference ``main.py:260-265``)."""
    import shutil

    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, f"checkpoint{epoch:04d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state),
                   force=True)
    if jax.process_index() == 0:
        existing = sorted(
            d for d in os.listdir(ckpt_dir)
            if re.fullmatch(r"checkpoint\d{4}", d))
        for stale in existing[:-keep] if keep > 0 else []:
            shutil.rmtree(os.path.join(ckpt_dir, stale), ignore_errors=True)
    return path


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=target)


def latest_checkpoint(ckpt_dir: str):
    """Newest ``checkpointNNNN`` under ``ckpt_dir``, or None.

    Backs ``--resume auto``: one command line serves both the first start
    and an auto-restart after preemption (the reference requires a manual
    ``--resume .../checkpoint.pth``, reference ``main.py:242-248``)."""
    if not os.path.isdir(ckpt_dir):
        return None
    existing = sorted(d for d in os.listdir(ckpt_dir)
                      if re.fullmatch(r"checkpoint\d{4}", d))
    return os.path.join(ckpt_dir, existing[-1]) if existing else None


# --------------------------------------------------------------------------
# torch -> flax import
# --------------------------------------------------------------------------
def _t(x):  # torch Linear weight [out, in] -> flax kernel [in, out]
    return np.asarray(x).T


def _conv(x):  # torch conv OIHW -> flax HWIO
    return np.transpose(np.asarray(x), (2, 3, 1, 0))


def torch_key_map(cfg) -> Dict[str, tuple]:
    """Mapping: reference state-dict key -> (flax path tuple, transform).

    Reference naming per ``models/model.py`` / ``models/backbone.py`` /
    ``models/deformable_transformer.py``; shared modules (per-frame
    offset/weight Linears, per-layer heads) are aliases — index 0 is used.
    """
    m: Dict[str, tuple] = {}

    # ---- backbone (torchvision resnet inside backbone.0.body) -------------
    def bn(src, dst):
        for k in ("weight", "bias", "running_mean", "running_var"):
            m[f"{src}.{k}"] = (dst + (k,), np.asarray)

    B = "backbone.0.body"
    m[f"{B}.conv1.weight"] = (("backbone", "conv1", "kernel"), _conv)
    bn(f"{B}.bn1", ("backbone", "bn1"))
    from snipper_tpu.models.resnet import RESNET_SPECS

    layers = RESNET_SPECS[cfg.backbone]
    for s in range(4):
        for b in range(layers[s]):
            src = f"{B}.layer{s + 1}.{b}"
            dst = ("backbone", f"layer{s + 1}_{b}")
            for c in (1, 2, 3):
                m[f"{src}.conv{c}.weight"] = (dst + (f"conv{c}", "kernel"),
                                              _conv)
                bn(f"{src}.bn{c}", dst + (f"bn{c}",))
            if b == 0:
                m[f"{src}.downsample.0.weight"] = (
                    dst + ("downsample_conv", "kernel"), _conv)
                bn(f"{src}.downsample.1", dst + ("downsample_bn",))

    # ---- input projections --------------------------------------------
    for lvl in range(cfg.num_feature_levels):
        src = f"input_proj.{lvl}"
        dst = (f"input_proj{lvl}",)
        m[f"{src}.0.weight"] = (dst + ("conv", "kernel"), _conv)
        m[f"{src}.0.bias"] = (dst + ("conv", "bias"), np.asarray)
        m[f"{src}.1.weight"] = (dst + ("norm", "scale"), np.asarray)
        m[f"{src}.1.bias"] = (dst + ("norm", "bias"), np.asarray)

    # ---- queries + heads ----------------------------------------------
    m["query_embed.weight"] = (("query_embed",), np.asarray)
    m["class_embed.0.weight"] = (("class_embed", "kernel"), _t)
    m["class_embed.0.bias"] = (("class_embed", "bias"), np.asarray)
    m["root_embed.0.layers.0.weight"] = (
        ("transformer", "root_embed", "kernel"), _t)
    m["root_embed.0.layers.0.bias"] = (
        ("transformer", "root_embed", "bias"), np.asarray)
    for j in range(cfg.num_kpts - 1):
        m[f"joint_embed.0.{j}.layers.0.weight"] = (
            (f"joint_embed{j}", "kernel"), _t)
        m[f"joint_embed.0.{j}.layers.0.bias"] = (
            (f"joint_embed{j}", "bias"), np.asarray)

    # ---- transformer globals ------------------------------------------
    TR = "transformer"
    m[f"{TR}.level_embed"] = ((TR, "level_embed"), np.asarray)
    m[f"{TR}.temporal_embed"] = ((TR, "temporal_embed"), np.asarray)
    m[f"{TR}.reference_points.weight"] = ((TR, "reference_points", "kernel"),
                                          _t)
    m[f"{TR}.reference_points.bias"] = ((TR, "reference_points", "bias"),
                                        np.asarray)

    # ---- encoder / decoder layers -------------------------------------
    def deform_attn(src, dst):
        # per-frame ModuleLists alias ONE module — import index 0
        m[f"{src}.sampling_offsets.0.weight"] = (
            dst + ("sampling_offsets", "kernel"), _t)
        m[f"{src}.sampling_offsets.0.bias"] = (
            dst + ("sampling_offsets", "bias"), np.asarray)
        m[f"{src}.attention_weights.0.weight"] = (
            dst + ("attention_weights", "kernel"), _t)
        m[f"{src}.attention_weights.0.bias"] = (
            dst + ("attention_weights", "bias"), np.asarray)
        for p in ("value_proj", "output_proj"):
            m[f"{src}.{p}.weight"] = (dst + (p, "kernel"), _t)
            m[f"{src}.{p}.bias"] = (dst + (p, "bias"), np.asarray)

    def norms_ffn(src, dst, norm_ids):
        for n in norm_ids:
            m[f"{src}.norm{n}.weight"] = (dst + (f"norm{n}", "scale"),
                                          np.asarray)
            m[f"{src}.norm{n}.bias"] = (dst + (f"norm{n}", "bias"),
                                        np.asarray)
        for lin in ("linear1", "linear2"):
            m[f"{src}.{lin}.weight"] = (dst + (lin, "kernel"), _t)
            m[f"{src}.{lin}.bias"] = (dst + (lin, "bias"), np.asarray)

    for i in range(cfg.enc_layers):
        src = f"{TR}.encoder.layers.{i}"
        dst = (TR, f"encoder_layer{i}")
        deform_attn(f"{src}.self_attn", dst + ("self_attn",))
        norms_ffn(src, dst, (1, 2))
    for i in range(cfg.dec_layers):
        src = f"{TR}.decoder.layers.{i}"
        dst = (TR, f"decoder_layer{i}")
        deform_attn(f"{src}.cross_attn", dst + ("cross_attn",))
        m[f"{src}.self_attn.in_proj_weight"] = (
            dst + ("self_attn", "in_proj_weight"), np.asarray)
        m[f"{src}.self_attn.in_proj_bias"] = (
            dst + ("self_attn", "in_proj_bias"), np.asarray)
        m[f"{src}.self_attn.out_proj.weight"] = (
            dst + ("self_attn", "out_proj", "kernel"), _t)
        m[f"{src}.self_attn.out_proj.bias"] = (
            dst + ("self_attn", "out_proj", "bias"), np.asarray)
        norms_ffn(src, dst, (1, 2, 3))
    return m


# keys that exist in reference checkpoints but are aliases/ignored
_IGNORED = re.compile(
    r"(num_batches_tracked$"
    r"|^(class_embed|root_embed|joint_embed)\.[1-9]\d*\."   # per-layer alias
    r"|\.sampling_offsets\.[1-9]\d*\."                      # per-frame alias
    r"|\.attention_weights\.[1-9]\d*\."
    r"|^transformer\.decoder\.(root_embed|class_embed)\.)"  # decoder alias
)


def _import_with_key_map(state_dict: Dict[str, Any], key_map: Dict[str, tuple],
                         strict: bool, what: str) -> Dict:
    """Shared key-map walk: build a param (sub)tree from a torch state dict,
    with strict unmapped/missing accounting. ``_IGNORED`` keys are skipped."""
    params: Dict = {}
    used = set()
    for k, v in state_dict.items():
        if _IGNORED.search(k):
            continue
        if k not in key_map:
            if strict:
                raise KeyError(f"unmapped {what} key: {k}")
            continue
        path, tf = key_map[k]
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = tf(v)
        used.add(k)
    if strict:
        missing = set(key_map) - used
        if missing:
            raise KeyError(f"missing {what} keys: {sorted(missing)[:10]} "
                           f"(+{max(0, len(missing) - 10)} more)")
    return params


def import_torch_state_dict(state_dict: Dict[str, Any], cfg,
                            strict: bool = True) -> Dict:
    """Convert a reference ``model`` state dict (torch names -> arrays) into
    the flax param tree."""
    return _import_with_key_map(state_dict, torch_key_map(cfg), strict,
                                "reference")


def load_torch_checkpoint(path: str, cfg, strict: bool = True) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return import_torch_state_dict(sd, cfg, strict=strict)


def _deep_merge(dst: Dict, src: Dict) -> Dict:
    """Copy of ``dst`` with ``src`` leaves grafted in (non-destructive)."""
    out = dict(dst)
    for k, v in src.items():
        out[k] = (_deep_merge(dst[k], v)
                  if isinstance(v, dict) and isinstance(dst.get(k), dict)
                  else v)
    return out


def import_torchvision_backbone(state_dict: Dict[str, Any], cfg,
                                params: Dict = None,
                                strict: bool = True) -> Dict:
    """Import a RAW torchvision resnet state dict (``conv1.weight``,
    ``layer1.0.conv1.weight``, ...) as the backbone subtree.

    The reference starts training from torchvision's ImageNet-pretrained
    resnet50 (``models/backbone.py:107`` ``pretrained=is_main_process()``,
    cache directory set by ``--pretrained_dir`` → ``TORCH_HOME``,
    ``main.py:164-165``); this gives the same starting point from a local
    torchvision weights file without network access. The classifier head
    (``fc.*``) is ignored. With ``params`` given, returns a copy with the
    imported leaves grafted into the backbone subtree (a deep merge, so a
    non-strict partial state dict leaves unmapped leaves initialized);
    otherwise just the imported subtree."""
    prefix = "backbone.0.body."
    key_map = {k[len(prefix):]: v for k, v in torch_key_map(cfg).items()
               if k.startswith(prefix)}
    sd = {k: v for k, v in state_dict.items() if not k.startswith("fc.")}
    sub = _import_with_key_map(sd, key_map, strict, "torchvision")
    if params is not None:
        return _deep_merge(params, sub)
    return sub


def load_torchvision_backbone(path: str, cfg, params: Dict = None,
                              strict: bool = True) -> Dict:
    """Load a torchvision resnet ``.pth`` file and graft it as the backbone
    (the ``--pretrained_backbone`` train CLI flag)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return import_torchvision_backbone(sd, cfg, params=params, strict=strict)
