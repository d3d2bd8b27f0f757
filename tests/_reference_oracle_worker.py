"""Subprocess worker: run the ACTUAL reference model code (not the replica)
with torchvision stubbed, and dump its state dict + forward outputs.

VERDICT r3 #5(a): the repo's checkpoint-fidelity claim rested on a
self-written torch replica — if the replica misread the reference
semantics, repo and replica could agree and both be wrong. This worker
imports the real modules from ``/root/reference`` (read-only; imported at
runtime, never copied), satisfies their single unresolvable dependency —
torchvision, whose only uses are ``models.resnet50`` +
``IntermediateLayerGetter`` (reference ``models/backbone.py:19,105-108``)
and the ``transforms.functional`` import in ``models/model.py:12`` — with
a faithful stand-in written from the public torchvision architecture, and
runs the reference forward with ``use_pytorch_deform=1`` (the pure-torch
MSDA path, the only one that exists on CPU).

Usage: python _reference_oracle_worker.py <out_dir>
Writes: <out_dir>/reference.pth  (the {"model": state_dict} checkpoint
        format, as ``main.py:266-273`` saves)
        <out_dir>/oracle.npz     (input + pred_logits/pred_kpts2d/
        pred_depth/heatmap_{l})
"""

import sys
import types
from collections import OrderedDict

import numpy as np
import torch
from torch import nn

# --------------------------------------------------------------- tv stub
# torchvision-faithful ResNet (public torchvision architecture and
# parameter naming: conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/
# downsample.{0,1}), parameterized by norm_layer exactly like torchvision
# so the reference can inject its FrozenBatchNorm2d.


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers, norm_layer,
                 replace_stride_with_dilation=(False, False, False)):
        super().__init__()
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1, False, norm_layer)
        self.layer2 = self._make_layer(
            128, layers[1], 2, replace_stride_with_dilation[0], norm_layer)
        self.layer3 = self._make_layer(
            256, layers[2], 2, replace_stride_with_dilation[1], norm_layer)
        self.layer4 = self._make_layer(
            512, layers[3], 2, replace_stride_with_dilation[2], norm_layer)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride, dilate, norm_layer):
        downsample = None
        prev_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                norm_layer(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              prev_dilation, norm_layer)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes,
                               dilation=self.dilation, norm_layer=norm_layer)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)


def _resnet50(replace_stride_with_dilation=None, pretrained=False,
              norm_layer=None, **kw):
    # pretrained ignored: zero-egress environment; parity runs on random
    # weights (the torchvision ImageNet import path is covered separately
    # by train/checkpoint.py::import_torchvision_backbone tests)
    return _ResNet([3, 4, 6, 3], norm_layer or nn.BatchNorm2d,
                   replace_stride_with_dilation or (False, False, False))


class _IntermediateLayerGetter(nn.ModuleDict):
    """Standard torchvision semantics: keep children up to the last
    requested layer; forward returns {out_name: activation}."""

    def __init__(self, model, return_layers):
        remaining = {str(k): str(v) for k, v in return_layers.items()}
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            remaining.pop(name, None)
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = {str(k): str(v) for k, v in
                              return_layers.items()}

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install_torchvision_stub():
    tv = types.ModuleType("torchvision")
    # util/misc.py:20 gates a 0.5-era workaround on float(version[:3])
    tv.__version__ = "0.9.0"
    models = types.ModuleType("torchvision.models")
    models.resnet50 = _resnet50
    utils_mod = types.ModuleType("torchvision.models._utils")
    utils_mod.IntermediateLayerGetter = _IntermediateLayerGetter
    models._utils = utils_mod
    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")

    def gaussian_blur(*a, **k):  # only used by the criterion heatmap path
        raise NotImplementedError("stub: not needed for forward parity")

    tfunc.gaussian_blur = gaussian_blur
    transforms.functional = tfunc
    tv.models = models
    tv.transforms = transforms
    for name, mod in (("torchvision", tv),
                      ("torchvision.models", models),
                      ("torchvision.models._utils", utils_mod),
                      ("torchvision.transforms", transforms),
                      ("torchvision.transforms.functional", tfunc)):
        sys.modules[name] = mod


# ------------------------------------------------------------- the oracle

def reference_args():
    """The reference CLI defaults (``main.py:20-153``) at the parity test
    shape (hidden 96 / heads 4 / enc1 dec2 / T=2+1, the torch-replica test
    config) — every field build_model/build_backbone/build_matcher read."""
    return types.SimpleNamespace(
        device="cpu", backbone="resnet50", lr_backbone=1e-5, masks=False,
        dilation=False, num_feature_levels=3, hidden_dim=96, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=128, dropout=0.0,
        num_frames=2, num_future_frames=1, num_kpts=15, num_queries=8,
        enc_n_points=4, dec_n_points=4, aux_loss=True,
        position_embedding="sine", use_pytorch_deform=1, max_depth=15,
        set_cost_is_human=1.0, set_cost_root=1.0, set_cost_root_vis=0.1,
        set_cost_root_depth=1.0, set_cost_joint=1.0, set_cost_joint_vis=0.1,
        set_cost_joint_depth=1.0, is_human_loss_coef=1.0,
        root_loss_coef=1.0, root_vis_loss_coef=0.1,
        root_depth_loss_coef=1.0, joint_loss_coef=1.0,
        joint_vis_loss_coef=1.0, joint_depth_loss_coef=1.0,
        joint_disp_loss_coef=1.0, joint_disp_depth_loss_coef=1.0,
        cont_loss_coef=0.1, heatmap_loss_coef=0.01, eos_coef=0.5)


def main(out_dir):
    install_torchvision_stub()
    sys.path.insert(0, "/root/reference")
    torch.manual_seed(0)

    from models.model import build_model  # noqa: E402 (reference code)
    from util.misc import nested_tensor_from_tensor_list  # noqa: E402

    args = reference_args()
    model, _, _ = build_model(args)

    # randomize the FrozenBN buffers: their ones/zeros defaults would make
    # the BN folding in the converter untested
    gen = torch.Generator().manual_seed(7)
    for name, buf in model.named_buffers():
        if name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
        elif name.endswith(("running_mean", "bias")):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
        elif name.endswith("weight"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    # bias the (shared, model.py:99) is_human head toward class 1 so the
    # CLI round-trip test tracks non-empty identities — random init would
    # hover near the 0.5 association threshold
    with torch.no_grad():
        model.class_embed[0].bias.copy_(torch.tensor([0.0, 2.0]))
    model.eval()

    T, H, W = args.num_frames, 64, 96
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, T * 3, H, W)).astype(np.float32)
    samples = nested_tensor_from_tensor_list(
        [torch.from_numpy(x[i]) for i in range(2)])
    with torch.no_grad():
        out, _ = model(samples)

    # second leg: a single snippet built from UINT8 frames, so the CLI
    # round-trip test can regenerate the identical network input from
    # losslessly-saved PNG files (frames already at input size -> the
    # pipeline's center-crop affine is the identity)
    frames_u8 = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
    x_cli = (frames_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    samples_cli = nested_tensor_from_tensor_list(
        [torch.from_numpy(x_cli.reshape(T * 3, H, W))])
    with torch.no_grad():
        out_cli, _ = model(samples_cli)

    # the reference's EXACT on-disk checkpoint format: the full training
    # dict {model, optimizer, lr_scheduler, epoch, args} saved with legacy
    # (non-zipfile) serialization (main.py:266-273 via save_on_master,
    # util/misc.py:395-397) — what a user's real shipped .pth contains
    import argparse

    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-4,
                                  weight_decay=1e-4)
    lr_scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 30)
    torch.save({
        "model": model.state_dict(),
        "optimizer": optimizer.state_dict(),
        "lr_scheduler": lr_scheduler.state_dict(),
        "epoch": 7,
        "args": argparse.Namespace(**vars(args)),
    }, f"{out_dir}/reference.pth", _use_new_zipfile_serialization=False)
    arrays = {
        "x": x,
        "pred_logits": out["pred_logits"].numpy(),
        "pred_kpts2d": out["pred_kpts2d"].numpy(),
        "pred_depth": out["pred_depth"].numpy(),
        "frames_u8": frames_u8,
        "cli_pred_logits": out_cli["pred_logits"].numpy(),
        "cli_pred_kpts2d": out_cli["pred_kpts2d"].numpy(),
        "cli_pred_depth": out_cli["pred_depth"].numpy(),
    }
    for lvl, hm in enumerate(out["heatmaps"]):
        arrays[f"heatmap_{lvl}"] = hm.numpy()
    np.savez(f"{out_dir}/oracle.npz", **arrays)
    print("ORACLE-OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
