"""Helpers to import the REFERENCE's torch modules on CPU for parity tests.

The reference assumes a CUDA box: its StyleGAN2 op package compiles CUDA
kernels at import (models/stylegan2/op/fused_act.py:9), face_parsing/model.py
creates module-level `.cuda()` tensors, and several files import torchvision
(absent here). These helpers install the minimal compatibility layer so the
reference's OWN module code runs unmodified on CPU:

  - `.cuda()` no-ops on tensors/modules
  - a torchvision stub exposing the one symbol used
    (models._utils.IntermediateLayerGetter, implemented to its documented
    semantics)
  - a `models.stylegan2.op` stub with pure-torch fused_leaky_relu /
    upfirdn2d (the from-the-math oracle in test_upfirdn) and passthrough
    conv2d_gradfix — these are the reference's own documented CPU fallback
    semantics (upfirdn2d.py:150 `upfirdn2d_native`)

Nothing here changes reference numerics; it only removes CUDA/torchvision
import barriers.
"""

from __future__ import annotations

import contextlib
import sys
import types

REF = "/root/reference"


def install_reference_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def install_cuda_noops():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            rl = {str(k): str(v) for k, v in return_layers.items()}
            remaining = dict(rl)
            layers = {}
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = rl

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    tv = types.ModuleType("torchvision")
    models_m = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")
    detection = types.ModuleType("torchvision.models.detection")
    backbone_utils = types.ModuleType(
        "torchvision.models.detection.backbone_utils")
    transforms = types.ModuleType("torchvision.transforms")
    _utils.IntermediateLayerGetter = IntermediateLayerGetter
    tv.models = models_m
    tv.transforms = transforms
    models_m._utils = _utils
    models_m.detection = detection
    detection.backbone_utils = backbone_utils
    for name, mod in [("torchvision", tv), ("torchvision.models", models_m),
                      ("torchvision.models._utils", _utils),
                      ("torchvision.models.detection", detection),
                      ("torchvision.models.detection.backbone_utils",
                       backbone_utils),
                      ("torchvision.transforms", transforms)]:
        sys.modules[name] = mod


def install_stylegan2_op_stub():
    """Pure-torch `models.stylegan2.op` so the reference Generator/Net3
    import without compiling CUDA kernels."""
    if "models.stylegan2.op" in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from tests.test_upfirdn import torch_upfirdn2d

    def fused_leaky_relu(input, bias=None, negative_slope=0.2,
                         scale=2 ** 0.5):
        if bias is not None:
            shape = [1, -1] + [1] * (input.ndim - 2)
            input = input + bias.view(*shape)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(input, self.bias, self.negative_slope,
                                    self.scale)

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        return torch_upfirdn2d(input, kernel, up, down, pad)

    conv2d_gradfix = types.ModuleType("models.stylegan2.op.conv2d_gradfix")
    conv2d_gradfix.conv2d = F.conv2d
    conv2d_gradfix.conv_transpose2d = F.conv_transpose2d
    conv2d_gradfix.no_weight_gradients = contextlib.nullcontext

    op = types.ModuleType("models.stylegan2.op")
    op.FusedLeakyReLU = FusedLeakyReLU
    op.fused_leaky_relu = fused_leaky_relu
    op.upfirdn2d = upfirdn2d
    op.conv2d_gradfix = conv2d_gradfix
    sys.modules["models.stylegan2.op"] = op
    fa = types.ModuleType("models.stylegan2.op.fused_act")
    fa.FusedLeakyReLU = FusedLeakyReLU
    fa.fused_leaky_relu = fused_leaky_relu
    sys.modules["models.stylegan2.op.fused_act"] = fa
    uf = types.ModuleType("models.stylegan2.op.upfirdn2d")
    uf.upfirdn2d = upfirdn2d
    sys.modules["models.stylegan2.op.upfirdn2d"] = uf
    sys.modules["models.stylegan2.op.conv2d_gradfix"] = conv2d_gradfix


def install_all():
    install_reference_path()
    install_cuda_noops()
    install_torchvision_stub()
    install_stylegan2_op_stub()


def randomize_bn_stats(net, seed: int = 0):
    """Fresh torch BN has running mean 0 / var 1 — too easy for converter
    parity; randomize so a missed BN mapping fails loudly."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.rand(m.running_mean.shape, generator=g) - 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.7 + 0.5)


def to_numpy_sd(net) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
