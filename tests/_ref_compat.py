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
    tv.__version__ = "0.15.0"
    models_m = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")
    detection = types.ModuleType("torchvision.models.detection")
    backbone_utils = types.ModuleType(
        "torchvision.models.detection.backbone_utils")
    transforms = types.ModuleType("torchvision.transforms")
    ops_m = types.ModuleType("torchvision.ops")

    def _no_deform(*a, **k):  # only reached by DCNv2 paths we don't test
        raise NotImplementedError("deform_conv2d stub")

    ops_m.deform_conv2d = _no_deform
    _utils.IntermediateLayerGetter = IntermediateLayerGetter

    # canonical torchvision ResNet (same module/param names and forward as
    # torchvision/models/resnet.py, the documented public arch) — needed by
    # TPSMM's KPDetector (models.resnet18) and DaGAN's monodepth2 encoder
    # (models.ResNet subclass + models.resnet.BasicBlock/Bottleneck)
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(tnn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = tnn.Sequential(
                    tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                               stride, bias=False),
                    tnn.BatchNorm2d(planes * block.expansion))
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
            return tnn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch_flatten_helper(self.avgpool(x))
            return self.fc(x)

    import torch as _torch

    def torch_flatten_helper(x):
        return _torch.flatten(x, 1)

    resnet_m = types.ModuleType("torchvision.models.resnet")
    resnet_m.BasicBlock = BasicBlock
    resnet_m.Bottleneck = Bottleneck
    resnet_m.ResNet = ResNet
    resnet_m.model_urls = {}

    def _mk(block, layers):
        def ctor(pretrained=False, **kw):
            assert not pretrained, "no weights in this environment"
            return ResNet(block, layers, **kw)
        return ctor

    resnet_m.resnet18 = _mk(BasicBlock, [2, 2, 2, 2])
    resnet_m.resnet34 = _mk(BasicBlock, [3, 4, 6, 3])
    resnet_m.resnet50 = _mk(Bottleneck, [3, 4, 6, 3])
    resnet_m.resnet101 = _mk(Bottleneck, [3, 4, 23, 3])
    resnet_m.resnet152 = _mk(Bottleneck, [3, 8, 36, 3])
    models_m.resnet = resnet_m
    models_m.ResNet = ResNet
    for n in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
        setattr(models_m, n, getattr(resnet_m, n))
    sys.modules["torchvision.models.resnet"] = resnet_m

    # canonical torchvision alexnet/vgg16 feature stacks (the documented
    # public layouts) — used by the LPIPS net (criteria/lpips/networks.py:81)
    # and the style loss (criteria/style_loss.py:86). pretrained is accepted
    # and ignored: there is no network access; converter parity only needs
    # the layout, not ImageNet values.
    def alexnet(pretrained=False, **kw):
        m = tnn.Module()
        m.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(3, 2))
        return m

    def vgg16(pretrained=False, **kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, v, 3, 1, 1), tnn.ReLU(inplace=True)]
                cin = v
        m = tnn.Module()
        m.features = tnn.Sequential(*layers)
        return m

    models_m.alexnet = alexnet
    models_m.vgg16 = vgg16
    tv.models = models_m
    tv.transforms = transforms
    tv.ops = ops_m
    models_m._utils = _utils
    models_m.detection = detection
    detection.backbone_utils = backbone_utils
    for name, mod in [("torchvision", tv), ("torchvision.models", models_m),
                      ("torchvision.models._utils", _utils),
                      ("torchvision.models.detection", detection),
                      ("torchvision.models.detection.backbone_utils",
                       backbone_utils),
                      ("torchvision.transforms", transforms),
                      ("torchvision.ops", ops_m)]:
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


def install_basicsr_stub():
    """Minimal `basicsr` so the reference's vendored archs import: the archs
    use only get_root_logger, ARCH_REGISTRY (a no-op decorator registry),
    default_init_weights (init-time only — parity converts the actual
    state_dict, so a no-op preserves numerics), and the DCN symbols (module
    import only; the archs under test never call them)."""
    if "basicsr" in sys.modules:
        return
    import logging

    import torch.nn as nn

    class _Registry:
        def __init__(self):
            self._obj = {}

        def register(self, obj=None):
            if obj is not None:
                self._obj[obj.__name__] = obj
                return obj

            def deco(cls):
                self._obj[cls.__name__] = cls
                return cls

            return deco

        def get(self, name):
            return self._obj[name]

    def default_init_weights(*a, **k):
        return None

    def make_layer(basic_block, num_basic_block, **kwarg):
        return nn.Sequential(
            *[basic_block(**kwarg) for _ in range(num_basic_block)])

    class _DCNStub(nn.Module):
        def forward(self, *a, **k):
            raise NotImplementedError("DCN stub")

    basicsr = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")
    download = types.ModuleType("basicsr.utils.download_util")
    archs = types.ModuleType("basicsr.archs")
    arch_util = types.ModuleType("basicsr.archs.arch_util")
    ops = types.ModuleType("basicsr.ops")
    dcn = types.ModuleType("basicsr.ops.dcn")

    utils.get_root_logger = lambda *a, **k: logging.getLogger("basicsr")
    registry.ARCH_REGISTRY = _Registry()
    download.load_file_from_url = _DCNStub  # never called in parity tests
    arch_util.default_init_weights = default_init_weights
    arch_util.make_layer = make_layer
    dcn.ModulatedDeformConvPack = _DCNStub
    dcn.modulated_deform_conv = _DCNStub()
    basicsr.utils = utils
    basicsr.archs = archs
    basicsr.ops = ops
    utils.registry = registry
    utils.download_util = download
    archs.arch_util = arch_util
    ops.dcn = dcn
    for name, mod in [("basicsr", basicsr), ("basicsr.utils", utils),
                      ("basicsr.utils.registry", registry),
                      ("basicsr.utils.download_util", download),
                      ("basicsr.archs", archs),
                      ("basicsr.archs.arch_util", arch_util),
                      ("basicsr.ops", ops), ("basicsr.ops.dcn", dcn)]:
        sys.modules[name] = mod


def install_timm_stub():
    """`timm.models.layers` symbols SwinIR imports: identity DropPath (eval
    semantics / drop_prob=0 — the config SwinIR ships with), to_2tuple, and
    torch's own trunc_normal_."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn
    from torch.nn.init import trunc_normal_

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = types.ModuleType("timm")
    models_m = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = models_m
    models_m.layers = layers
    for name, mod in [("timm", timm), ("timm.models", models_m),
                      ("timm.models.layers", layers)]:
        sys.modules[name] = mod


def _pure_torch_op_module(name: str):
    """A pure-torch replica of the reference CUDA op packages (same documented
    fallback semantics as install_stylegan2_op_stub), registered as `name`."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from tests.test_upfirdn import torch_upfirdn2d

    def fused_leaky_relu(input, bias=None, negative_slope=0.2, scale=2 ** 0.5,
                         **kw):  # GPEN's copy passes device=
        if bias is not None:
            shape = [1, -1] + [1] * (input.ndim - 2)
            input = input + bias.view(*shape)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5,
                     device=None):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(input, self.bias, self.negative_slope,
                                    self.scale)

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0), **kw):
        return torch_upfirdn2d(input, kernel, up, down, pad)

    op = types.ModuleType(name)
    op.FusedLeakyReLU = FusedLeakyReLU
    op.fused_leaky_relu = fused_leaky_relu
    op.upfirdn2d = upfirdn2d
    sys.modules[name] = op
    fa = types.ModuleType(name + ".fused_act")
    fa.FusedLeakyReLU = FusedLeakyReLU
    fa.fused_leaky_relu = fused_leaky_relu
    sys.modules[name + ".fused_act"] = fa
    uf = types.ModuleType(name + ".upfirdn2d")
    uf.upfirdn2d = upfirdn2d
    sys.modules[name + ".upfirdn2d"] = uf
    return op


def install_zoo_op_stubs():
    """Pre-seed sys.modules so GPEN's and GCFSR's op packages (CUDA-compile-
    at-import copies of the stylegan2 ops, SURVEY §2.1) resolve to the
    pure-torch fallbacks instead."""
    for name in ("swap_face_fine.gpen.face_model.op", "swap_face_fine.ops"):
        if name not in sys.modules:
            _pure_torch_op_module(name)


@contextlib.contextmanager
def view_fallback():
    """torch `.view` fails on tensors CPU strided ops leave non-contiguous
    (fine on CUDA); reshape == view + copy when needed, numerics identical."""
    import torch

    _view = torch.Tensor.view

    def view_or_reshape(self, *shape):
        try:
            return _view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = view_or_reshape
    try:
        yield
    finally:
        torch.Tensor.view = _view


def install_skimage_stub():
    """Empty `skimage` so MISF's kpn/utils.py imports (it only touches
    skimage inside functions the parity tests never call)."""
    if "skimage" not in sys.modules:
        sys.modules["skimage"] = types.ModuleType("skimage")


def import_from_path(name: str, path: str):
    """Load a single reference source file that is not importable as a
    package member (missing __init__.py chain), e.g. SwinIR's models dir."""
    import importlib.util

    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def package_from_dir(name: str, directory: str):
    """Register a synthetic package rooted at `directory` so files with
    relative imports (e.g. GFPGAN's archs) can be imported without executing
    the repo's heavy package __init__ (which pulls basicsr data/model code)."""
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [directory]
    sys.modules[name] = pkg
    return pkg


def install_all():
    install_reference_path()
    install_cuda_noops()
    install_torchvision_stub()
    install_stylegan2_op_stub()
    install_basicsr_stub()
    install_timm_stub()
    install_zoo_op_stubs()
    install_skimage_stub()


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
