"""Import helper for numerical parity tests against the reference toolbox.

The reference (`/root/reference`, PyTorch) is only present in the development
environment; parity tests are skipped elsewhere. Its `models/__init__.py`
imports every model family, some of which need third-party wheels that are
not installed here (timm_0_5_4, flash_attn, xformers, torchvision, cv2,
cmapy). Those are only *used* by the foundation-tier models, so import-time
stubs are enough to reach the torch-only families (PSMNet, GwcNet, ACVNet,
CFNet, PCWNet, RAFTStereo, STTR) that the parity tests instantiate.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "stereo_toolbox"))


def _stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__dict__.update(attrs)
    # make it a "package" so `import name.sub` of unknown subs still fails
    # loudly but attribute access on the stub works.
    mod.__path__ = []  # type: ignore[attr-defined]
    sys.modules[name] = mod
    return mod


def _getattr_raiser(modname):
    def raiser(*a, **k):
        raise RuntimeError(
            f"stubbed module {modname!r} was called at runtime — the parity "
            f"tests must not exercise foundation-tier reference models here")
    return raiser


def _make_timm_mobilenetv2():
    """timm-0.5.4-compatible mobilenetv2_100 (features_only): attribute and
    state-dict names match timm's efficientnet builder (conv_stem/bn1/act1,
    blocks.{stage}.{i} with conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3, stage 0 a
    DepthwiseSeparableConv with conv_dw/bn1/conv_pw/bn2), so reference
    IGEV-family models instantiate and published checkpoints line up."""
    import torch.nn as _nn

    class DepthwiseSeparableConv(_nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv_dw = _nn.Conv2d(cin, cin, 3, stride, 1, groups=cin,
                                      bias=False)
            self.bn1 = _nn.BatchNorm2d(cin)
            self.act1 = _nn.ReLU6(inplace=True)
            self.se = _nn.Identity()
            self.conv_pw = _nn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = _nn.BatchNorm2d(cout)
            self.act2 = _nn.Identity()
            self.has_residual = cin == cout and stride == 1

        def forward(self, x):
            shortcut = x
            x = self.act1(self.bn1(self.conv_dw(x)))
            x = self.act2(self.bn2(self.conv_pw(self.se(x))))
            return x + shortcut if self.has_residual else x

    class InvertedResidual(_nn.Module):
        def __init__(self, cin, cout, stride=1, exp=6):
            super().__init__()
            mid = cin * exp
            self.conv_pw = _nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = _nn.BatchNorm2d(mid)
            self.act1 = _nn.ReLU6(inplace=True)
            self.conv_dw = _nn.Conv2d(mid, mid, 3, stride, 1, groups=mid,
                                      bias=False)
            self.bn2 = _nn.BatchNorm2d(mid)
            self.act2 = _nn.ReLU6(inplace=True)
            self.se = _nn.Identity()
            self.conv_pwl = _nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = _nn.BatchNorm2d(cout)
            self.has_residual = cin == cout and stride == 1

        def forward(self, x):
            shortcut = x
            x = self.act1(self.bn1(self.conv_pw(x)))
            x = self.act2(self.bn2(self.conv_dw(x)))
            x = self.bn3(self.conv_pwl(self.se(x)))
            return x + shortcut if self.has_residual else x

    class MobileNetV2Features(_nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_stem = _nn.Conv2d(3, 32, 3, 2, 1, bias=False)
            self.bn1 = _nn.BatchNorm2d(32)
            self.act1 = _nn.ReLU6(inplace=True)
            cfg = [(16, 1, 1, 1), (24, 2, 6, 2), (32, 2, 6, 3),
                   (64, 2, 6, 4), (96, 1, 6, 3), (160, 2, 6, 3),
                   (320, 1, 6, 1)]
            stages, cin = [], 32
            for cout, s, e, n in cfg:
                stage = []
                for j in range(n):
                    stride = s if j == 0 else 1
                    cls = (DepthwiseSeparableConv if e == 1
                           else InvertedResidual)
                    args = (cin, cout, stride) if e == 1 else \
                        (cin, cout, stride, e)
                    stage.append(cls(*args))
                    cin = cout
                stages.append(_nn.Sequential(*stage))
            self.blocks = _nn.Sequential(*stages)

        def forward(self, x):
            x = self.act1(self.bn1(self.conv_stem(x)))
            feats = []
            for stage in self.blocks:
                x = stage(x)
                feats.append(x)
            return feats

    def create_model(name, pretrained=False, features_only=False, **kwargs):
        if not name.startswith("mobilenetv2"):
            raise RuntimeError(f"shim only provides mobilenetv2_100, "
                               f"got {name!r}")
        return MobileNetV2Features()

    return create_model


def import_reference_models():
    """Import `stereo_toolbox.models` from /root/reference with stubs for
    missing optional wheels; returns the module."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # timm_0_5_4: IGEVStereo/Selective* do `import timm_0_5_4 as timm` then
    # call timm.create_model('mobilenetv2_100', features_only=True). Provide
    # a structurally-exact (timm-0.5.4 module/state-dict naming) MobileNetV2
    # so IGEV-family reference models instantiate and their state dicts line
    # up with published checkpoints.
    import torch.nn as _nn

    timm = _stub("timm_0_5_4")
    timm.create_model = _make_timm_mobilenetv2()
    _stub("timm", create_model=timm.create_model)
    # `from timm_0_5_4.models.layers import DropPath` (DEFOM extractor).
    timm_models = _stub("timm_0_5_4.models")
    timm_layers = _stub("timm_0_5_4.models.layers")
    timm_layers.DropPath = _nn.Identity
    timm_layers.trunc_normal_ = lambda *a, **k: None
    timm_models.layers = timm_layers
    timm.models = timm_models
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_nn.Identity,
          trunc_normal_=lambda *a, **k: None)

    # flash_attn: FoundationStereo submodule.py imports names from it.
    fa = _stub("flash_attn")
    fa.flash_attn_func = _getattr_raiser("flash_attn.flash_attn_func")
    fa.flash_attn_qkvpacked_func = _getattr_raiser("flash_attn")

    # xformers: optional in DINOv2 layers behind `try: import` guards. Do
    # NOT stub it — a successful import flips XFORMERS_AVAILABLE=True and
    # routes attention through MemEffAttention (dinov2_layers/attention.py),
    # whereas the guarded ImportError selects the vanilla torch path the
    # parity tests need.
    for name in ("xformers", "xformers.ops"):
        sys.modules.pop(name, None)

    # torchvision: StereoAnywhere dcn.py / DepthAnything transforms, plus
    # STTR's backbone uses torchvision.models.resnet.BasicBlock at runtime —
    # provide a semantically-equivalent block (standard ResNet-v1 BasicBlock,
    # same attribute names so state_dicts line up).
    class BasicBlock(_nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or _nn.BatchNorm2d
            self.conv1 = _nn.Conv2d(inplanes, planes, 3, stride, dilation,
                                    dilation=dilation, bias=False)
            self.bn1 = norm_layer(planes)
            self.relu = _nn.ReLU(inplace=True)
            self.conv2 = _nn.Conv2d(planes, planes, 3, 1, dilation,
                                    dilation=dilation, bias=False)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    tv = _stub("torchvision")
    tv_ops = _stub("torchvision.ops")
    tv_ops.deform_conv2d = _getattr_raiser("torchvision.ops.deform_conv2d")
    tv.ops = tv_ops
    tv_tr = _stub("torchvision.transforms")
    tv_tr.Compose = lambda ts: ts
    tv.transforms = tv_tr
    _stub("torchvision.transforms.functional")
    tv_models = _stub("torchvision.models")
    tv_resnet = _stub("torchvision.models.resnet")
    tv_resnet.BasicBlock = BasicBlock
    tv_models.resnet = tv_resnet
    tv.models = tv_models

    # STTR's tokenizer uses torchvision.models.densenet._DenseBlock at
    # runtime: standard DenseNet-BC block (norm1→relu→1×1 conv bottleneck →
    # norm2→relu→3×3 conv, concatenated features), torchvision naming.
    import torch as _torch

    class _DenseLayer(_nn.Module):
        def __init__(self, num_input_features, growth_rate, bn_size,
                     drop_rate=0.0, memory_efficient=False):
            super().__init__()
            self.norm1 = _nn.BatchNorm2d(num_input_features)
            self.relu1 = _nn.ReLU(inplace=True)
            self.conv1 = _nn.Conv2d(num_input_features,
                                    bn_size * growth_rate, 1, 1, bias=False)
            self.norm2 = _nn.BatchNorm2d(bn_size * growth_rate)
            self.relu2 = _nn.ReLU(inplace=True)
            self.conv2 = _nn.Conv2d(bn_size * growth_rate, growth_rate, 3,
                                    1, 1, bias=False)
            self.drop_rate = float(drop_rate)

        def forward(self, inputs):
            if isinstance(inputs, _torch.Tensor):
                inputs = [inputs]
            x = _torch.cat(inputs, 1)
            out = self.conv1(self.relu1(self.norm1(x)))
            out = self.conv2(self.relu2(self.norm2(out)))
            if self.drop_rate > 0:
                out = _nn.functional.dropout(out, p=self.drop_rate,
                                             training=self.training)
            return out

    class _DenseBlock(_nn.ModuleDict):
        def __init__(self, num_layers, num_input_features, bn_size,
                     growth_rate, drop_rate=0.0, memory_efficient=False):
            super().__init__()
            for i in range(num_layers):
                self.add_module(
                    f"denselayer{i + 1}",
                    _DenseLayer(num_input_features + i * growth_rate,
                                growth_rate, bn_size, drop_rate))

        def forward(self, init_features):
            features = [init_features]
            for layer in self.values():
                features.append(layer(features))
            return _torch.cat(features, 1)

    tv_densenet = _stub("torchvision.models.densenet")
    tv_densenet._DenseBlock = _DenseBlock
    tv_densenet._DenseLayer = _DenseLayer
    tv_models.densenet = tv_densenet

    # omegaconf: FoundationStereo config plumbing (import-time only here).
    class _OmegaConf:
        @staticmethod
        def create(obj=None, **k):
            return obj

        @staticmethod
        def load(path):
            raise RuntimeError("stubbed omegaconf.load called")

        @staticmethod
        def to_container(obj, **k):
            return obj

        @staticmethod
        def merge(*objs):
            out = {}
            for o in objs:
                out.update(dict(o or {}))
            return out

    _stub("omegaconf", OmegaConf=_OmegaConf, DictConfig=dict)

    # kornia: StereoAnywhere utils import spatial_gradient.
    _stub("kornia")
    _stub("kornia.filters",
          spatial_gradient=_getattr_raiser("kornia.filters.spatial_gradient"))

    # transformations (pip pkg for homogeneous transforms): star-imported by
    # FoundationStereo/Utils.py, unused by the forward paths we exercise.
    _stub("transformations")

    # cv2 / cmapy: visualization-only. Any attribute access (constants in
    # default-arg positions, colormap functions) resolves to an inert
    # sentinel; *calling* one raises.
    class _AutoStub(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _getattr_raiser(f"{self.__name__}.{name}")

    for name in ("cv2", "cmapy"):
        if name not in sys.modules:
            mod = _AutoStub(name)
            mod.__path__ = []
            sys.modules[name] = mod

    import importlib
    return importlib.import_module("stereo_toolbox.models")
