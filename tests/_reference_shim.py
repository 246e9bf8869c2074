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
        if name.startswith("mobilenetv2"):
            return MobileNetV2Features()
        if name == "edgenext_small":
            return _make_timm_edgenext()()
        raise RuntimeError(f"shim only provides mobilenetv2_100 and "
                           f"edgenext_small, got {name!r}")

    return create_model


def _make_timm_edgenext():
    """timm-0.6.x-compatible `edgenext_small` stand-in (stem + stages only —
    the reference FoundationStereo Feature uses just `.stem`/`.stages`,
    extractor.py:326-328). Module/state-dict names match timm's edgenext.py
    (stem.{0,1}, stages.{s}.downsample.{0,1}, stages.{s}.blocks.{i} with
    conv_dw/norm/mlp.fc1/mlp.fc2/gamma for ConvBlock and convs.{j}/pos_embd.
    token_projection/norm_xca/gamma_xca/xca.{temperature,qkv,proj}/norm/mlp/
    gamma for SplitTransposeBlock), so published checkpoints line up.
    edgenext_small config: depths (3,3,9,3), dims (48,96,160,304), one SDTA
    block closing stages 1-3, kernel sizes (3,5,7,9), d2 scales (2,2,3,4),
    Fourier pos-embedding only in stage 1."""
    import math

    import torch as _torch
    import torch.nn as _nn
    import torch.nn.functional as _F

    class LayerNorm2d(_nn.LayerNorm):
        def __init__(self, ch, eps=1e-6):
            super().__init__(ch, eps=eps)

        def forward(self, x):
            return _F.layer_norm(
                x.permute(0, 2, 3, 1), self.normalized_shape, self.weight,
                self.bias, self.eps).permute(0, 3, 1, 2)

    class Mlp(_nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = _nn.Linear(dim, hidden)
            self.act = _nn.GELU()
            self.fc2 = _nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class PositionalEncodingFourier(_nn.Module):
        def __init__(self, hidden_dim=32, dim=768, temperature=10000):
            super().__init__()
            self.token_projection = _nn.Conv2d(hidden_dim * 2, dim, 1)
            self.scale = 2 * math.pi
            self.temperature = temperature
            self.hidden_dim = hidden_dim
            self.eps = 1e-6

        def forward(self, shape):
            b, h, w = shape
            ones = _torch.ones(b, h, w)
            y = ones.cumsum(1) / (h + self.eps) * self.scale
            x = ones.cumsum(2) / (w + self.eps) * self.scale
            dim_t = _torch.arange(self.hidden_dim, dtype=_torch.float32)
            dim_t = self.temperature ** (
                2 * _torch.div(dim_t, 2, rounding_mode="floor")
                / self.hidden_dim)
            px = x[:, :, :, None] / dim_t
            py = y[:, :, :, None] / dim_t
            px = _torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                              dim=4).flatten(3)
            py = _torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                              dim=4).flatten(3)
            pos = _torch.cat((py, px), dim=3).permute(0, 3, 1, 2)
            return self.token_projection(pos)

    class CrossCovarianceAttn(_nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=True):
            super().__init__()
            self.num_heads = num_heads
            self.temperature = _nn.Parameter(_torch.ones(num_heads, 1, 1))
            self.qkv = _nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = _nn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.qkv(x).reshape(
                b, n, 3, self.num_heads, -1).permute(2, 0, 3, 4, 1)
            q, k, v = qkv.unbind(0)  # [B, heads, hd, N]
            attn = (_F.normalize(q, dim=-1)
                    @ _F.normalize(k, dim=-1).transpose(-2, -1)
                    ) * self.temperature
            attn = attn.softmax(dim=-1)
            x = (attn @ v).permute(0, 3, 1, 2).reshape(b, n, c)
            return self.proj(x)

    class ConvBlock(_nn.Module):
        def __init__(self, dim, kernel_size=7, ls_init_value=1e-6,
                     expand_ratio=4):
            super().__init__()
            self.conv_dw = _nn.Conv2d(dim, dim, kernel_size, 1,
                                      kernel_size // 2, groups=dim)
            self.norm = _nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, expand_ratio * dim)
            self.gamma = _nn.Parameter(ls_init_value * _torch.ones(dim))

        def forward(self, x):
            shortcut = x
            x = self.conv_dw(x).permute(0, 2, 3, 1)
            x = self.gamma * self.mlp(self.norm(x))
            return shortcut + x.permute(0, 3, 1, 2)

    class SplitTransposeBlock(_nn.Module):
        def __init__(self, dim, num_scales=2, num_heads=8, expand_ratio=4,
                     use_pos_emb=False, ls_init_value=1e-6):
            super().__init__()
            width = max(int(math.ceil(dim / num_scales)),
                        int(math.floor(dim // num_scales)))
            self.width = width
            self.convs = _nn.ModuleList([
                _nn.Conv2d(width, width, 3, 1, 1, groups=width)
                for _ in range(max(1, num_scales - 1))])
            self.pos_embd = PositionalEncodingFourier(dim=dim) \
                if use_pos_emb else None
            self.norm_xca = _nn.LayerNorm(dim, eps=1e-6)
            self.gamma_xca = _nn.Parameter(ls_init_value * _torch.ones(dim))
            self.xca = CrossCovarianceAttn(dim, num_heads=num_heads)
            self.norm = _nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, expand_ratio * dim)
            self.gamma = _nn.Parameter(ls_init_value * _torch.ones(dim))

        def forward(self, x):
            shortcut = x
            b, c, h, w = x.shape
            spx = x.chunk(len(self.convs) + 1, dim=1)
            spo, sp = [], spx[0]
            for i, conv in enumerate(self.convs):
                if i > 0:
                    sp = sp + spx[i]
                sp = conv(sp)
                spo.append(sp)
            spo.append(spx[-1])
            x = _torch.cat(spo, 1)

            x = x.reshape(b, c, h * w).permute(0, 2, 1)
            if self.pos_embd is not None:
                pos = self.pos_embd((b, h, w)).reshape(
                    b, -1, x.shape[1]).permute(0, 2, 1)
                x = x + pos
            x = x + self.gamma_xca * self.xca(self.norm_xca(x))
            x = x.reshape(b, h, w, c)
            x = self.gamma * self.mlp(self.norm(x))
            return shortcut + x.permute(0, 3, 1, 2)

    class EdgeNeXtStage(_nn.Module):
        def __init__(self, in_chs, out_chs, stride, depth, global_blocks,
                     num_heads, scales, kernel_size, use_pos_emb):
            super().__init__()
            if stride == 1:
                self.downsample = _nn.Identity()
            else:
                self.downsample = _nn.Sequential(
                    LayerNorm2d(in_chs),
                    _nn.Conv2d(in_chs, out_chs, 2, 2))
            blocks = []
            for i in range(depth):
                if i < depth - global_blocks:
                    blocks.append(ConvBlock(out_chs, kernel_size))
                else:
                    blocks.append(SplitTransposeBlock(
                        out_chs, scales, num_heads,
                        use_pos_emb=use_pos_emb))
            self.blocks = _nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(self.downsample(x))

    class EdgeNeXt(_nn.Module):
        def __init__(self, dims=(48, 96, 160, 304), depths=(3, 3, 9, 3),
                     global_block_counts=(0, 1, 1, 1),
                     kernel_sizes=(3, 5, 7, 9), heads=(8, 8, 8, 8),
                     d2_scales=(2, 2, 3, 4),
                     use_pos_emb=(False, True, False, False)):
            super().__init__()
            self.stem = _nn.Sequential(
                _nn.Conv2d(3, dims[0], 4, 4), LayerNorm2d(dims[0]))
            stages, cin = [], dims[0]
            for s in range(4):
                stages.append(EdgeNeXtStage(
                    cin, dims[s], 1 if s == 0 else 2, depths[s],
                    global_block_counts[s], heads[s], d2_scales[s],
                    kernel_sizes[s], use_pos_emb[s]))
                cin = dims[s]
            self.stages = _nn.Sequential(*stages)

        def forward(self, x):
            return self.stages(self.stem(x))

    return EdgeNeXt


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

    # flash_attn: FoundationStereo submodule.py imports names from it and
    # CALLS flash_attn_func inside CostVolumeDisparityAttention
    # (submodule.py:198-230) — provide exact plain-torch attention.
    # flash_attn_func signature: q/k/v are (B, L, nheads, headdim); returns
    # the same layout; softmax scale 1/sqrt(headdim); window (-1,-1) = full.
    def _flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                         causal=False, window_size=(-1, -1), **kw):
        assert not causal and tuple(window_size) == (-1, -1)
        scale = softmax_scale or q.shape[-1] ** -0.5
        qf, kf, vf = (t.transpose(1, 2).float() for t in (q, k, v))
        attn = (qf @ kf.transpose(-2, -1)) * scale  # [B, H, L, L]
        out = attn.softmax(dim=-1) @ vf
        return out.transpose(1, 2).to(q.dtype)

    fa = _stub("flash_attn")
    fa.flash_attn_func = _flash_attn_func
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

    # omegaconf: FoundationStereo config plumbing. The model reads the
    # config by attribute (args.corr_radius), subscript (cfg['max_disp'])
    # AND .get(key, default) — provide a dict with attribute access.
    class _AttrDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

        def __setattr__(self, name, value):
            self[name] = value

    class _OmegaConf:
        @staticmethod
        def create(obj=None, **k):
            return _AttrDict(obj or {})

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

    # torch.hub: FoundationStereo's DPT_DINOv2 loads the DINOv2 trunk via
    # torch.hub.load('facebookresearch/dinov2', 'dinov2_<size>14')
    # (FoundationStereo/depth_anything/dpt.py:157). Build it offline from
    # the package's own vendored dinov2 tree with the hub's exact kwargs
    # (img_size=518, patch_size=14, init_values=1.0, block_chunks=0).
    import torch as _torch2

    _orig_hub_load = _torch2.hub.load

    def _hub_load(repo, model, *a, **k):
        if "dinov2" in str(repo):
            import importlib
            vt = importlib.import_module(
                "stereo_toolbox.models.FoundationStereo.dinov2.models"
                ".vision_transformer")
            arch = {"dinov2_vits14": vt.vit_small,
                    "dinov2_vitb14": vt.vit_base,
                    "dinov2_vitl14": vt.vit_large}[model]
            return arch(img_size=518, patch_size=14, init_values=1.0,
                        ffn_layer="mlp", block_chunks=0,
                        num_register_tokens=0, interpolate_antialias=False,
                        interpolate_offset=0.1)
        return _orig_hub_load(repo, model, *a, **k)

    _torch2.hub.load = _hub_load

    # kornia: StereoAnywhere's estimate_normals calls
    # spatial_gradient(depth, mode='diff', order=1, normalized=False) at
    # runtime (StereoAnywhere/utils/utils.py:74-80). Faithful stand-in:
    # central differences (the 3×3 'diff' kernel), replicate-padded
    # borders, output (B, C, 2, H, W) with dx first.
    def _spatial_gradient(inp, mode="diff", order=1, normalized=False):
        assert mode == "diff" and order == 1 and not normalized
        b, c, h, w = inp.shape
        x = _nn.functional.pad(inp, (1, 1, 1, 1), mode="replicate")
        dx = (x[:, :, 1:-1, 2:] - x[:, :, 1:-1, :-2]) / 2.0
        dy = (x[:, :, 2:, 1:-1] - x[:, :, :-2, 1:-1]) / 2.0
        return _torch.stack([dx, dy], dim=2)

    _stub("kornia")
    _stub("kornia.filters", spatial_gradient=_spatial_gradient)

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
