"""Import reference (PyTorch) checkpoints into this framework's params.

The reference publishes trained checkpoints for its model zoo
(reference README.md:128-227 tables); users migrating to this framework can
convert them with these functions instead of retraining. This extends
`models.load_checkpoint_flexible` (reference models/__init__.py:20-51) from
"tolerate prefix mismatches" to "translate the torch state dict layout":

  * torch Conv2d weight  [O, I, kh, kw]      → flax [kh, kw, I, O]
  * torch Conv3d weight  [O, I, kd, kh, kw]  → flax [kd, kh, kw, I, O]
  * torch ConvTranspose3d [I, O, kd, kh, kw] → flax [kd, kh, kw, I, O],
    spatial axes flipped (torch transposed conv correlates with the flipped
    kernel relative to `lax.conv_transpose`)
  * torch BatchNorm weight/bias → flax scale/bias (params);
    running_mean/var → flax batch_stats mean/var

Converters are per-model and explicit: flax auto-numbered module names are
mapped to the reference's structured names, so a converted checkpoint is also
a *numerical parity proof* — tests/test_torch_import.py feeds the same random
weights through both frameworks and compares outputs.

All functions take a mapping of numpy arrays (no torch dependency in the
package); `load_torch_state_dict` is the torch-file front-end.
"""

from __future__ import annotations

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """torch.load a checkpoint file → flat {key: np.ndarray}.

    Unwraps the trainer's ``{'model': state_dict}`` nesting
    (reference trainer_torchrun.py:166-179) and strips DDP ``module.``
    prefixes, like the reference's load_checkpoint_flexible."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


class _Builder:
    """Accumulates params/batch_stats while consuming torch keys."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set = set()

    def _take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch checkpoint is missing {key!r}")
        self.used.add(key)
        return self.sd[key]

    def conv(self, flax_path: str, torch_prefix: str,
             bias: bool = False) -> None:
        """Plain conv: `<torch_prefix>.weight` → `<flax_path>/kernel`."""
        w = self._take(f"{torch_prefix}.weight")
        rank = w.ndim - 2
        perm = tuple(range(2, 2 + rank)) + (1, 0)
        _set(self.params, f"{flax_path}/kernel", w.transpose(perm))
        if bias:
            _set(self.params, f"{flax_path}/bias",
                 self._take(f"{torch_prefix}.bias"))

    def conv_transpose(self, flax_path: str, torch_prefix: str,
                       flip: bool = True, bias: bool = False) -> None:
        """torch ConvTranspose weight [I, O, *k] → flax [*k, I, O]."""
        w = self._take(f"{torch_prefix}.weight")
        rank = w.ndim - 2
        if flip:
            w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * rank]
        perm = tuple(range(2, 2 + rank)) + (0, 1)
        _set(self.params, f"{flax_path}/kernel", w.transpose(perm))
        if bias:
            _set(self.params, f"{flax_path}/bias",
                 self._take(f"{torch_prefix}.bias"))

    def bn(self, flax_path: str, torch_prefix: str) -> None:
        _set(self.params, f"{flax_path}/scale",
             self._take(f"{torch_prefix}.weight"))
        _set(self.params, f"{flax_path}/bias",
             self._take(f"{torch_prefix}.bias"))
        _set(self.stats, f"{flax_path}/mean",
             self._take(f"{torch_prefix}.running_mean"))
        _set(self.stats, f"{flax_path}/var",
             self._take(f"{torch_prefix}.running_var"))

    def raw(self, flax_path: str, key: str) -> None:
        """Copy a tensor verbatim (cls tokens, pos embeds, LayerScale γ)."""
        _set(self.params, flax_path, self._take(key))

    def dense(self, flax_path: str, torch_prefix: str,
              bias: bool = True) -> None:
        """torch Linear [O, I] → flax Dense kernel [I, O]."""
        w = self._take(f"{torch_prefix}.weight")
        _set(self.params, f"{flax_path}/kernel", w.T)
        if bias:
            _set(self.params, f"{flax_path}/bias",
                 self._take(f"{torch_prefix}.bias"))

    def layernorm(self, flax_path: str, torch_prefix: str) -> None:
        _set(self.params, f"{flax_path}/scale",
             self._take(f"{torch_prefix}.weight"))
        _set(self.params, f"{flax_path}/bias",
             self._take(f"{torch_prefix}.bias"))

    def attention(self, flax_path: str, torch_prefix: str,
                  num_heads: int) -> None:
        """torch fused-QKV attention (DINOv2 attention.py:29-61) → flax
        MultiHeadDotProductAttention {query,key,value,out} DenseGenerals."""
        qkv_w = self._take(f"{torch_prefix}.qkv.weight")  # [3D, D]
        qkv_b = self._take(f"{torch_prefix}.qkv.bias")
        d = qkv_w.shape[1]
        hd = d // num_heads
        for i, name in enumerate(("query", "key", "value")):
            w = qkv_w[i * d:(i + 1) * d]                  # [D, D] (out, in)
            _set(self.params, f"{flax_path}/{name}/kernel",
                 w.T.reshape(d, num_heads, hd))
            _set(self.params, f"{flax_path}/{name}/bias",
                 qkv_b[i * d:(i + 1) * d].reshape(num_heads, hd))
        w = self._take(f"{torch_prefix}.proj.weight")     # [D, D]
        _set(self.params, f"{flax_path}/out/kernel",
             w.T.reshape(num_heads, hd, d))
        _set(self.params, f"{flax_path}/out/bias",
             self._take(f"{torch_prefix}.proj.bias"))

    def bn_affine(self, flax_path: str, torch_prefix: str) -> None:
        """BN with track_running_stats=False (STTR) → BatchStatNorm params
        (scale/bias only, no batch_stats)."""
        _set(self.params, f"{flax_path}/scale",
             self._take(f"{torch_prefix}.weight"))
        _set(self.params, f"{flax_path}/bias",
             self._take(f"{torch_prefix}.bias"))

    def conv_wn(self, flax_path: str, torch_prefix: str,
                bias: bool = True) -> None:
        """torch weight_norm conv (weight_g/weight_v) → plain flax kernel:
        w = g · v / ||v|| with the norm over all non-output dims."""
        g = self._take(f"{torch_prefix}.weight_g")
        v = self._take(f"{torch_prefix}.weight_v")
        axes = tuple(range(1, v.ndim))
        w = g * v / np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        rank = w.ndim - 2
        perm = tuple(range(2, 2 + rank)) + (1, 0)
        _set(self.params, f"{flax_path}/kernel", w.transpose(perm))
        if bias:
            _set(self.params, f"{flax_path}/bias",
                 self._take(f"{torch_prefix}.bias"))

    def convbn(self, flax_prefix: str, torch_conv: str,
               torch_bn: str) -> None:
        """Reference convbn/convbn_3d Sequential (PSMNet submodule.py:10-18)
        → our ConvBNAct (Conv_0 + BatchNorm_0)."""
        self.conv(f"{flax_prefix}/Conv_0", torch_conv)
        self.bn(f"{flax_prefix}/BatchNorm_0", torch_bn)

    def finish(self, expect_unused: tuple = ("num_batches_tracked",)):
        leftovers = [k for k in self.sd if k not in self.used
                     and not any(t in k for t in expect_unused)]
        return {"params": self.params, "batch_stats": self.stats}, leftovers


def convert_psmnet(sd: dict) -> tuple[dict, list]:
    """Reference PSMNet (models/PSMNet/stackhourglass.py) → our PSMNet
    variables. Returns (variables, unconsumed_torch_keys)."""
    b = _Builder(sd)
    fe = "feature_extraction"

    # firstconv: Sequential(convbn, ReLU, convbn, ReLU, convbn, ReLU)
    for i in range(3):
        b.convbn(f"{fe}/ConvBNAct_{i}",
                 f"{fe}.firstconv.{2 * i}.0", f"{fe}.firstconv.{2 * i}.1")

    # layer1..layer4 → BasicResBlock_0..24 in creation order
    n = 0
    for layer, blocks in (("layer1", 3), ("layer2", 16), ("layer3", 3),
                          ("layer4", 3)):
        for blk in range(blocks):
            t = f"{fe}.{layer}.{blk}"
            f = f"{fe}/BasicResBlock_{n}"
            # conv1 = Sequential(convbn, ReLU) → extra .0 nesting
            b.convbn(f"{f}/ConvBNAct_0", f"{t}.conv1.0.0", f"{t}.conv1.0.1")
            b.convbn(f"{f}/ConvBNAct_1", f"{t}.conv2.0", f"{t}.conv2.1")
            if f"{t}.downsample.0.weight" in sd:
                b.convbn(f"{f}/ConvBNAct_2", f"{t}.downsample.0",
                         f"{t}.downsample.1")
            n += 1

    # SPP branches (AvgPool, convbn, ReLU) → ConvBNAct_3..6
    for i in range(4):
        b.convbn(f"{fe}/ConvBNAct_{3 + i}",
                 f"{fe}.branch{i + 1}.1.0", f"{fe}.branch{i + 1}.1.1")

    # lastconv: Sequential(convbn, ReLU, Conv2d 1x1)
    b.convbn(f"{fe}/ConvBNAct_7", f"{fe}.lastconv.0.0", f"{fe}.lastconv.0.1")
    b.conv(f"{fe}/Conv_0", f"{fe}.lastconv.2")

    # dres0/dres1: Sequential(convbn_3d, ReLU, convbn_3d[, ReLU])
    b.convbn("ConvBNAct_0", "dres0.0.0", "dres0.0.1")
    b.convbn("ConvBNAct_1", "dres0.2.0", "dres0.2.1")
    b.convbn("ConvBNAct_2", "dres1.0.0", "dres1.0.1")
    b.convbn("ConvBNAct_3", "dres1.2.0", "dres1.2.1")

    # hourglasses dres2/3/4 (stackhourglass.py:10-50)
    for i, dres in enumerate(("dres2", "dres3", "dres4")):
        hg = f"Hourglass3D_{i}"
        b.convbn(f"{hg}/ConvBNAct_0", f"{dres}.conv1.0.0", f"{dres}.conv1.0.1")
        b.convbn(f"{hg}/ConvBNAct_1", f"{dres}.conv2.0", f"{dres}.conv2.1")
        b.convbn(f"{hg}/ConvBNAct_2", f"{dres}.conv3.0.0", f"{dres}.conv3.0.1")
        b.convbn(f"{hg}/ConvBNAct_3", f"{dres}.conv4.0.0", f"{dres}.conv4.0.1")
        b.conv_transpose(f"{hg}/ConvTransposeBN_0/ConvTranspose_0",
                         f"{dres}.conv5.0")
        b.bn(f"{hg}/ConvTransposeBN_0/BatchNorm_0", f"{dres}.conv5.1")
        b.conv_transpose(f"{hg}/ConvTransposeBN_1/ConvTranspose_0",
                         f"{dres}.conv6.0")
        b.bn(f"{hg}/ConvTransposeBN_1/BatchNorm_0", f"{dres}.conv6.1")

    # classifier heads: Sequential(convbn_3d, ReLU, Conv3d(bias=False))
    for i in (1, 2, 3):
        b.convbn(f"classif{i}_conv", f"classif{i}.0.0", f"classif{i}.0.1")
        b.conv(f"classif{i}_out", f"classif{i}.2")

    return b.finish()


def _convert_res_trunk(b: _Builder, fe: str = "feature_extraction",
                       layers=(("layer1", 3), ("layer2", 16), ("layer3", 3),
                               ("layer4", 3))) -> int:
    """Shared PSMNet/GwcNet residual trunk: firstconv (3× convbn+ReLU) +
    4 BasicBlock stages (GwcNet gwcnet.py:18-28 ≡ PSMNet submodule.py:62-75).
    Returns the number of BasicResBlocks consumed."""
    for i in range(3):
        b.convbn(f"{fe}/ConvBNAct_{i}",
                 f"{fe}.firstconv.{2 * i}.0", f"{fe}.firstconv.{2 * i}.1")
    n = 0
    for layer, blocks in layers:
        for blk in range(blocks):
            t = f"{fe}.{layer}.{blk}"
            f = f"{fe}/BasicResBlock_{n}"
            b.convbn(f"{f}/ConvBNAct_0", f"{t}.conv1.0.0", f"{t}.conv1.0.1")
            b.convbn(f"{f}/ConvBNAct_1", f"{t}.conv2.0", f"{t}.conv2.1")
            if f"{t}.downsample.0.weight" in b.sd:
                b.convbn(f"{f}/ConvBNAct_2", f"{t}.downsample.0",
                         f"{t}.downsample.1")
            n += 1
    return n


def convert_gwcnet(sd: dict) -> tuple[dict, list]:
    """Reference GwcNet_G / GwcNet_GC (models/GwcNet/gwcnet.py) → our GwcNet
    variables. The concat-feature `lastconv` is present only for _GC."""
    b = _Builder(sd)
    fe = "feature_extraction"
    _convert_res_trunk(b, fe)
    if f"{fe}.lastconv.0.0.weight" in sd:  # GwcNet_GC (gwcnet.py:30-34)
        b.convbn(f"{fe}/ConvBNAct_3", f"{fe}.lastconv.0.0",
                 f"{fe}.lastconv.0.1")
        b.conv(f"{fe}/Conv_0", f"{fe}.lastconv.2")

    # dres0/dres1 (gwcnet.py:124-132)
    b.convbn("ConvBNAct_0", "dres0.0.0", "dres0.0.1")
    b.convbn("ConvBNAct_1", "dres0.2.0", "dres0.2.1")
    b.convbn("ConvBNAct_2", "dres1.0.0", "dres1.0.1")
    b.convbn("ConvBNAct_3", "dres1.2.0", "dres1.2.1")

    # redirected hourglasses dres2/3/4 (gwcnet.py:68-105)
    for i, dres in enumerate(("dres2", "dres3", "dres4")):
        hg = f"HourglassRedir_{i}"
        b.convbn(f"{hg}/ConvBNAct_0", f"{dres}.conv1.0.0", f"{dres}.conv1.0.1")
        b.convbn(f"{hg}/ConvBNAct_1", f"{dres}.conv2.0.0", f"{dres}.conv2.0.1")
        b.convbn(f"{hg}/ConvBNAct_2", f"{dres}.conv3.0.0", f"{dres}.conv3.0.1")
        b.convbn(f"{hg}/ConvBNAct_3", f"{dres}.conv4.0.0", f"{dres}.conv4.0.1")
        b.conv_transpose(f"{hg}/ConvTransposeBN_0/ConvTranspose_0",
                         f"{dres}.conv5.0")
        b.bn(f"{hg}/ConvTransposeBN_0/BatchNorm_0", f"{dres}.conv5.1")
        b.conv_transpose(f"{hg}/ConvTransposeBN_1/ConvTranspose_0",
                         f"{dres}.conv6.0")
        b.bn(f"{hg}/ConvTransposeBN_1/BatchNorm_0", f"{dres}.conv6.1")
        b.convbn(f"{hg}/ConvBNAct_4", f"{dres}.redir2.0", f"{dres}.redir2.1")
        b.convbn(f"{hg}/ConvBNAct_5", f"{dres}.redir1.0", f"{dres}.redir1.1")

    # classif0..classif3 (gwcnet.py:139-154)
    for i in range(4):
        b.convbn(f"classif{i}_conv", f"classif{i}.0.0", f"classif{i}.0.1")
        b.conv(f"classif{i}_out", f"classif{i}.2")

    return b.finish()


def _acv_hourglass(b: _Builder, f: str, t: str) -> None:
    """Reference ACV hourglass with bottleneck attention (acv.py:56-96) →
    our HourglassAttn."""
    for i, c in enumerate(("conv1", "conv2", "conv3", "conv4")):
        b.convbn(f"{f}/ConvBNAct_{i}", f"{t}.{c}.0.0", f"{t}.{c}.0.1")
    ab = f"{f}/BlockAttention3D_0"
    b.dense(f"{ab}/qkv", f"{t}.attention_block.qkv_3d")
    b.conv(f"{ab}/proj", f"{t}.attention_block.final1x1", bias=True)
    b.conv_transpose(f"{f}/ConvTransposeBN_0/ConvTranspose_0", f"{t}.conv5.0")
    b.bn(f"{f}/ConvTransposeBN_0/BatchNorm_0", f"{t}.conv5.1")
    b.conv_transpose(f"{f}/ConvTransposeBN_1/ConvTranspose_0", f"{t}.conv6.0")
    b.bn(f"{f}/ConvTransposeBN_1/BatchNorm_0", f"{t}.conv6.1")
    b.convbn(f"{f}/ConvBNAct_4", f"{t}.redir2.0", f"{t}.redir2.1")
    b.convbn(f"{f}/ConvBNAct_5", f"{t}.redir1.0", f"{t}.redir1.1")


def convert_acvnet(sd: dict) -> tuple[dict, list]:
    """Reference ACVNet (models/ACVNet/acv.py:95-255, full two-branch
    config) → our ACVNet variables."""
    b = _Builder(sd)
    _convert_res_trunk(b, "feature_extraction")

    # attention-weights branch (acv.py:109-121)
    for p in ("patch", "patch_l1", "patch_l2", "patch_l3"):
        b.conv(p, p)
    b.convbn("ConvBNAct_0", "dres1_att_.0.0", "dres1_att_.0.1")
    b.convbn("ConvBNAct_1", "dres1_att_.2.0", "dres1_att_.2.1")
    _acv_hourglass(b, "HourglassAttn_0", "dres2_att_")
    b.convbn("ConvBNAct_2", "classif_att_.0.0", "classif_att_.0.1")
    b.conv("Conv_0", "classif_att_.2")

    # main branch (acv.py:122-146)
    b.convbn("concatconv_0", "concatconv.0.0", "concatconv.0.1")
    b.conv("concatconv_1", "concatconv.2")
    b.convbn("ConvBNAct_3", "dres0.0.0", "dres0.0.1")
    b.convbn("ConvBNAct_4", "dres0.2.0", "dres0.2.1")
    b.convbn("ConvBNAct_5", "dres1.0.0", "dres1.0.1")
    b.convbn("ConvBNAct_6", "dres1.2.0", "dres1.2.1")
    _acv_hourglass(b, "HourglassAttn_1", "dres2")
    _acv_hourglass(b, "HourglassAttn_2", "dres3")
    for i in range(3):
        b.convbn(f"classif{i}_conv", f"classif{i}.0.0", f"classif{i}.0.1")
        b.conv(f"classif{i}_out", f"classif{i}.2")
    return b.finish()


def _mish_hourglass(b: _Builder, f: str, t: str) -> None:
    """CFNet/PCWNet redir hourglass with Mish (CFNet/cfnet.py:231-272) →
    our HourglassMish."""
    for i, c in enumerate(("conv1", "conv2", "conv3", "conv4")):
        b.convbn(f"{f}/ConvBNAct_{i}", f"{t}.{c}.0.0", f"{t}.{c}.0.1")
    b.conv_transpose(f"{f}/ConvTransposeBN_0/ConvTranspose_0", f"{t}.conv5.0")
    b.bn(f"{f}/ConvTransposeBN_0/BatchNorm_0", f"{t}.conv5.1")
    b.convbn(f"{f}/ConvBNAct_4", f"{t}.redir2.0", f"{t}.redir2.1")
    b.conv_transpose(f"{f}/ConvTransposeBN_1/ConvTranspose_0", f"{t}.conv6.0")
    b.bn(f"{f}/ConvTransposeBN_1/BatchNorm_0", f"{t}.conv6.1")
    b.convbn(f"{f}/ConvBNAct_5", f"{t}.redir1.0", f"{t}.redir1.1")


def convert_cfnet(sd: dict) -> tuple[dict, list]:
    """Reference CFNet (models/CFNet/cfnet.py:274-436, use_concat_volume)
    → our CFNet variables."""
    b = _Builder(sd)
    fe = "feature_extraction"
    for i in range(3):
        b.convbn(f"{fe}/ConvBNAct_{i}", f"{fe}.firstconv.{2 * i}.0",
                 f"{fe}.firstconv.{2 * i}.1")
    # UNet encoder: single Mish BasicBlock per scale (cfnet.py:26-30)
    for n, layer in enumerate(("layer2", "layer3", "layer4", "layer5",
                               "layer6")):
        t = f"{fe}.{layer}.0"
        f = f"{fe}/CFBasicBlock_{n}"
        b.convbn(f"{f}/ConvBNAct_0", f"{t}.conv1.0.0", f"{t}.conv1.0.1")
        b.convbn(f"{f}/ConvBNAct_1", f"{t}.conv2.0", f"{t}.conv2.1")
        b.convbn(f"{f}/ConvBNAct_2", f"{t}.downsample.0",
                 f"{t}.downsample.1")
    for i in range(4):
        b.convbn(f"{fe}/PyramidPooling_0/path{i}",
                 f"{fe}.pyramid_pooling.path_module_list.{i}.cbr_unit.0",
                 f"{fe}.pyramid_pooling.path_module_list.{i}.cbr_unit.1")
    for up in ("upconv6", "upconv5", "upconv4", "upconv3"):
        b.convbn(f"{fe}/{up}", f"{fe}.{up}.1.0", f"{fe}.{up}.1.1")
    for ic in ("iconv5", "iconv4", "iconv3", "iconv2"):
        b.convbn(f"{fe}/{ic}", f"{fe}.{ic}.0.0", f"{fe}.{ic}.0.1")
    for head in ("gw2", "gw3", "gw4", "gw5", "gw6", "concat2", "concat3",
                 "concat4", "concat5", "concat6"):
        b.convbn(f"{fe}/{head}_0", f"{fe}.{head}.0.0", f"{fe}.{head}.0.1")
        b.conv(f"{fe}/{head}_1", f"{fe}.{head}.2")

    # pre-hourglass residual stacks (dres / confidence pairs)
    for ours, t0, t1 in (
            ("dres4", "dres0", "dres1"), ("dres5", "dres0_5", "dres1_5"),
            ("dres6", "dres0_6", "dres1_6"),
            ("confidence_s3", "confidence0_s3", "confidence1_s3"),
            ("confidence_s2", "confidence0_s2", "confidence1_s2")):
        b.convbn(f"{ours}_a", f"{t0}.0.0", f"{t0}.0.1")
        b.convbn(f"{ours}_b", f"{t0}.2.0", f"{t0}.2.1")
        b.convbn(f"{ours}_c", f"{t1}.0.0", f"{t1}.0.1")
        b.convbn(f"{ours}_d", f"{t1}.2.0", f"{t1}.2.1")

    # multi-scale fusing hourglassup (cfnet.py:178-230)
    hu = "combine1"
    b.conv(f"{hu}/Conv_0", "combine1.conv1")
    b.convbn(f"{hu}/combine1", "combine1.combine1.0.0",
             "combine1.combine1.0.1")
    b.convbn(f"{hu}/ConvBNAct_0", "combine1.conv2.0.0", "combine1.conv2.0.1")
    b.conv(f"{hu}/Conv_1", "combine1.conv3")
    b.convbn(f"{hu}/combine2", "combine1.combine2.0.0",
             "combine1.combine2.0.1")
    b.convbn(f"{hu}/ConvBNAct_1", "combine1.conv4.0.0", "combine1.conv4.0.1")
    b.conv_transpose(f"{hu}/ConvTransposeBN_0/ConvTranspose_0",
                     "combine1.conv8.0")
    b.bn(f"{hu}/ConvTransposeBN_0/BatchNorm_0", "combine1.conv8.1")
    b.convbn(f"{hu}/ConvBNAct_2", "combine1.redir2.0", "combine1.redir2.1")
    b.conv_transpose(f"{hu}/ConvTransposeBN_1/ConvTranspose_0",
                     "combine1.conv9.0")
    b.bn(f"{hu}/ConvTransposeBN_1/BatchNorm_0", "combine1.conv9.1")
    b.convbn(f"{hu}/ConvBNAct_3", "combine1.redir1.0", "combine1.redir1.1")

    for hg in ("dres3", "confidence2_s3", "confidence3_s3",
               "confidence2_s2", "confidence3_s2"):
        _mish_hourglass(b, hg, hg)

    for cl in ("classif0", "classif1", "classif2", "confidence_classif0_s3",
               "confidence_classif1_s3", "confidence_classifmid_s3",
               "confidence_classif0_s2", "confidence_classif1_s2",
               "confidence_classifmid_s2"):
        b.convbn(f"{cl}_conv", f"{cl}.0.0", f"{cl}.0.1")
        b.conv(f"{cl}_out", f"{cl}.2")

    for p in ("gamma_s3", "beta_s3", "gamma_s2", "beta_s2"):
        b.raw(p, p)

    # hourglassup registers combine3/redir3 but its forward never uses them
    # (cfnet.py:206-231)
    return b.finish(expect_unused=("num_batches_tracked",
                                   "combine1.combine3", "combine1.redir3"))


def convert_sttr(sd: dict) -> tuple[dict, list]:
    """Reference STTR (models/STTR/sttr.py:17-145, default 'ot' config) →
    our STTR variables. All BNs are affine-only (track_running_stats=False,
    sttr.py `_disable_batchnorm_tracking`) and the CAL convs use weight_norm
    (context_adjustment_layer.py:20-31) — folded at conversion."""
    b = _Builder(sd)

    def sconv(f, tc, tb):
        b.conv(f"{f}/Conv_0", tc)
        b.bn_affine(f"{f}/BatchStatNorm_0", tb)

    # backbone (feat_extractor_backbone.py:15-103)
    bb = "backbone"
    for i in range(3):
        sconv(f"{bb}/SConvBN_{i}", f"{bb}.in_conv.{3 * i}",
              f"{bb}.in_conv.{3 * i + 1}")
    n = 0
    for res in ("resblock_1", "resblock_2"):
        for blk in range(3):
            f = f"{bb}/STTRResBlock_{n}"
            t = f"{bb}.{res}.{blk}"
            sconv(f"{f}/SConvBN_0", f"{t}.conv1", f"{t}.bn1")
            sconv(f"{f}/SConvBN_1", f"{t}.conv2", f"{t}.bn2")
            if blk == 0:
                sconv(f"{f}/SConvBN_2", f"{t}.downsample.0",
                      f"{t}.downsample.1")
            n += 1
    for i in range(4):
        sconv(f"{bb}/SConvBN_{3 + i}", f"{bb}.branch{i + 1}.1",
              f"{bb}.branch{i + 1}.2")

    # tokenizer (feat_extractor_tokenizer.py:62-117)
    tk = "tokenizer"

    def dense_block(f, t, layers=4):
        for j in range(layers):
            tl = f"{t}.denselayer{j + 1}"
            b.bn_affine(f"{f}/BatchStatNorm_{2 * j}", f"{tl}.norm1")
            b.conv(f"{f}/Conv_{2 * j}", f"{tl}.conv1")
            b.bn_affine(f"{f}/BatchStatNorm_{2 * j + 1}", f"{tl}.norm2")
            b.conv(f"{f}/Conv_{2 * j + 1}", f"{tl}.conv2")

    dense_block(f"{tk}/DenseBlock_0", f"{tk}.bottle_neck")
    b.conv_transpose(f"{tk}/ConvTranspose_0", f"{tk}.up.0.convTrans",
                     bias=True)
    dense_block(f"{tk}/DenseBlock_1", f"{tk}.dense_block.0")
    b.conv_transpose(f"{tk}/ConvTranspose_1", f"{tk}.up.1.convTrans",
                     bias=True)
    dense_block(f"{tk}/DenseBlock_2", f"{tk}.dense_block.1")
    b.conv_transpose(f"{tk}/ConvTranspose_2", f"{tk}.up.2.convTrans.0")
    b.bn_affine(f"{tk}/BatchStatNorm_0", f"{tk}.up.2.convTrans.1")
    b.conv_transpose(f"{tk}/ConvTranspose_3", f"{tk}.up.2.convTrans.2",
                     bias=True)
    sconv(f"{tk}/SConvBN_0", f"{tk}.dense_block.2.double_conv.0",
          f"{tk}.dense_block.2.double_conv.1")
    sconv(f"{tk}/SConvBN_1", f"{tk}.dense_block.2.double_conv.3",
          f"{tk}.dense_block.2.double_conv.4")

    # transformer (transformer.py:17-230): per-layer shared-view self attn
    # and cross attn; torch nn.MultiheadAttention in_proj is [3C, C] → our
    # in_proj_w is its transpose
    tr = "transformer"
    for i in range(6):
        for ours, t in ((f"self_attn_{i}",
                         f"{tr}.self_attn_layers.{i}.self_attn"),
                        (f"cross_attn_{i}",
                         f"{tr}.cross_attn_layers.{i}.cross_attn")):
            _set(b.params, f"{tr}/{ours}/in_proj_w",
                 b._take(f"{t}.in_proj_weight").T)
            _set(b.params, f"{tr}/{ours}/in_proj_b",
                 b._take(f"{t}.in_proj_bias"))
            b.dense(f"{tr}/{ours}/out_proj", f"{t}.out_proj")
        b.layernorm(f"{tr}/self_norm_{i}",
                    f"{tr}.self_attn_layers.{i}.norm1")
        b.layernorm(f"{tr}/cross_norm1_{i}",
                    f"{tr}.cross_attn_layers.{i}.norm1")
        b.layernorm(f"{tr}/cross_norm2_{i}",
                    f"{tr}.cross_attn_layers.{i}.norm2")

    # regression head: dustbin cost + context adjustment layer
    _set(b.params, "phi", b._take("regression_head.phi").reshape(1))
    cal = "cal"
    tcal = "regression_head.cal"
    b.conv(f"{cal}/Conv_0", f"{tcal}.in_conv", bias=True)
    for i in range(8):
        b.conv_wn(f"{cal}/res{i}_a", f"{tcal}.layers.{i}.module.0")
        b.conv_wn(f"{cal}/res{i}_b", f"{tcal}.layers.{i}.module.2")
    b.conv(f"{cal}/Conv_1", f"{tcal}.out_conv", bias=True)
    for fi, ti in ((2, 0), (3, 1), (4, 3), (5, 4)):
        b.conv_wn(f"{cal}/Conv_{fi}", f"{tcal}.occ_head.{ti}")
    b.conv(f"{cal}/Conv_6", f"{tcal}.occ_head.6", bias=True)

    # transformer.norm is registered but unused by the forward
    # (transformer.py:31 vs :37-116)
    return b.finish(expect_unused=("num_batches_tracked",
                                   "transformer.norm."))


def convert_pcwnet(sd: dict) -> tuple[dict, list]:
    """Reference PCWNet_G/_GC (models/PCWNet/pcwnet.py:311-512) → our PCWNet
    variables. The concat heads exist only for _GC."""
    b = _Builder(sd)
    fe = "feature_extraction"
    for i in range(3):
        b.convbn(f"{fe}/ConvBNAct_{i}", f"{fe}.firstconv.{2 * i}.0",
                 f"{fe}.firstconv.{2 * i}.1")

    def mish_block(f, t, downsample):
        b.convbn(f"{f}/ConvBNAct_0", f"{t}.conv1.0.0", f"{t}.conv1.0.1")
        b.convbn(f"{f}/ConvBNAct_1", f"{t}.conv2.0", f"{t}.conv2.1")
        if downsample:
            b.convbn(f"{f}/ConvBNAct_2", f"{t}.downsample.0",
                     f"{t}.downsample.1")

    # trunk: Mish BasicBlocks; layer4 is the dilated stage (pcwnet.py:25-34)
    n = 0
    for layer, blocks, down in (("layer1", 3, False), ("layer2", 16, True),
                                ("layer3", 3, True)):
        for blk in range(blocks):
            mish_block(f"{fe}/CFBasicBlock_{n}", f"{fe}.{layer}.{blk}",
                       down and blk == 0)
            n += 1
    for blk in range(3):
        mish_block(f"{fe}/_DilatedBlock_{blk}", f"{fe}.layer4.{blk}", False)
    for layer in ("layer5", "layer7", "layer9"):
        for blk in range(3):
            mish_block(f"{fe}/CFBasicBlock_{n}", f"{fe}.{layer}.{blk}",
                       blk == 0)
            n += 1

    # per-scale gw / concat heads; torch names the 1/4 ones layer11/lastconv
    heads = [("gw1", "layer11"), ("gw2", "gw2"), ("gw3", "gw3"),
             ("gw4", "gw4")]
    if f"{fe}.lastconv.0.0.weight" in sd:  # _GC
        heads += [("concat1", "lastconv"), ("concat2", "concat2"),
                  ("concat3", "concat3"), ("concat4", "concat4")]
    for ours, t in heads:
        b.convbn(f"{fe}/{ours}_0", f"{fe}.{t}.0.0", f"{fe}.{t}.0.1")
        b.conv(f"{fe}/{ours}_1", f"{fe}.{t}.2")
    b.convbn(f"{fe}/refine_0", f"{fe}.layer_refine.0.0",
             f"{fe}.layer_refine.0.1")
    b.convbn(f"{fe}/refine_1", f"{fe}.layer_refine.2.0",
             f"{fe}.layer_refine.2.1")

    # dres0/dres1
    b.convbn("ConvBNAct_0", "dres0.0.0", "dres0.0.1")
    b.convbn("ConvBNAct_1", "dres0.2.0", "dres0.2.1")
    b.convbn("ConvBNAct_2", "dres1.0.0", "dres1.0.1")
    b.convbn("ConvBNAct_3", "dres1.2.0", "dres1.2.1")

    # three-scale fusing hourglassup (pcwnet.py:133-209)
    hu = "combine1"
    b.conv(f"{hu}/Conv_0", "combine1.conv1")
    b.convbn(f"{hu}/combine1", "combine1.combine1.0.0",
             "combine1.combine1.0.1")
    b.convbn(f"{hu}/ConvBNAct_0", "combine1.conv2.0.0", "combine1.conv2.0.1")
    b.conv(f"{hu}/Conv_1", "combine1.conv3")
    b.convbn(f"{hu}/combine2", "combine1.combine2.0.0",
             "combine1.combine2.0.1")
    b.convbn(f"{hu}/ConvBNAct_1", "combine1.conv4.0.0", "combine1.conv4.0.1")
    b.conv(f"{hu}/Conv_2", "combine1.conv5")
    b.convbn(f"{hu}/combine3", "combine1.combine3.0.0",
             "combine1.combine3.0.1")
    b.convbn(f"{hu}/ConvBNAct_2", "combine1.conv6.0.0", "combine1.conv6.0.1")
    for i, (tc, rc, ci) in enumerate((("conv7", "redir3", 3),
                                      ("conv8", "redir2", 4),
                                      ("conv9", "redir1", 5))):
        b.conv_transpose(f"{hu}/ConvTransposeBN_{i}/ConvTranspose_0",
                         f"combine1.{tc}.0")
        b.bn(f"{hu}/ConvTransposeBN_{i}/BatchNorm_0", f"combine1.{tc}.1")
        b.convbn(f"{hu}/ConvBNAct_{ci}", f"combine1.{rc}.0",
                 f"combine1.{rc}.1")

    for i, hg in enumerate(("dres2", "dres3", "dres4")):
        _mish_hourglass(b, f"HourglassMish_{i}", hg)

    for cl in ("classif0", "classif1", "classif2", "classif3", "classif4"):
        b.convbn(f"{cl}_conv", f"{cl}.0.0", f"{cl}.0.1")
        b.conv(f"{cl}_out", f"{cl}.2")

    # full-res refinement (pcwnet.py:254-309, :441-480)
    b.convbn("dispupsample", "dispupsample.0.0", "dispupsample.0.1")
    rf = "refinenet3"
    for i in range(4):
        b.convbn(f"{rf}/ConvBNAct_{i}", f"{rf}.conv{i + 1}.0.0",
                 f"{rf}.conv{i + 1}.0.1")
    for i, tc in enumerate(("conv5", "conv6", "conv7")):
        mish_block(f"{rf}/_DilatedBlock_{i}", f"{rf}.{tc}.0", True)
    b.conv(f"{rf}/Conv_0", f"{rf}.conv8")

    return b.finish()


def _raft_res(b: _Builder, flax_path: str, torch_path: str, norm: str,
              downsample: bool) -> None:
    """Reference RAFTStereo ResidualBlock (models/RAFTStereo/extractor.py:6-60)
    → our RAFTResBlock. Instance norm carries no params; batch norm maps to
    BatchNorm_{0,1,2}. The reference registers the downsample norm twice
    (`norm3` and `downsample.1`); we consume `downsample.1` and the caller
    expects `norm3` unused."""
    b.conv(f"{flax_path}/Conv_0", f"{torch_path}.conv1", bias=True)
    b.conv(f"{flax_path}/Conv_1", f"{torch_path}.conv2", bias=True)
    if norm == "batch":
        b.bn(f"{flax_path}/BatchNorm_0", f"{torch_path}.norm1")
        b.bn(f"{flax_path}/BatchNorm_1", f"{torch_path}.norm2")
    if downsample:
        b.conv(f"{flax_path}/Conv_2", f"{torch_path}.downsample.0", bias=True)
        if norm == "batch":
            b.bn(f"{flax_path}/BatchNorm_2", f"{torch_path}.downsample.1")


def convert_raft_stereo(sd: dict) -> tuple[dict, list]:
    """Reference RAFTStereo (models/RAFTStereo/raft_stereo.py:25-66, default
    config: hidden_dims 3×128, n_downsample=2, n_gru_layers=3) → our
    RAFTStereo variables."""
    b = _Builder(sd)

    # fnet: BasicEncoder(256, 'instance', downsample=2) — instance norms are
    # param-free (extractor.py:122-199)
    b.conv("fnet/Conv_0", "fnet.conv1", bias=True)
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"fnet/RAFTResBlock_{n}", f"fnet.{layer}.{blk}",
                      "instance", down and blk == 0)
            n += 1
    b.conv("fnet/Conv_1", "fnet.conv2", bias=True)

    # cnet: MultiBasicEncoder(batch norm) (extractor.py:200-306)
    _convert_multi_basic_encoder(b, "cnet")

    # context-gate convs, computed once outside the loop (raft_stereo.py:55)
    for i in range(3):
        b.conv(f"context_zqr_{i}", f"context_zqr_convs.{i}", bias=True)

    # update block inside the nn.scan step (params are broadcast → same tree)
    ub = "step/update_block"
    for g in ("gru08", "gru16", "gru32"):
        for c in ("convz", "convr", "convq"):
            b.conv(f"{ub}/{g}/{c}", f"update_block.{g}.{c}", bias=True)
    for i, t in enumerate(("convc1", "convc2", "convf1", "convf2", "conv")):
        b.conv(f"{ub}/encoder/Conv_{i}", f"update_block.encoder.{t}",
               bias=True)
    b.conv(f"{ub}/flow_head_1", "update_block.flow_head.conv1", bias=True)
    b.conv(f"{ub}/flow_head_2", "update_block.flow_head.conv2", bias=True)
    b.conv(f"{ub}/mask_1", "update_block.mask.0", bias=True)
    b.conv(f"{ub}/mask_2", "update_block.mask.2", bias=True)

    return b.finish(expect_unused=("num_batches_tracked", ".norm3."))


def _convert_multi_basic_encoder(b: _Builder, fe: str = "cnet",
                                 out_names=("outputs08", "outputs16",
                                            "outputs32")) -> None:
    """MultiBasicEncoder (RAFT extractor.py:200-306 ≡ IGEV extractor.py
    :200-306, output attr names differ) → our `cnet` scope."""
    b.conv(f"{fe}/Conv_0", f"{fe}.conv1", bias=True)
    b.bn(f"{fe}/BatchNorm_0", f"{fe}.norm1")
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"{fe}/RAFTResBlock_{n}", f"{fe}.{layer}.{blk}",
                      "batch", down and blk == 0)
            n += 1
    o = out_names
    _raft_res(b, f"{fe}/RAFTResBlock_6", f"{fe}.{o[0]}.0.0", "batch", False)
    b.conv(f"{fe}/Conv_1", f"{fe}.{o[0]}.0.1", bias=True)
    _raft_res(b, f"{fe}/RAFTResBlock_7", f"{fe}.{o[0]}.1.0", "batch", False)
    b.conv(f"{fe}/Conv_2", f"{fe}.{o[0]}.1.1", bias=True)
    _raft_res(b, f"{fe}/RAFTResBlock_8", f"{fe}.layer4.0", "batch", True)
    _raft_res(b, f"{fe}/RAFTResBlock_9", f"{fe}.layer4.1", "batch", False)
    _raft_res(b, f"{fe}/RAFTResBlock_10", f"{fe}.{o[1]}.0.0", "batch", False)
    b.conv(f"{fe}/Conv_3", f"{fe}.{o[1]}.0.1", bias=True)
    _raft_res(b, f"{fe}/RAFTResBlock_11", f"{fe}.{o[1]}.1.0", "batch", False)
    b.conv(f"{fe}/Conv_4", f"{fe}.{o[1]}.1.1", bias=True)
    _raft_res(b, f"{fe}/RAFTResBlock_12", f"{fe}.layer5.0", "batch", True)
    _raft_res(b, f"{fe}/RAFTResBlock_13", f"{fe}.layer5.1", "batch", False)
    b.conv(f"{fe}/Conv_5", f"{fe}.{o[2]}.0", bias=True)
    b.conv(f"{fe}/Conv_6", f"{fe}.{o[2]}.1", bias=True)


def _convert_mobilenetv2_trunk(b: _Builder, flax: str, torch_pfx: str,
                               stage_key) -> None:
    """timm mobilenetv2_100 trunk (features_only; reference IGEV
    extractor.py:327-346 re-wraps stages 0-5 as block0..block4) → our
    `MobileNetV2Trunk`. `stage_key(stage, idx)` maps a timm (stage, block)
    pair to its torch key prefix."""
    b.conv(f"{flax}/Conv_0", f"{torch_pfx}.conv_stem")
    b.bn(f"{flax}/BatchNorm_0", f"{torch_pfx}.bn1")
    repeats = (1, 2, 3, 4, 3, 3)
    n = 0
    for stage, reps in enumerate(repeats):
        for j in range(reps):
            t = stage_key(stage, j)
            f = f"{flax}/InvertedResidual_{n}"
            if stage == 0:  # DepthwiseSeparableConv: dw → pw
                b.conv(f"{f}/Conv_0", f"{t}.conv_dw")
                b.bn(f"{f}/BatchNorm_0", f"{t}.bn1")
                b.conv(f"{f}/Conv_1", f"{t}.conv_pw")
                b.bn(f"{f}/BatchNorm_1", f"{t}.bn2")
            else:  # InvertedResidual: pw → dw → pwl
                b.conv(f"{f}/Conv_0", f"{t}.conv_pw")
                b.bn(f"{f}/BatchNorm_0", f"{t}.bn1")
                b.conv(f"{f}/Conv_1", f"{t}.conv_dw")
                b.bn(f"{f}/BatchNorm_1", f"{t}.bn2")
                b.conv(f"{f}/Conv_2", f"{t}.conv_pwl")
                b.bn(f"{f}/BatchNorm_2", f"{t}.bn3")
            n += 1


def _conv2x(b: _Builder, flax: str, torch_pfx: str,
            instance_norm: bool) -> None:
    """IGEV Conv2x / Conv2x_IN (submodule.py:40-80, :111-147): deconv conv1
    + post-concat conv2."""
    unit = "BasicConvIN" if instance_norm else "BasicConvBN"
    b.conv_transpose(f"{flax}/{unit}_0/ConvTranspose_0",
                     f"{torch_pfx}.conv1.conv")
    b.conv(f"{flax}/{unit}_1/Conv_0", f"{torch_pfx}.conv2.conv")
    if not instance_norm:
        b.bn(f"{flax}/{unit}_0/BatchNorm_0", f"{torch_pfx}.conv1.bn")
        b.bn(f"{flax}/{unit}_1/BatchNorm_0", f"{torch_pfx}.conv2.bn")


def _convert_igev_common(b: _Builder) -> None:
    """Shared IGEV-family plumbing (IGEVStereo ≡ SelectiveIGEV init,
    igev_stereo.py:92-151): MobileNetV2 feature pyramid, stems, matching
    descriptors, GEV hourglass, classifier, cnet and superpixel upsamplers."""
    # Feature: MobileNetV2 trunk split at block0..block4
    # (extractor.py:327-346: stages [0],[1],[2],[3,4],[5])
    stage_to_block = {0: ("block0", 0), 1: ("block1", 0), 2: ("block2", 0),
                      3: ("block3", 0), 4: ("block3", 1), 5: ("block4", 0)}

    def stage_key(stage, j):
        blk, idx = stage_to_block[stage]
        return f"feature.{blk}.{idx}.{j}"

    _convert_mobilenetv2_trunk(b, "feature/trunk", "feature", stage_key)
    for name in ("deconv32_16", "deconv16_8", "deconv8_4"):
        _conv2x(b, f"feature/{name}", f"feature.{name}", instance_norm=True)
    b.conv("feature/conv4/Conv_0", "feature.conv4.conv")

    # stems (igev_stereo.py:124-131): Sequential(BasicConv_IN, Conv, IN, ReLU)
    b.conv("stem_2a/Conv_0", "stem_2.0.conv")
    b.conv("stem_2b", "stem_2.1")
    b.conv("stem_4a/Conv_0", "stem_4.0.conv")
    b.conv("stem_4b", "stem_4.1")

    # matching descriptors (igev_stereo.py:145-146)
    b.conv("conv/Conv_0", "conv.conv")
    b.conv("desc", "desc", bias=True)

    # volume stem + attention + GEV hourglass (igev_stereo.py:148-151)
    b.conv("corr_stem/Conv_0", "corr_stem.conv")
    b.bn("corr_stem/BatchNorm_0", "corr_stem.bn")
    b.convbn("corr_feature_att/ConvBNAct_0", "corr_feature_att.feat_att.0.conv",
             "corr_feature_att.feat_att.0.bn")
    b.conv("corr_feature_att/Conv_0", "corr_feature_att.feat_att.1", bias=True)

    hg = "cost_agg"
    seq = [("conv1.0", 0), ("conv1.1", 1), ("conv2.0", 2), ("conv2.1", 3),
           ("conv3.0", 4), ("conv3.1", 5), ("agg_0.0", 7), ("agg_0.1", 8),
           ("agg_0.2", 9), ("agg_1.0", 11), ("agg_1.1", 12), ("agg_1.2", 13)]
    for tname, i in seq:
        b.conv(f"{hg}/BasicConvBN_{i}/Conv_0", f"{hg}.{tname}.conv")
        b.bn(f"{hg}/BasicConvBN_{i}/BatchNorm_0", f"{hg}.{tname}.bn")
    for tname, i in (("conv3_up", 6), ("conv2_up", 10)):
        b.conv_transpose(f"{hg}/BasicConvBN_{i}/ConvTranspose_0",
                         f"{hg}.{tname}.conv")
        b.bn(f"{hg}/BasicConvBN_{i}/BatchNorm_0", f"{hg}.{tname}.bn")
    b.conv_transpose(f"{hg}/BasicConvBN_14/ConvTranspose_0",
                     f"{hg}.conv1_up.conv")
    for i, att in enumerate(("feature_att_8", "feature_att_16",
                             "feature_att_32", "feature_att_up_16",
                             "feature_att_up_8")):
        b.convbn(f"{hg}/FeatureAtt_{i}/ConvBNAct_0",
                 f"{hg}.{att}.feat_att.0.conv", f"{hg}.{att}.feat_att.0.bn")
        b.conv(f"{hg}/FeatureAtt_{i}/Conv_0", f"{hg}.{att}.feat_att.1",
               bias=True)
    b.conv("classifier", "classifier")

    # context network
    _convert_multi_basic_encoder(b, "cnet",
                                 ("outputs04", "outputs08", "outputs16"))

    # superpixel upsamplers (igev_stereo.py:133-143)
    b.conv("spx_4/Conv_0", "spx_4.0.conv")
    b.conv("spx_4b", "spx_4.1")
    _conv2x(b, "spx_2", "spx_2", instance_norm=True)
    b.conv_transpose("spx", "spx.0", bias=True)
    _conv2x(b, "step/spx_2_gru", "spx_2_gru", instance_norm=False)
    b.conv_transpose("step/spx_gru", "spx_gru.0", bias=True)

    # motion encoder + heads shared by both update-block variants
    ub = "step/update_block"
    for i, t in enumerate(("convc1", "convc2", "convd1", "convd2", "conv")):
        b.conv(f"{ub}/encoder/Conv_{i}", f"update_block.encoder.{t}",
               bias=True)
    b.conv(f"{ub}/disp_head_1", "update_block.disp_head.conv1", bias=True)
    b.conv(f"{ub}/disp_head_2", "update_block.disp_head.conv2", bias=True)
    b.conv(f"{ub}/mask_feat_4", "update_block.mask_feat_4.0", bias=True)


def convert_igev_stereo(sd: dict) -> tuple[dict, list]:
    """Reference IGEVStereo (models/IGEVStereo/igev_stereo.py:92-255, default
    config) → our IGEVStereo variables."""
    b = _Builder(sd)
    _convert_igev_common(b)
    for i in range(3):
        b.conv(f"context_zqr_{i}", f"context_zqr_convs.{i}", bias=True)
    ub = "step/update_block"
    for g in ("gru04", "gru08", "gru16"):
        for c in ("convz", "convr", "convq"):
            b.conv(f"{ub}/{g}/{c}", f"update_block.{g}.{c}", bias=True)
    return b.finish(expect_unused=("num_batches_tracked", ".norm3."))


def convert_selective_raft(sd: dict) -> tuple[dict, list]:
    """Reference SelectiveRAFT (models/SelectiveStereo/SelectiveRAFT/
    raft.py:25-58) → our SelectiveRAFT variables: RAFT's fnet/cnet with
    CAM/SAM context attention and dual-kernel SelectiveConvGRUs."""
    b = _Builder(sd)
    b.conv("fnet/Conv_0", "fnet.conv1", bias=True)
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"fnet/RAFTResBlock_{n}", f"fnet.{layer}.{blk}",
                      "instance", down and blk == 0)
            n += 1
    b.conv("fnet/Conv_1", "fnet.conv2", bias=True)
    _convert_multi_basic_encoder(b, "cnet")
    b.conv("cam/fc1", "cam.fc.0")
    b.conv("cam/fc2", "cam.fc.2")
    b.conv("sam/Conv_0", "sam.samconv")
    ub = "step/update_block"
    for g in ("gru04", "gru08", "gru16"):
        for sub in ("small_gru", "large_gru"):
            for c in ("convz", "convr", "convq"):
                b.conv(f"{ub}/{g}/{sub}/{c}", f"update_block.{g}.{sub}.{c}",
                       bias=True)
    # SelectiveRAFT's motion encoder names its disparity convs convf*
    # (SelectiveRAFT/update.py:80-85), unlike SelectiveIGEV's convd*
    for i, t in enumerate(("convc1", "convc2", "convf1", "convf2", "conv")):
        b.conv(f"{ub}/encoder/Conv_{i}", f"update_block.encoder.{t}",
               bias=True)
    b.conv(f"{ub}/disp_head_1", "update_block.disp_head.conv1", bias=True)
    b.conv(f"{ub}/disp_head_2", "update_block.disp_head.conv2", bias=True)
    b.conv(f"{ub}/mask_1", "update_block.mask.0", bias=True)
    b.conv(f"{ub}/mask_2", "update_block.mask.2", bias=True)
    return b.finish(expect_unused=("num_batches_tracked", ".norm3."))


def convert_selective_igev(sd: dict) -> tuple[dict, list]:
    """Reference SelectiveIGEV (models/SelectiveStereo/SelectiveIGEV/
    igev_stereo.py:92-166) → our SelectiveIGEV variables. Differs from IGEV
    by CAM/SAM context attention instead of zqr gate convs and
    dual-kernel SelectiveConvGRUs (update.py:139-259)."""
    b = _Builder(sd)
    _convert_igev_common(b)
    b.conv("cam/fc1", "cam.fc.0")
    b.conv("cam/fc2", "cam.fc.2")
    b.conv("sam/Conv_0", "sam.samconv")
    ub = "step/update_block"
    for g in ("gru04", "gru08", "gru16"):
        for sub in ("small_gru", "large_gru"):
            for c in ("convz", "convr", "convq"):
                b.conv(f"{ub}/{g}/{sub}/{c}", f"update_block.{g}.{sub}.{c}",
                       bias=True)
    # SelectiveIGEV's BasicConv registers self.bn even with bn=False
    # (submodule.py:13-19), so conv1_up carries dead BN keys
    return b.finish(expect_unused=("num_batches_tracked", ".norm3.",
                                   "cost_agg.conv1_up.bn"))


_DAV2_HEADS = {"vits": 6, "vitb": 12, "vitl": 16}
_DAV2_DEPTH = {"vits": 12, "vitb": 12, "vitl": 24}
_DAV2_TAPS = {"vits": (2, 5, 8, 11), "vitb": (2, 5, 8, 11),
              "vitl": (4, 11, 17, 23)}


def convert_depth_anything_v2(sd: dict, encoder: str = None) -> tuple:
    """Reference DepthAnythingV2 (models/depth_anything_v2/dpt.py:309,
    dinov2.py:44-330) → our DepthAnythingV2 variables. This is the key that
    unlocks the 5 foundation-tier zoo entries (MonSter, DEFOM,
    FoundationStereo, StereoAnywhere consume this trunk).

    `encoder` is inferred from the embed dim when omitted."""
    b = _Builder(sd)
    if encoder is None:
        d = sd["pretrained.cls_token"].shape[-1]
        encoder = {384: "vits", 768: "vitb", 1024: "vitl"}[d]
    heads, depth = _DAV2_HEADS[encoder], _DAV2_DEPTH[encoder]

    # --- DINOv2 trunk ----------------------------------------------------
    p = "pretrained"
    b.conv(f"{p}/patch_embed", f"{p}.patch_embed.proj", bias=True)
    b.raw(f"{p}/cls_token", f"{p}.cls_token")
    b.raw(f"{p}/pos_embed", f"{p}.pos_embed")
    for i in range(depth):
        t = f"{p}.blocks.{i}"
        f = f"{p}/block{i}"
        b.layernorm(f"{f}/LayerNorm_0", f"{t}.norm1")
        b.attention(f"{f}/MultiHeadDotProductAttention_0", f"{t}.attn",
                    heads)
        b.raw(f"{f}/ls1", f"{t}.ls1.gamma")
        b.layernorm(f"{f}/LayerNorm_1", f"{t}.norm2")
        b.dense(f"{f}/Dense_0", f"{t}.mlp.fc1")
        b.dense(f"{f}/Dense_1", f"{t}.mlp.fc2")
        b.raw(f"{f}/ls2", f"{t}.ls2.gamma")
    # get_intermediate_layers applies the single final norm to every tap
    # (dinov2.py get_intermediate_layers norm=True); our per-tap norms all
    # receive the same weights.
    for i in _DAV2_TAPS[encoder]:
        _set(b.params, f"{p}/tapnorm{i}/scale", b._take(f"{p}.norm.weight"))
        _set(b.params, f"{p}/tapnorm{i}/bias", b._take(f"{p}.norm.bias"))

    # --- DPT head (dpt.py:38-163) ---------------------------------------
    h = "depth_head"
    for i in range(4):
        b.conv(f"{h}/project{i}", f"{h}.projects.{i}", bias=True)
        if i in (0, 1):
            b.conv_transpose(f"{h}/resize{i}", f"{h}.resize_layers.{i}",
                             bias=True)
        elif i == 3:
            b.conv(f"{h}/resize{i}", f"{h}.resize_layers.{i}", bias=True)
        b.conv(f"{h}/layer{i + 1}_rn", f"{h}.scratch.layer{i + 1}_rn")
    for i in (1, 2, 3, 4):
        t = f"{h}.scratch.refinenet{i}"
        f = f"{h}/refine{i}"
        units = (("resConfUnit2", "ResidualConvUnit_0"),) if i == 4 else \
            (("resConfUnit1", "ResidualConvUnit_0"),
             ("resConfUnit2", "ResidualConvUnit_1"))
        for tu, fu in units:
            b.conv(f"{f}/{fu}/Conv_0", f"{t}.{tu}.conv1", bias=True)
            b.conv(f"{f}/{fu}/Conv_1", f"{t}.{tu}.conv2", bias=True)
        b.conv(f"{f}/Conv_0", f"{t}.out_conv", bias=True)
    b.conv(f"{h}/output_conv1", f"{h}.scratch.output_conv1", bias=True)
    b.conv(f"{h}/output_conv2a", f"{h}.scratch.output_conv2.0", bias=True)
    b.conv(f"{h}/output_conv2b", f"{h}.scratch.output_conv2.2", bias=True)

    # refinenet4.resConfUnit1 is constructed but never used by the forward
    # (util/blocks.py forward only applies it when a skip input exists);
    # mask_token is a training-time masking artifact, unused at inference.
    return b.finish(expect_unused=("num_batches_tracked",
                                   "refinenet4.resConfUnit1",
                                   "pretrained.mask_token"))


def _gev_hourglass(b: _Builder, hg: str = "cost_agg") -> None:
    """IGEV-style 3-scale GEV hourglass with per-scale FeatureAtt
    (IGEVStereo/igev_stereo.py:23-90 ≡ MonSter/monster.py:69-131)."""
    seq = [("conv1.0", 0), ("conv1.1", 1), ("conv2.0", 2), ("conv2.1", 3),
           ("conv3.0", 4), ("conv3.1", 5), ("agg_0.0", 7), ("agg_0.1", 8),
           ("agg_0.2", 9), ("agg_1.0", 11), ("agg_1.1", 12), ("agg_1.2", 13)]
    for tname, i in seq:
        b.conv(f"{hg}/BasicConvBN_{i}/Conv_0", f"{hg}.{tname}.conv")
        b.bn(f"{hg}/BasicConvBN_{i}/BatchNorm_0", f"{hg}.{tname}.bn")
    for tname, i in (("conv3_up", 6), ("conv2_up", 10)):
        b.conv_transpose(f"{hg}/BasicConvBN_{i}/ConvTranspose_0",
                         f"{hg}.{tname}.conv")
        b.bn(f"{hg}/BasicConvBN_{i}/BatchNorm_0", f"{hg}.{tname}.bn")
    b.conv_transpose(f"{hg}/BasicConvBN_14/ConvTranspose_0",
                     f"{hg}.conv1_up.conv")
    for i, att in enumerate(("feature_att_8", "feature_att_16",
                             "feature_att_32", "feature_att_up_16",
                             "feature_att_up_8")):
        b.convbn(f"{hg}/FeatureAtt_{i}/ConvBNAct_0",
                 f"{hg}.{att}.feat_att.0.conv", f"{hg}.{att}.feat_att.0.bn")
        b.conv(f"{hg}/FeatureAtt_{i}/Conv_0", f"{hg}.{att}.feat_att.1",
               bias=True)


def _remp(b: _Builder, f: str = "remp", t: str = "REMP") -> None:
    """MonSter REMP refinement (refinement.py:363-433)."""
    for name in ("conv1_mono", "conv1_stereo", "conv2_mono", "conv2_stereo"):
        b.conv(f"{f}/{name}/conv", f"{t}.{name}.0")
        b.bn(f"{f}/{name}/bn", f"{t}.{name}.1")
    b.conv(f"{f}/conv_start/conv", f"{t}.conv_start.conv")
    b.bn(f"{f}/conv_start/bn", f"{t}.conv_start.bn")
    u = f"{t}.RefinementBlock"
    for name in ("conv1a", "conv2a", "conv3a", "conv4a"):
        b.conv(f"{f}/unet/{name}/conv", f"{u}.{name}.conv")
        b.bn(f"{f}/unet/{name}/bn", f"{u}.{name}.bn")
    for name in ("deconv4a", "deconv3a", "deconv2a", "deconv1a",
                 "deconv4b", "deconv3b", "deconv2b", "deconv1b"):
        b.conv_transpose(f"{f}/unet/{name}/conv1/conv", f"{u}.{name}.conv1.conv")
        b.bn(f"{f}/unet/{name}/conv1/bn", f"{u}.{name}.conv1.bn")
        b.conv(f"{f}/unet/{name}/conv2/conv", f"{u}.{name}.conv2.conv")
        b.bn(f"{f}/unet/{name}/conv2/bn", f"{u}.{name}.conv2.bn")
    for name in ("conv1b", "conv2b", "conv3b", "conv4b"):
        b.conv(f"{f}/unet/{name}/conv1/conv", f"{u}.{name}.conv1.conv")
        b.bn(f"{f}/unet/{name}/conv1/bn", f"{u}.{name}.conv1.bn")
        b.conv(f"{f}/unet/{name}/conv2/conv", f"{u}.{name}.conv2.conv")
        b.bn(f"{f}/unet/{name}/conv2/bn", f"{u}.{name}.conv2.bn")
    b.conv(f"{f}/lfe_1", f"{t}.LFE.0", bias=True)
    b.conv(f"{f}/lfe_2", f"{t}.LFE.2", bias=True)
    b.conv(f"{f}/lmc_1", f"{t}.LMC.0", bias=True)
    b.conv(f"{f}/lmc_2", f"{t}.LMC.1", bias=True)
    b.conv(f"{f}/lmc_3", f"{t}.LMC.3", bias=True)
    b.conv(f"{f}/final_conv", f"{t}.final_conv", bias=True)


def convert_monster(sd: dict, encoder: str = None) -> tuple[dict, list]:
    """Reference MonSter (models/MonSter/monster.py:225-520) → our Monster
    variables: frozen DAv2 mono branch (encoder+decoder re-used for both the
    depth and feature heads — the reference loads `mono_decoder` and
    `feat_decoder` from the same checkpoint), Feat_transfer pyramid, IGEV
    stereo branch, two coupled mix update blocks, and REMP."""
    b = _Builder(sd)

    # --- frozen DAv2 mono branch ------------------------------------------
    # Reference scopes: mono_encoder (= DAv2.pretrained), mono_decoder
    # (= DAv2.depth_head), feat_decoder (same weights, loaded strict=False
    # from the same file, monster.py:317-327). Our single `mono` DAv2
    # computes both depth and paths, so feat_decoder keys are redundant.
    sub = {}
    for k, v in b.sd.items():
        if k.startswith("mono_encoder."):
            sub["pretrained." + k[len("mono_encoder."):]] = v
            b.used.add(k)
        elif k.startswith("mono_decoder."):
            sub["depth_head." + k[len("mono_decoder."):]] = v
            b.used.add(k)
    dav2, _ = convert_depth_anything_v2(sub, encoder)
    b.params["mono"] = dav2["params"]
    if dav2.get("batch_stats"):
        b.stats["mono"] = dav2["batch_stats"]

    # --- Feat_transfer (monster.py:160-219) -------------------------------
    ft, t = "feat_transfer", "feat_transfer"
    for name in ("conv4x", "conv8x", "conv16x", "conv32x"):
        b.conv(f"{ft}/{name}", f"{t}.{name}.0", bias=True)
    for fname, tname in (("up32", "conv_up_32x"), ("up16", "conv_up_16x"),
                         ("up8", "conv_up_8x")):
        b.conv_transpose(f"{ft}/{fname}", f"{t}.{tname}")
    for s in ("16", "8", "4"):
        b.conv(f"{ft}/res{s}", f"{t}.res_{s}x", bias=True)

    # --- stems (monster.py:275-295) ---------------------------------------
    for s in ("2", "4", "8", "16"):
        b.conv(f"stem_{s}a/Conv_0", f"stem_{s}.0.conv")
        b.conv(f"stem_{s}b", f"stem_{s}.1")

    # --- matching + volume + GEV ------------------------------------------
    b.conv("conv/Conv_0", "conv.conv")
    b.conv("desc", "desc", bias=True)
    b.conv("corr_stem/Conv_0", "corr_stem.conv")
    b.bn("corr_stem/BatchNorm_0", "corr_stem.bn")
    b.convbn("corr_feature_att/ConvBNAct_0",
             "corr_feature_att.feat_att.0.conv",
             "corr_feature_att.feat_att.0.bn")
    b.conv("corr_feature_att/Conv_0", "corr_feature_att.feat_att.1",
           bias=True)
    _gev_hourglass(b)
    b.conv("classifier", "classifier")

    # --- context from mono features (Feat_transfer_cnet) ------------------
    for s in ("4", "8", "16"):
        b.conv(f"cnet_{s}", f"feat_transfer_cnet.res_{s}x", bias=True)
    for i in range(3):
        b.conv(f"context_zqr_{i}", f"context_zqr_convs.{i}", bias=True)

    # --- train-path superpixel upsampler ----------------------------------
    b.conv("spx_4/Conv_0", "spx_4.0.conv")
    b.conv("spx_4b", "spx_4.1")
    _conv2x(b, "spx_2", "spx_2", instance_norm=True)
    b.conv_transpose("spx", "spx.0", bias=True)

    # --- shared in-loop upsampler → both phase scopes ---------------------
    for phase in ("phase1", "phase2"):
        _conv2x(b, f"{phase}/spx_2_gru", "spx_2_gru", instance_norm=False)
        b.conv_transpose(f"{phase}/spx_gru", "spx_gru.0", bias=True)

    # --- phase-1 plain update block (MonSter/update.py BasicMultiUpdate) --
    ub = "phase1/update_block"
    for g in ("gru04", "gru08", "gru16"):
        for c in ("convz", "convr", "convq"):
            b.conv(f"{ub}/{g}/{c}", f"update_block.{g}.{c}", bias=True)
    for i, t2 in enumerate(("convc1", "convc2", "convd1", "convd2", "conv")):
        b.conv(f"{ub}/encoder/Conv_{i}", f"update_block.encoder.{t2}",
               bias=True)
    b.conv(f"{ub}/disp_head_1", "update_block.disp_head.conv1", bias=True)
    b.conv(f"{ub}/disp_head_2", "update_block.disp_head.conv2", bias=True)
    b.conv(f"{ub}/mask_feat_4", "update_block.mask_feat_4.0", bias=True)

    # --- phase-2 coupled mix blocks (update.py:485-563) -------------------
    enc_map = (("c1", "convc1"), ("c2", "convc2"),
               ("c1_mono", "convc1_mono"), ("c2_mono", "convc2_mono"),
               ("d1", "convd1"), ("d2", "convd2"),
               ("d1_mono", "convd1_mono"), ("d2_mono", "convd2_mono"),
               ("o", "conv"), ("o_mono", "conv_mono"))
    for blk in ("update_block_mix_stereo", "update_block_mix_mono"):
        ub = f"phase2/{blk}"
        for g in ("gru04", "gru08", "gru16"):
            for c in ("convz", "convr", "convq"):
                b.conv(f"{ub}/{g}/{c}", f"{blk}.{g}.{c}", bias=True)
        for fname, tname in enc_map:
            b.conv(f"{ub}/encoder/{fname}", f"{blk}.encoder.{tname}",
                   bias=True)
        b.conv(f"{ub}/disp_head_1", f"{blk}.disp_head.conv1", bias=True)
        b.conv(f"{ub}/disp_head_2", f"{blk}.disp_head.conv2", bias=True)
        b.conv(f"{ub}/mask_feat_4", f"{blk}.mask_feat_4.0", bias=True)

    _remp(b)

    # feat_decoder duplicates mono_decoder; mask_token/norm artifacts as in
    # convert_depth_anything_v2; MonSter's BasicConv registers a dead BN on
    # the bn=False conv1_up (submodule.py:13-19, like SelectiveIGEV)
    return b.finish(expect_unused=("num_batches_tracked", "feat_decoder.",
                                   "refinenet4.resConfUnit1", "mask_token",
                                   "cost_agg.conv1_up.bn"))


def _defom_head(b: _Builder, f: str, t: str, with_output: bool) -> None:
    """DEFOM's vendored DPTHead / DPTFeat (DEFOMStereo
    depth_anything_v2/dpt.py:38-259) → our DEFOMHead scope."""
    for i in range(4):
        b.conv(f"{f}/project{i}", f"{t}.projects.{i}", bias=True)
        if i in (0, 1):
            b.conv_transpose(f"{f}/resize{i}", f"{t}.resize_layers.{i}",
                             bias=True)
        elif i == 3:
            b.conv(f"{f}/resize{i}", f"{t}.resize_layers.{i}", bias=True)
        b.conv(f"{f}/layer{i + 1}_rn", f"{t}.scratch.layer{i + 1}_rn")
    for i in (1, 2, 3, 4):
        tt = f"{t}.scratch.refinenet{i}"
        ff = f"{f}/refine{i}"
        units = (("resConfUnit2", "ResidualConvUnit_0"),) if i == 4 else \
            (("resConfUnit1", "ResidualConvUnit_0"),
             ("resConfUnit2", "ResidualConvUnit_1"))
        for tu, fu in units:
            b.conv(f"{ff}/{fu}/Conv_0", f"{tt}.{tu}.conv1", bias=True)
            b.conv(f"{ff}/{fu}/Conv_1", f"{tt}.{tu}.conv2", bias=True)
        b.conv(f"{ff}/Conv_0", f"{tt}.out_conv", bias=True)
    if with_output:
        b.conv(f"{f}/output_conv1", f"{t}.scratch.output_conv1", bias=True)
        b.conv(f"{f}/output_conv2a", f"{t}.scratch.output_conv2.0",
               bias=True)
        b.conv(f"{f}/output_conv2b", f"{t}.scratch.output_conv2.2",
               bias=True)


def _raft_update_block(b: _Builder, flax_ub: str, torch_ub: str,
                       flow_convs=("convd1", "convd2")) -> None:
    """RAFT-style BasicMultiUpdateBlock (DEFOMStereo/update.py:105-149)."""
    for g in ("gru08", "gru16", "gru32"):
        for c in ("convz", "convr", "convq"):
            b.conv(f"{flax_ub}/{g}/{c}", f"{torch_ub}.{g}.{c}", bias=True)
    names = ("convc1", "convc2") + tuple(flow_convs) + ("conv",)
    for i, t in enumerate(names):
        b.conv(f"{flax_ub}/encoder/Conv_{i}", f"{torch_ub}.encoder.{t}",
               bias=True)
    b.conv(f"{flax_ub}/flow_head_1", f"{torch_ub}.disp_head.conv1",
           bias=True)
    b.conv(f"{flax_ub}/flow_head_2", f"{torch_ub}.disp_head.conv2",
           bias=True)
    b.conv(f"{flax_ub}/mask_1", f"{torch_ub}.mask.0", bias=True)
    b.conv(f"{flax_ub}/mask_2", f"{torch_ub}.mask.2", bias=True)


def convert_defom(sd: dict, encoder: str = None) -> tuple[dict, list]:
    """Reference DEFOMStereo (models/DEFOMStereo/defom_stereo.py:25-182) →
    our DEFOMStereo variables: DAv2 trunk + frozen depth head + trainable
    DPTFeat head, additive-fusion fnet/cnet, and the scale/refine update
    blocks."""
    sd = {k: v for k, v in sd.items() if k not in ("mean", "std")}
    b = _Builder(sd)

    # --- DefomEncoder: ViT trunk (reuse the shared DAv2 mapping) ----------
    da = "defomencoder.depth_anything"
    sub = {}
    for k, v in b.sd.items():
        if k.startswith(f"{da}.pretrained."):
            sub["pretrained." + k[len(f"{da}.pretrained."):]] = v
            b.used.add(k)
    if encoder is None:
        d = sub["pretrained.cls_token"].shape[-1]
        encoder = {384: "vits", 768: "vitb", 1024: "vitl"}[d]
    trunk_b = _Builder(sub)
    heads, depth = _DAV2_HEADS[encoder], _DAV2_DEPTH[encoder]
    p = "pretrained"
    trunk_b.conv(f"{p}/patch_embed", f"{p}.patch_embed.proj", bias=True)
    trunk_b.raw(f"{p}/cls_token", f"{p}.cls_token")
    trunk_b.raw(f"{p}/pos_embed", f"{p}.pos_embed")
    for i in range(depth):
        t = f"{p}.blocks.{i}"
        f = f"{p}/block{i}"
        trunk_b.layernorm(f"{f}/LayerNorm_0", f"{t}.norm1")
        trunk_b.attention(f"{f}/MultiHeadDotProductAttention_0", f"{t}.attn",
                          heads)
        trunk_b.raw(f"{f}/ls1", f"{t}.ls1.gamma")
        trunk_b.layernorm(f"{f}/LayerNorm_1", f"{t}.norm2")
        trunk_b.dense(f"{f}/Dense_0", f"{t}.mlp.fc1")
        trunk_b.dense(f"{f}/Dense_1", f"{t}.mlp.fc2")
        trunk_b.raw(f"{f}/ls2", f"{t}.ls2.gamma")
    for i in _DAV2_TAPS[encoder]:
        _set(trunk_b.params, f"{p}/tapnorm{i}/scale",
             trunk_b._take(f"{p}.norm.weight"))
        _set(trunk_b.params, f"{p}/tapnorm{i}/bias",
             trunk_b._take(f"{p}.norm.bias"))
    de = b.params.setdefault("defomencoder", {})
    de.update(trunk_b.params)

    # --- the two DPT heads ------------------------------------------------
    hb = _Builder({k[len(da) + 1:]: v for k, v in b.sd.items()
                   if k.startswith(f"{da}.depth_head.")
                   or k.startswith(f"{da}.depth_feat.")})
    for k in b.sd:
        if k.startswith(f"{da}.depth_head.") or \
                k.startswith(f"{da}.depth_feat."):
            b.used.add(k)
    _defom_head(hb, "depth_head", "depth_head", with_output=True)
    _defom_head(hb, "depth_feat", "depth_feat", with_output=False)
    de.update(hb.params)

    # --- fnet (instance norm — param-free) --------------------------------
    b.conv("fnet/conv1", "fnet.conv1", bias=True)
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"fnet/RAFTResBlock_{n}", f"fnet.{layer}.{blk}",
                      "instance", down and blk == 0)
            n += 1
    b.conv("fnet/convd/conv", "fnet.convd.conv", bias=True)
    b.conv("fnet/conv2", "fnet.conv2", bias=True)

    # --- cnet (batch norm, additive DAv2 fusion) --------------------------
    b.conv("cnet/conv1", "cnet.conv1", bias=True)
    b.bn("cnet/norm1", "cnet.norm1")
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"cnet/RAFTResBlock_{n}", f"cnet.{layer}.{blk}",
                      "batch", down and blk == 0)
            n += 1
    _raft_res(b, "cnet/RAFTResBlock_6", "cnet.layer4.0", "batch", True)
    _raft_res(b, "cnet/RAFTResBlock_7", "cnet.layer4.1", "batch", False)
    _raft_res(b, "cnet/RAFTResBlock_8", "cnet.layer5.0", "batch", True)
    _raft_res(b, "cnet/RAFTResBlock_9", "cnet.layer5.1", "batch", False)
    for s in ("08", "16", "32"):
        b.conv(f"cnet/conv{s}/conv", f"cnet.conv{s}.conv", bias=True)
        b.bn(f"cnet/conv{s}/norm1", f"cnet.conv{s}.norm1")
    for s in ("08", "16"):
        for j in range(2):
            _raft_res(b, f"cnet/res{s}_{j}", f"cnet.outputs{s}.{j}.0",
                      "batch", False)
            b.conv(f"cnet/out{s}_{j}", f"cnet.outputs{s}.{j}.1", bias=True)
    for j in range(2):
        b.conv(f"cnet/out32_{j}", f"cnet.outputs32.{j}", bias=True)

    for i in range(3):
        b.conv(f"context_zqr_{i}", f"context_zqr_convs.{i}", bias=True)

    _raft_update_block(b, "refine_phase/update_block", "update_block")
    _raft_update_block(b, "scale_phase/scale_update_block",
                       "scale_update_block")

    # Dead params: ResidualBlock double-registered norm3 (.norm3.),
    # ConvBlock's unused norm2/norm3 (extractor.py:11-46), DAv2 artifacts.
    return b.finish(expect_unused=(
        "num_batches_tracked", ".norm3.", "convd.norm2", "conv08.norm2",
        "conv16.norm2", "conv32.norm2", "refinenet4.resConfUnit1",
        "mask_token"))


# Scope under which each foundation-tier model embeds its DAv2 trunk
DAV2_SCOPES = {
    "MonSter": "mono",
    "DEFOMStereo_S": "defomencoder",
    "DEFOMStereo_L": "defomencoder",
    "FoundationStereo_S": "feature/dino",
    "FoundationStereo_L": "feature/dino",
    "StereoAnywhere": "mono_model",
}


def graft_dav2_trunk(model_name: str, variables: dict, sd_or_path,
                     encoder: str = None) -> tuple[dict, list]:
    """Inject a converted DepthAnythingV2 torch checkpoint into the DAv2
    submodule of a foundation-tier model's variables.

    The reference loads the frozen DAv2 trunk separately from the stereo
    weights (e.g. MonSter/monster.py:317-356); this is the equivalent for
    our flax trees. Returns ``(new_variables, skipped_keys)`` where
    skipped_keys lists converted leaves the model's tree does not use (some
    models consume only a subset of the DPT head).
    """
    import numpy as _np

    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else sd_or_path)
    dav2, _ = convert_depth_anything_v2(sd, encoder)
    if model_name not in DAV2_SCOPES:
        raise KeyError(f"{model_name!r} has no DAv2 trunk; one of "
                       f"{sorted(DAV2_SCOPES)}")
    scope = DAV2_SCOPES[model_name]
    node = variables.get("params", {})
    for part in scope.split("/"):
        if part not in node:
            raise KeyError(f"model variables have no {scope!r} scope — "
                           f"init the model first")
        node = node[part]

    skipped: list = []

    def merge(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            p = f"{path}/{k}"
            if k not in dst:
                skipped.append(p)
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, p)
            else:
                v = _np.asarray(v)
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"{p}: model has {tuple(dst[k].shape)}, checkpoint "
                        f"has {tuple(v.shape)} — encoder size mismatch?")
                out[k] = v.astype(_np.asarray(dst[k]).dtype)
        return out

    params = dict(variables["params"])
    parts = scope.split("/")
    if len(parts) == 1:
        params[scope] = merge(params[scope], dav2["params"], scope)
    else:
        outer, inner = parts
        sub = dict(params[outer])
        sub[inner] = merge(sub[inner], dav2["params"], scope)
        params[outer] = sub
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars, skipped


def _edgenext_trunk(b: _Builder, f: str, t: str) -> None:
    """timm edgenext_small stem+stages (tests/_reference_shim.py
    `_make_timm_edgenext`; reference FoundationStereo/extractor.py:326-328)
    → our EdgeNeXtTrunk."""
    b.conv(f"{f}/stem0", f"{t}.stem.0", bias=True)
    b.layernorm(f"{f}/stem1", f"{t}.stem.1")
    depths = (3, 3, 9, 3)
    globals_ = (0, 1, 1, 1)
    scales = (2, 2, 3, 4)
    pos = (False, True, False, False)
    for s in range(4):
        if s > 0:
            b.layernorm(f"{f}/stage{s}_dsnorm", f"{t}.stages.{s}.downsample.0")
            b.conv(f"{f}/stage{s}_dsconv", f"{t}.stages.{s}.downsample.1",
                   bias=True)
        for i in range(depths[s]):
            tb = f"{t}.stages.{s}.blocks.{i}"
            fb = f"{f}/stage{s}_block{i}"
            if i < depths[s] - globals_[s]:
                b.conv(f"{fb}/conv_dw", f"{tb}.conv_dw", bias=True)
                b.layernorm(f"{fb}/norm", f"{tb}.norm")
                b.dense(f"{fb}/fc1", f"{tb}.mlp.fc1")
                b.dense(f"{fb}/fc2", f"{tb}.mlp.fc2")
                b.raw(f"{fb}/gamma", f"{tb}.gamma")
            else:
                for j in range(max(1, scales[s] - 1)):
                    b.conv(f"{fb}/convs{j}", f"{tb}.convs.{j}", bias=True)
                if pos[s]:
                    b.conv(f"{fb}/pos_embd/token_projection",
                           f"{tb}.pos_embd.token_projection", bias=True)
                b.layernorm(f"{fb}/norm_xca", f"{tb}.norm_xca")
                b.raw(f"{fb}/gamma_xca", f"{tb}.gamma_xca")
                b.dense(f"{fb}/xca/qkv", f"{tb}.xca.qkv")
                b.dense(f"{fb}/xca/proj", f"{tb}.xca.proj")
                b.raw(f"{fb}/xca/temperature", f"{tb}.xca.temperature")
                b.layernorm(f"{fb}/norm", f"{tb}.norm")
                b.dense(f"{fb}/fc1", f"{tb}.mlp.fc1")
                b.dense(f"{fb}/fc2", f"{tb}.mlp.fc2")
                b.raw(f"{fb}/gamma", f"{tb}.gamma")


def _resnet_block3d(b: _Builder, f: str, t: str) -> None:
    """submodule ResnetBasicBlock(3D) → our ResnetBlock (BN variant)."""
    b.conv(f"{f}/conv1", f"{t}.conv1")
    b.bn(f"{f}/bn1", f"{t}.bn1")
    b.conv(f"{f}/conv2", f"{t}.conv2")
    b.bn(f"{f}/bn2", f"{t}.bn2")


def _residual_ext(b: _Builder, f: str, t: str, norm: str = "batch",
                  downsample: bool = False) -> None:
    """extractor ResidualBlock → ResidualBlockExt (instance norm has no
    params; batch norm maps)."""
    b.conv(f"{f}/conv1", f"{t}.conv1", bias=True)
    b.conv(f"{f}/conv2", f"{t}.conv2", bias=True)
    if norm == "batch":
        b.bn(f"{f}/norm1", f"{t}.norm1")
        b.bn(f"{f}/norm2", f"{t}.norm2")
    if downsample:
        b.conv(f"{f}/downsample", f"{t}.downsample.0", bias=True)
        if norm == "batch":
            b.bn(f"{f}/norm3", f"{t}.norm3")
            # the same BN module is registered twice (norm3 AND
            # downsample.1, extractor.py:60-62) — consume the aliases
            for suf in ("weight", "bias", "running_mean", "running_var"):
                if f"{t}.downsample.1.{suf}" in b.sd:
                    b._take(f"{t}.downsample.1.{suf}")


def _conv3d_reduced(b: _Builder, f: str, t: str) -> None:
    """Conv3dNormActReduced (submodule.py:89-114)."""
    b.conv(f"{f}/conv1", f"{t}.conv1.0", bias=True)
    b.bn(f"{f}/bn1", f"{t}.conv1.1")
    b.conv(f"{f}/conv2", f"{t}.conv2.0", bias=True)
    b.bn(f"{f}/bn2", f"{t}.conv2.1")


def _feature_att(b: _Builder, f: str, t: str) -> None:
    b.convbn(f"{f}/ConvBNAct_0", f"{t}.feat_att.0.conv",
             f"{t}.feat_att.0.bn")
    b.conv(f"{f}/Conv_0", f"{t}.feat_att.1", bias=True)


def convert_foundation(sd: dict, vit_size: str = None) -> tuple[dict, list]:
    """Reference FoundationStereo (models/FoundationStereo/
    foundation_stereo.py:128-292) → our FoundationStereo variables."""
    b = _Builder(sd)

    # --- Feature: EdgeNeXt trunk + DAv2 side network + deconv fusion ----
    _edgenext_trunk(b, "feature/edgenext", "feature")
    dino_sd = {k[len("feature.dino.depth_anything."):]: v
               for k, v in sd.items()
               if k.startswith("feature.dino.depth_anything.")}
    dv, dleft = convert_depth_anything_v2(dino_sd, vit_size)
    if dleft:
        raise ValueError(f"unconsumed dino keys: {dleft[:5]}")
    for path, tree in (("params", dv["params"]),
                       ("batch_stats", dv["batch_stats"])):
        dst = b.params if path == "params" else b.stats
        node = dst.setdefault("feature", {}).setdefault("dino", {})
        node.update(tree)
    b.used.update("feature.dino.depth_anything." + k for k in dino_sd
                  if "feature.dino.depth_anything." + k in sd)
    for name in ("deconv32_16", "deconv16_8", "deconv8_4"):
        t, f = f"feature.{name}", f"feature/{name}"
        b.conv_transpose(f"{f}/conv1/ConvTranspose_0", f"{t}.conv1.conv")
        b.conv(f"{f}/conv2/conv1", f"{t}.conv2.conv1")
        b.conv(f"{f}/conv2/conv2", f"{t}.conv2.conv2")
    b.conv("feature/conv4_0/Conv_0", "feature.conv4.0.conv")
    _residual_ext(b, "feature/conv4_1", "feature.conv4.1", "instance")
    _residual_ext(b, "feature/conv4_2", "feature.conv4.2", "instance")

    # --- ContextNetDino --------------------------------------------------
    b.conv("cnet/conv1", "cnet.conv1", bias=True)
    b.bn("cnet/norm1", "cnet.norm1")
    chans = {"layer1": 64, "layer2": 96, "layer3": 128, "layer4": 128,
             "layer5": 128}
    prev = 64
    for layer in ("layer1", "layer2", "layer3", "layer4", "layer5"):
        stride = 1 if layer == "layer1" else 2
        ds0 = stride != 1 or prev != chans[layer]
        _residual_ext(b, f"cnet/{layer}_0", f"cnet.{layer}.0",
                      downsample=ds0)
        _residual_ext(b, f"cnet/{layer}_1", f"cnet.{layer}.1")
        prev = chans[layer]
    b.convbn("cnet/conv2", "cnet.conv2.conv", "cnet.conv2.bn")
    for scale in ("outputs04", "outputs08", "outputs16"):
        for j in range(2):
            if scale != "outputs16":
                _residual_ext(b, f"cnet/{scale}_{j}_res",
                              f"cnet.{scale}.{j}.0")
                b.conv(f"cnet/{scale}_{j}_out", f"cnet.{scale}.{j}.1",
                       bias=True)
            else:
                b.conv(f"cnet/{scale}_{j}_out", f"cnet.{scale}.{j}",
                       bias=True)

    # --- stems / volume --------------------------------------------------
    b.conv("stem_2_0/Conv_0", "stem_2.0.conv")
    b.conv("stem_2_1", "stem_2.1")
    b.conv("proj_cmb", "proj_cmb", bias=True)
    b.conv("corr_stem_0", "corr_stem.0", bias=True)
    b.convbn("corr_stem_1", "corr_stem.1.conv", "corr_stem.1.bn")
    _resnet_block3d(b, "corr_stem_2", "corr_stem.2")
    _resnet_block3d(b, "corr_stem_3", "corr_stem.3")
    _feature_att(b, "corr_feature_att", "corr_feature_att")

    # --- hourglass -------------------------------------------------------
    hg = "cost_agg"
    for name in ("conv1", "conv2", "conv3"):
        b.convbn(f"{hg}/{name}_0", f"{hg}.{name}.0.conv",
                 f"{hg}.{name}.0.bn")
        _conv3d_reduced(b, f"{hg}/{name}_1", f"{hg}.{name}.1")
    for name in ("conv3_up", "conv2_up", "conv1_up"):
        b.conv_transpose(f"{hg}/{name}/ConvTranspose_0", f"{hg}.{name}.conv")
        b.bn(f"{hg}/{name}/BatchNorm_0", f"{hg}.{name}.bn")
    for agg in ("agg_0", "agg_1"):
        b.convbn(f"{hg}/{agg}_0", f"{hg}.{agg}.0.conv", f"{hg}.{agg}.0.bn")
        _conv3d_reduced(b, f"{hg}/{agg}_1", f"{hg}.{agg}.1")
        _conv3d_reduced(b, f"{hg}/{agg}_2", f"{hg}.{agg}.2")
    _conv3d_reduced(b, f"{hg}/conv_out_0", f"{hg}.conv_out.0")
    _conv3d_reduced(b, f"{hg}/conv_out_1", f"{hg}.conv_out.1")
    for att in ("feature_att_8", "feature_att_16", "feature_att_32",
                "feature_att_up_16", "feature_att_up_8"):
        _feature_att(b, f"{hg}/{att}", f"{hg}.{att}")
    b.conv(f"{hg}/conv_patch_0", f"{hg}.conv_patch.0", bias=True)
    b.bn(f"{hg}/conv_patch_1", f"{hg}.conv_patch.1")
    for i in range(4):
        t = f"{hg}.atts.4.sa.{i}"
        f = f"{hg}/att4"
        for proj, suffix in (("q_proj", "q"), ("k_proj", "k"),
                             ("v_proj", "v"), ("out_proj", "out")):
            b.dense(f"{f}/sa{i}_{suffix}", f"{t}.self_attn.{proj}")
        b.dense(f"{f}/sa{i}_lin1", f"{t}.linear1")
        b.dense(f"{f}/sa{i}_lin2", f"{t}.linear2")
        b.layernorm(f"{f}/sa{i}_norm1", f"{t}.norm1")
        b.layernorm(f"{f}/sa{i}_norm2", f"{t}.norm2")

    # --- classifier ------------------------------------------------------
    b.convbn("classifier_0", "classifier.0.conv", "classifier.0.bn")
    _resnet_block3d(b, "classifier_1", "classifier.1")
    b.conv("classifier_2", "classifier.2", bias=True)

    # --- CAM/SAM + update block + upsample -------------------------------
    b.conv("cam/fc1", "cam.fc.0")
    b.conv("cam/fc2", "cam.fc.2")
    b.conv("sam/Conv_0", "sam.samconv")
    ub, fu = "update_block", "step/update_block"
    for name in ("convc1", "convc2", "convd1", "convd2", "conv"):
        b.conv(f"{fu}/encoder/{name}", f"{ub}.encoder.{name}", bias=True)
    for gru in ("gru16", "gru08", "gru04"):
        b.conv(f"{fu}/{gru}/conv0", f"{ub}.{gru}.conv0.0", bias=True)
        b.conv(f"{fu}/{gru}/conv1", f"{ub}.{gru}.conv1.0", bias=True)
        for sz in ("small_gru", "large_gru"):
            for g in ("convz", "convr", "convq"):
                b.conv(f"{fu}/{gru}/{sz}/{g}", f"{ub}.{gru}.{sz}.{g}",
                       bias=True)
    b.conv(f"{fu}/disp_head_0", f"{ub}.disp_head.conv.0", bias=True)
    for i in (2, 3):
        t = f"{ub}.disp_head.conv.{i}"
        f = f"{fu}/disp_head_{i}"
        b.conv(f"{f}/dwconv", f"{t}.dwconv", bias=True)
        b.dense(f"{f}/pwconv1", f"{t}.pwconv1")
        b.dense(f"{f}/pwconv2", f"{t}.pwconv2")
        b.raw(f"{f}/gamma", f"{t}.gamma")
    b.conv(f"{fu}/disp_head_4", f"{ub}.disp_head.conv.4", bias=True)
    b.conv(f"{fu}/mask_0", f"{ub}.mask.0", bias=True)
    b.conv(f"{fu}/mask_2", f"{ub}.mask.2", bias=True)
    b.conv_transpose("step/spx_2_gru_conv1/ConvTranspose_0",
                     "spx_2_gru.conv1.conv")
    b.conv("step/spx_2_gru_conv2/Conv_0", "spx_2_gru.conv2.conv")
    b.conv_transpose("step/spx_gru", "spx_gru.0", bias=True)

    # dead reference modules (never touched by forward):
    # context_zqr_convs (SelectiveConvGRU takes inp directly), stem_4,
    # cnet.down / cnet.norm (ContextNetDino defines but does not call)
    return b.finish(expect_unused=(
        "num_batches_tracked", "context_zqr_convs", "stem_4.", "cnet.down.",
        "cnet.norm.", "refinenet4.resConfUnit1", "mask_token"))


def convert_stereoanywhere(sd: dict, encoder: str = None) -> tuple[dict,
                                                                   list]:
    """Reference StereoAnywhere (models/StereoAnywhere/stereoanywhere.py:
    20-331, default config) → our StereoAnywhere variables."""
    b = _Builder(sd)

    # fnet / cnet / zqr — the RAFT-style encoders (extractor.py)
    b.conv("fnet/Conv_0", "fnet.conv1", bias=True)
    n = 0
    for layer, down in (("layer1", False), ("layer2", True),
                        ("layer3", True)):
        for blk in range(2):
            _raft_res(b, f"fnet/RAFTResBlock_{n}", f"fnet.{layer}.{blk}",
                      "instance", down and blk == 0)
            n += 1
    b.conv("fnet/Conv_1", "fnet.conv2", bias=True)
    _convert_multi_basic_encoder(b, "cnet")
    for i in range(3):
        b.conv(f"context_zqr_{i}", f"context_zqr_convs.{i}", bias=True)

    # mono branch: hourglass_mono (instance-norm BasicConvs are param-free
    # except the conv kernels) + classifiers
    hg = "hourglass_mono"

    def datt(f, t):
        b.conv(f"{hg}/{f}/left_0/Conv_0", f"{hg}.{t}.feat_att_left.0.conv")
        b.conv(f"{hg}/{f}/left_1", f"{hg}.{t}.feat_att_left.1", bias=True)
        b.conv(f"{hg}/{f}/right_0/Conv_0",
               f"{hg}.{t}.feat_att_right.0.conv")
        b.conv(f"{hg}/{f}/right_1", f"{hg}.{t}.feat_att_right.1", bias=True)

    for i in range(3):
        b.conv(f"{hg}/down{i}_0/Conv_0", f"{hg}.down_layers.{i}.0.conv")
        b.conv(f"{hg}/down{i}_1/Conv_0", f"{hg}.down_layers.{i}.1.conv")
        datt(f"att{i}", f"feature_atts.{i}")
    for i in range(2):
        for j in range(3):
            b.conv(f"{hg}/agg{i}_{j}/Conv_0", f"{hg}.agg_layers.{i}.{j}.conv")
        datt(f"att_up{i}", f"feature_atts_up.{i}")
    for j in range(3):
        b.conv(f"{hg}/final_agg_{j}/Conv_0", f"{hg}.final_agg.{j}.conv")
    datt("final_att", "final_feature_atts_up")
    b.conv("classifier_mono", "classifier_mono")
    b.conv("classifier_monoconf", "classifier_monoconf")

    # update block (update.py:64-197; shared convc1/convc2)
    ub = "step"
    for g in ("gru08", "gru16", "gru32"):
        for c in ("convz", "convr", "convq"):
            b.conv(f"{ub}/{g}/{c}", f"update_block.{g}.{c}", bias=True)
    for t in ("convc1", "convc2", "convf1", "convf2"):
        b.conv(f"{ub}/encoder/{t}", f"update_block.encoder.{t}", bias=True)
    b.conv(f"{ub}/encoder/conv", "update_block.encoder._conv", bias=True)
    b.conv(f"{ub}/flow_head_1", "update_block.flow_head.conv1", bias=True)
    b.conv(f"{ub}/flow_head_2", "update_block.flow_head.conv2", bias=True)
    b.conv(f"{ub}/mask_1", "update_block.mask.0", bias=True)
    b.conv(f"{ub}/mask_2", "update_block.mask.2", bias=True)

    # frozen DAv2 mono model
    dino_sd = {k[len("mono_model."):]: v for k, v in sd.items()
               if k.startswith("mono_model.")}
    dv, dleft = convert_depth_anything_v2(dino_sd, encoder)
    if dleft:
        raise ValueError(f"unconsumed mono_model keys: {dleft[:5]}")
    b.params.setdefault("mono_model", {}).update(dv["params"])
    b.used.update("mono_model." + k for k in dino_sd)

    return b.finish(expect_unused=("num_batches_tracked", ".norm3.",
                                   "mono_model.pretrained.mask_token",
                                   "refinenet4.resConfUnit1"))


CONVERTERS = {
    "PSMNet": convert_psmnet,
    "GwcNet_G": convert_gwcnet,
    "GwcNet_GC": convert_gwcnet,
    "ACVNet": convert_acvnet,
    "CFNet": convert_cfnet,
    "STTR": convert_sttr,
    "PCWNet_G": convert_pcwnet,
    "PCWNet_GC": convert_pcwnet,
    "RAFTStereo": convert_raft_stereo,
    "IGEVStereo": convert_igev_stereo,
    "SelectiveRAFT": convert_selective_raft,
    "SelectiveIGEV": convert_selective_igev,
    "DepthAnythingV2": convert_depth_anything_v2,
    "MonSter": convert_monster,
    "DEFOMStereo_S": convert_defom,
    "DEFOMStereo_L": convert_defom,
    "FoundationStereo_S": convert_foundation,
    "FoundationStereo_L": convert_foundation,
    "StereoAnywhere": convert_stereoanywhere,
}


def import_torch_checkpoint(model_name: str, sd_or_path) -> dict:
    """Convert a reference checkpoint (path or state-dict mapping) into
    variables for `create_model(model_name)`. Raises on unknown models or
    unconsumed weight keys."""
    sd = (load_torch_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else sd_or_path)
    if model_name not in CONVERTERS:
        raise KeyError(
            f"No torch converter for {model_name!r}; have "
            f"{sorted(CONVERTERS)}")
    variables, leftovers = CONVERTERS[model_name](sd)
    if leftovers:
        raise ValueError(
            f"{len(leftovers)} torch keys were not consumed, e.g. "
            f"{leftovers[:5]}")
    return variables
