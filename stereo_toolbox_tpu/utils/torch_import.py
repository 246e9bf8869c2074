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
                       flip: bool = True) -> None:
        """torch ConvTranspose weight [I, O, *k] → flax [*k, I, O]."""
        w = self._take(f"{torch_prefix}.weight")
        rank = w.ndim - 2
        if flip:
            w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * rank]
        perm = tuple(range(2, 2 + rank)) + (0, 1)
        _set(self.params, f"{flax_path}/kernel", w.transpose(perm))

    def bn(self, flax_path: str, torch_prefix: str) -> None:
        _set(self.params, f"{flax_path}/scale",
             self._take(f"{torch_prefix}.weight"))
        _set(self.params, f"{flax_path}/bias",
             self._take(f"{torch_prefix}.bias"))
        _set(self.stats, f"{flax_path}/mean",
             self._take(f"{torch_prefix}.running_mean"))
        _set(self.stats, f"{flax_path}/var",
             self._take(f"{torch_prefix}.running_var"))

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


CONVERTERS = {
    "PSMNet": convert_psmnet,
    "GwcNet_G": convert_gwcnet,
    "GwcNet_GC": convert_gwcnet,
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
