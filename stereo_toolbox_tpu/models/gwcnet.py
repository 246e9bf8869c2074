"""GwcNet (CVPR'19) — group-wise correlation volume, redirected hourglasses.

TPU-native re-design of models/GwcNet/gwcnet.py:
  * shared trunk with PSMNet's residual stages; gwc feature =
    concat(l2, l3, l4) = 320 channels (gwcnet.py:52-65);
  * 40-group correlation volume, optionally + 12-channel concat volume
    (gwcnet.py:175-182), built vectorized via the shared op library;
  * three stacked hourglasses with 1×1 `redir` skip connections
    (gwcnet.py:68-105);
  * 4 heads in training, head-3 only in eval (gwcnet.py:191-224).

Contract: ImageNet-normalized ``[B, H, W, 3]`` inputs; train →
``[pred0..pred3]``, eval → ``pred3`` (reference loss weights are
[0.5, 0.5, 0.7, 1.0] per the GwcNet paper).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.nn.layers import ConvBNAct, ConvTransposeBN, \
    BasicResBlock


class GwcFeature(nn.Module):
    """Residual trunk → gwc feature (320ch) and optional concat feature."""
    concat_feature: bool = False
    concat_channels: int = 12
    dtype: jnp.dtype | None = None

    def _layer(self, x, planes, blocks, stride, dilation, train):
        x = BasicResBlock(planes, stride, dilation,
                          downsample=(stride != 1 or x.shape[-1] != planes),
                          dtype=self.dtype)(x, train)
        for _ in range(1, blocks):
            x = BasicResBlock(planes, 1, dilation, dtype=self.dtype)(x, train)
        return x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        for stride in (2, 1, 1):
            x = ConvBNAct(32, 3, stride, dtype=self.dtype)(x, train)
        x = self._layer(x, 32, 3, 1, 1, train)
        l2 = self._layer(x, 64, 16, 2, 1, train)
        l3 = self._layer(l2, 128, 3, 1, 1, train)
        l4 = self._layer(l3, 128, 3, 1, 2, train)
        gwc = jnp.concatenate([l2, l3, l4], axis=-1)
        if not self.concat_feature:
            return {"gwc_feature": gwc}
        cf = ConvBNAct(128, 3, dtype=self.dtype)(gwc, train)
        cf = nn.Conv(self.concat_channels, (1, 1), use_bias=False,
                     dtype=self.dtype)(cf)
        return {"gwc_feature": gwc, "concat_feature": cf}


class HourglassRedir(nn.Module):
    """3D hourglass with 1×1 redir skips (gwcnet.py:68-105)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        c1 = ConvBNAct(f * 2, 3, 2, dtype=self.dtype)(x, train)
        c2 = ConvBNAct(f * 2, 3, 1, dtype=self.dtype)(c1, train)
        c3 = ConvBNAct(f * 4, 3, 2, dtype=self.dtype)(c2, train)
        c4 = ConvBNAct(f * 4, 3, 1, dtype=self.dtype)(c3, train)
        up5 = ConvTransposeBN(f * 2, 3, 2, dtype=self.dtype)(c4, train)
        r2 = ConvBNAct(f * 2, 1, padding=0, act=None, dtype=self.dtype)(
            c2, train)
        c5 = nn.relu(up5 + r2)
        up6 = ConvTransposeBN(f, 3, 2, dtype=self.dtype)(c5, train)
        r1 = ConvBNAct(f, 1, padding=0, act=None, dtype=self.dtype)(x, train)
        return nn.relu(up6 + r1)


class GwcNet(nn.Module):
    max_disp: int = 192
    use_concat_volume: bool = False
    num_groups: int = 40
    concat_channels: int = 12
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left: jax.Array, right: jax.Array,
                 train: bool = False):
        B, H, W, _ = left.shape
        feat = GwcFeature(self.use_concat_volume, self.concat_channels,
                          dtype=self.dtype, name="feature_extraction")
        from stereo_toolbox_tpu.nn.layers import dual_view_apply
        fl, fr = dual_view_apply(feat, left, right, train)

        d4 = self.max_disp // 4
        volume = ops.build_gwc_volume(fl["gwc_feature"], fr["gwc_feature"],
                                      d4, self.num_groups)
        if self.use_concat_volume:
            cvol = ops.build_concat_volume(fl["concat_feature"],
                                           fr["concat_feature"], d4)
            volume = jnp.concatenate([volume, cvol], axis=-1)

        c = ConvBNAct(32, 3, dtype=self.dtype)(volume, train)
        c = ConvBNAct(32, 3, dtype=self.dtype)(c, train)
        cost0 = c
        c = ConvBNAct(32, 3, dtype=self.dtype)(cost0, train)
        c = ConvBNAct(32, 3, act=None, dtype=self.dtype)(c, train)
        cost0 = c + cost0

        out1 = HourglassRedir(32, dtype=self.dtype)(cost0, train)
        out2 = HourglassRedir(32, dtype=self.dtype)(out1, train)
        out3 = HourglassRedir(32, dtype=self.dtype)(out2, train)

        def classify(x, name):
            x = ConvBNAct(32, 3, dtype=self.dtype,
                          name=f"{name}_conv")(x, train)
            return nn.Conv(1, (3, 3, 3), use_bias=False, dtype=self.dtype,
                           name=f"{name}_out")(x)

        def regress(cost_low):
            from stereo_toolbox_tpu.ops import upsample as _ups
            if not train and _ups.FUSED_EVAL_HEAD:
                # fused upsample→softmax→soft-argmax: the D-expanded
                # full-res f32 volume is never materialized (ops/upsample)
                return ops.softargmax_trilinear(cost_low[..., 0],
                                                self.max_disp, H, W)
            c = ops.interpolate(cost_low[..., 0], (self.max_disp, H, W),
                                (1, 2, 3), align_corners=False)
            prob = jax.nn.softmax(c.astype(jnp.float32), axis=1)
            return ops.disparity_regression(prob, self.max_disp)

        pred3 = regress(classify(out3, "classif3"))
        if train:
            return [regress(classify(cost0, "classif0")),
                    regress(classify(out1, "classif1")),
                    regress(classify(out2, "classif2")), pred3]
        return pred3


def GwcNet_G(max_disp: int = 192, **kw) -> GwcNet:
    return GwcNet(max_disp=max_disp, use_concat_volume=False, **kw)


def GwcNet_GC(max_disp: int = 192, **kw) -> GwcNet:
    return GwcNet(max_disp=max_disp, use_concat_volume=True, **kw)
