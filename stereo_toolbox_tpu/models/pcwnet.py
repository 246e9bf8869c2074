"""PCWNet (ECCV'22) — pyramid multi-scale cost-volume fusion + refinement.

TPU-native re-design of models/PCWNet/pcwnet.py:
  * PSMNet-style trunk extended to 1/8, 1/16, 1/32 with 320-ch gw heads per
    scale (pcwnet.py:12-131);
  * 40-group (+12-ch concat) volumes at all four scales; the 1/4 volume is
    aggregated and the deeper ones are injected scale-by-scale inside the
    fusing `hourglassup` (pcwnet.py:133-209, :417-429);
  * three Mish hourglasses + 5 classifier heads (:211-252, :330-360);
  * full-resolution refinement: warp right refine-features by pred3, build a
    ±24 signed-offset correlation, and predict a residual disparity with a
    dilated conv stack (`refinenet_version3`, :254-309, :441-480).

Train → ``[pred0, combine, pred1, pred2, pred3, disp_finetune]`` (:480);
eval → ``disp_finetune`` (:509).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.cfnet import (CFBasicBlock, HourglassMish,
                                             mish)
from stereo_toolbox_tpu.nn.layers import ConvBNAct, ConvTransposeBN
from stereo_toolbox_tpu.ops.sampling import bilinear_sampler, coords_grid


def signed_correlation_volume(left: jax.Array, right: jax.Array,
                              radius: int) -> jax.Array:
    """Mean-correlation at signed offsets -radius..radius.

    Exact parity with the reference's `build_corrleation_volume`
    (models/PCWNet/submodule.py:121-135), INCLUDING its negative-offset
    slice bug: for i < 0 the reference writes ``volume[..., :-i] =
    corr(ref[..., :-i], target[..., i:])`` — with i negative, ``:-i`` is
    the first |i| columns, so the left image's leading columns are
    correlated against the right image's trailing columns (the intended
    slice was ``:i``). Published checkpoints were trained with this
    behavior, so imports must reproduce it.

    Returns ``[B, H, W, 2*radius+1]``.
    """
    w = left.shape[2]
    outs = []
    for off in range(-radius, radius + 1):
        if off > 0:
            prod = (left[:, :, off:] * right[:, :, :w - off]).mean(-1)
            prod = jnp.pad(prod, ((0, 0), (0, 0), (off, 0)))
        elif off < 0:
            k = -off
            prod = (left[:, :, :k] * right[:, :, w - k:]).mean(-1)
            prod = jnp.pad(prod, ((0, 0), (0, 0), (0, w - k)))
        else:
            prod = (left * right).mean(-1)
        outs.append(prod)
    return jnp.stack(outs, axis=-1)


class PCWFeature(nn.Module):
    """Deep trunk with per-scale gw/concat heads (pcwnet.py:12-131)."""
    concat_channels: int = 12
    dtype: jnp.dtype | None = None

    def _layer(self, x, planes, blocks, stride, dilation, train):
        x = CFBasicBlock(planes, stride, dtype=self.dtype)(x, train) \
            if dilation == 1 else \
            _DilatedBlock(planes, dilation, dtype=self.dtype)(x, train)
        for _ in range(1, blocks):
            if dilation == 1:
                x = CFBasicBlock(planes, 1, dtype=self.dtype)(x, train)
            else:
                x = _DilatedBlock(planes, dilation, dtype=self.dtype)(x,
                                                                      train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        for s in (2, 1, 1):
            x = ConvBNAct(32, 3, s, act=mish, dtype=dt)(x, train)
        x = self._layer(x, 32, 3, 1, 1, train)
        l2 = self._layer(x, 64, 16, 2, 1, train)    # 1/4
        l3 = self._layer(l2, 128, 3, 1, 1, train)
        l4 = self._layer(l3, 128, 3, 1, 2, train)
        l5 = self._layer(l4, 192, 3, 2, 1, train)   # 1/8
        l6 = self._layer(l5, 256, 3, 2, 1, train)   # 1/16
        l7 = self._layer(l6, 512, 3, 2, 1, train)   # 1/32

        combine = jnp.concatenate([l2, l3, l4], axis=-1)  # 320 @ 1/4

        def head(x, mid, out, name, k=3):
            h = ConvBNAct(mid, k, act=mish, dtype=dt,
                          name=f"{name}_0")(x, train)
            return nn.Conv(out, (1, 1), use_bias=False, dtype=dt,
                           name=f"{name}_1")(h)

        refine = ConvBNAct(128, 3, act=mish, dtype=dt,
                           name="refine_0")(combine, train)
        refine = ConvBNAct(32, 1, padding=0, act=mish, dtype=dt,
                           name="refine_1")(refine, train)

        cc = self.concat_channels
        return {
            "gw1": head(combine, 320, 320, "gw1"),
            "gw2": head(l5, 320, 320, "gw2"),
            "gw3": head(l6, 320, 320, "gw3"),
            "gw4": head(l7, 320, 320, "gw4"),
            "concat_feature1": head(combine, 128, cc, "concat1"),
            "concat_feature2": head(l5, 128, cc, "concat2"),
            "concat_feature3": head(l6, 128, cc, "concat3"),
            "concat_feature4": head(l7, 128, cc, "concat4"),
            "finetune_feature": refine,
        }


class _DilatedBlock(nn.Module):
    features: int
    dilation: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNAct(self.features, 3, 1, dilation=self.dilation,
                        act=mish, dtype=self.dtype)(x, train)
        out = ConvBNAct(self.features, 3, 1, dilation=self.dilation,
                        act=None, dtype=self.dtype)(out, train)
        if x.shape[-1] != self.features:
            x = ConvBNAct(self.features, 1, 1, padding=0, act=None,
                          dtype=self.dtype)(x, train)
        return out + x


class HourglassUp3(nn.Module):
    """Three-scale fusing hourglass (pcwnet.py:133-209)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, v2, v3, v4, train: bool = False):
        f = self.features
        dt = self.dtype

        def down(x, ch):
            return nn.Conv(ch, (3, 3, 3), strides=2, padding=1,
                           use_bias=False, dtype=dt)(x)

        c1 = down(x, f * 2)
        c1 = ConvBNAct(f * 2, 3, act=mish, dtype=dt, name="combine1")(
            jnp.concatenate([c1, v2], -1), train)
        c2 = ConvBNAct(f * 2, 3, act=mish, dtype=dt)(c1, train)
        c3 = down(c2, f * 4)
        c3 = ConvBNAct(f * 4, 3, act=mish, dtype=dt, name="combine2")(
            jnp.concatenate([c3, v3], -1), train)
        c4 = ConvBNAct(f * 4, 3, act=mish, dtype=dt)(c3, train)
        c5 = down(c4, f * 4)
        c5 = ConvBNAct(f * 4, 3, act=mish, dtype=dt, name="combine3")(
            jnp.concatenate([c5, v4], -1), train)
        c6 = ConvBNAct(f * 4, 3, act=mish, dtype=dt)(c5, train)

        up7 = ConvTransposeBN(f * 4, 3, 2, dtype=dt)(c6, train)
        r3 = ConvBNAct(f * 4, 1, padding=0, act=None, dtype=dt)(c4, train)
        c7 = mish(up7 + r3)
        up8 = ConvTransposeBN(f * 2, 3, 2, dtype=dt)(c7, train)
        r2 = ConvBNAct(f * 2, 1, padding=0, act=None, dtype=dt)(c2, train)
        c8 = mish(up8 + r2)
        up9 = ConvTransposeBN(f, 3, 2, dtype=dt)(c8, train)
        r1 = ConvBNAct(f, 1, padding=0, act=None, dtype=dt)(x, train)
        return mish(up9 + r1)


class RefineNetV3(nn.Module):
    """Dilated residual refinement (pcwnet.py:254-309)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, disp, train: bool = False):
        dt = self.dtype
        h = ConvBNAct(128, 3, act=mish, dtype=dt)(x, train)
        h = ConvBNAct(128, 3, act=mish, dtype=dt)(h, train)
        h = ConvBNAct(128, 3, dilation=2, act=mish, dtype=dt)(h, train)
        h = ConvBNAct(128, 3, dilation=4, act=mish, dtype=dt)(h, train)
        h = _DilatedBlock(96, 8, dtype=dt)(h, train)
        h = _DilatedBlock(64, 16, dtype=dt)(h, train)
        h = _DilatedBlock(32, 1, dtype=dt)(h, train)
        delta = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                        dtype=dt)(h)
        return disp + delta[..., 0].astype(jnp.float32)


class PCWNet(nn.Module):
    max_disp: int = 192
    use_concat_volume: bool = True
    num_groups: int = 40
    concat_channels: int = 12
    refine_radius: int = 24
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        B, H, W, _ = left.shape
        dt = self.dtype
        feat = PCWFeature(self.concat_channels, dtype=dt,
                          name="feature_extraction")
        from stereo_toolbox_tpu.nn.layers import dual_view_apply
        fl, fr = dual_view_apply(feat, left, right, train)

        def volume(scale, d):
            v = ops.build_gwc_volume(fl[f"gw{scale}"], fr[f"gw{scale}"], d,
                                     self.num_groups)
            if self.use_concat_volume:
                cv = ops.build_concat_volume(fl[f"concat_feature{scale}"],
                                             fr[f"concat_feature{scale}"], d)
                v = jnp.concatenate([v, cv], -1)
            return v

        v1 = volume(1, self.max_disp // 4)
        v2 = volume(2, self.max_disp // 8)
        v3 = volume(3, self.max_disp // 16)
        v4 = volume(4, self.max_disp // 32)

        c = ConvBNAct(32, 3, act=mish, dtype=dt)(v1, train)
        c = ConvBNAct(32, 3, act=mish, dtype=dt)(c, train)
        cost0 = c
        c = ConvBNAct(32, 3, act=mish, dtype=dt)(cost0, train)
        c = ConvBNAct(32, 3, act=None, dtype=dt)(c, train)
        cost0 = c + cost0

        combine = HourglassUp3(32, dtype=dt, name="combine1")(
            cost0, v2, v3, v4, train)
        out1 = HourglassMish(32, dtype=dt)(combine, train)
        out2 = HourglassMish(32, dtype=dt)(out1, train)
        out3 = HourglassMish(32, dtype=dt)(out2, train)

        def classify(x, name):
            h = ConvBNAct(32, 3, act=mish, dtype=dt,
                          name=f"{name}_conv")(x, train)
            return nn.Conv(1, (3, 3, 3), use_bias=False, dtype=dt,
                           name=f"{name}_out")(h)[..., 0]

        def regress(cost_low):
            cfull = ops.interpolate(cost_low.astype(jnp.float32),
                                    (self.max_disp, H, W), (1, 2, 3),
                                    align_corners=True)
            return ops.disparity_regression(jax.nn.softmax(cfull, 1),
                                            self.max_disp)

        pred3 = regress(classify(out3, "classif3"))

        # --- full-resolution refinement (pcwnet.py:441-480) -------------
        rf_l = ops.interpolate(fl["finetune_feature"], (H, W), (1, 2),
                               align_corners=True)
        rf_r = ops.interpolate(fr["finetune_feature"], (H, W), (1, 2),
                               align_corners=True)
        # the reference warp normalizes by (W-1)/(H-1) but grid_samples with
        # align_corners=False (submodule.py:136-176), so the effective sample
        # position is (x - d)·W/(W-1) - 0.5 (and y·H/(H-1) - 0.5); its mask
        # is bilinear-sampled ones thresholded at 0.999 — reproduce exactly
        grid = coords_grid(B, H, W, dtype=jnp.float32)
        coords = jnp.stack(
            [(grid[..., 0] - pred3) * (W / (W - 1.0)) - 0.5,
             grid[..., 1] * (H / (H - 1.0)) - 0.5], axis=-1)
        warped = bilinear_sampler(rf_r, coords)
        wmask = bilinear_sampler(jnp.ones_like(rf_r[..., :1]), coords)
        warped = warped * (wmask >= 0.999)
        corr = signed_correlation_volume(rf_l, warped, self.refine_radius)
        pred3_feat = ConvBNAct(32, 1, padding=0, act=mish, dtype=dt,
                               name="dispupsample")(pred3[..., None], train)
        refine_in = jnp.concatenate(
            [rf_l - warped, rf_l, pred3_feat, pred3[..., None], corr], -1)
        disp_finetune = RefineNetV3(dtype=dt, name="refinenet3")(
            refine_in.astype(dt) if dt else refine_in, pred3, train)

        if not train:
            return disp_finetune

        pred0 = regress(classify(cost0, "classif0"))
        pred_combine = regress(classify(combine, "classif4"))
        pred1 = regress(classify(out1, "classif1"))
        pred2 = regress(classify(out2, "classif2"))
        return [pred0, pred_combine, pred1, pred2, pred3, disp_finetune]


def PCWNet_G(max_disp: int = 192, **kw) -> PCWNet:
    return PCWNet(max_disp=max_disp, use_concat_volume=False, **kw)


def PCWNet_GC(max_disp: int = 192, **kw) -> PCWNet:
    return PCWNet(max_disp=max_disp, use_concat_volume=True, **kw)
