"""CFNet (CVPR'21) — fused multi-scale volumes + uncertainty-driven cascade.

TPU-native re-design of models/CFNet/cfnet.py:
  * UNet feature pyramid with icnet-style pyramid pooling and Mish
    activations throughout (cfnet.py:12-176, submodule.py:99-106);
  * group-wise + concat volumes at 1/8, 1/16, 1/32 fused by `hourglassup`
    (cfnet.py:502-531, :178-230);
  * cascade: soft-argmax → per-pixel variance → search range
    ``μ ± (γ+1)σ + β`` (cfnet.py:538-546) → uniform disparity samples
    (:437-472) → warped-feature cost volumes at 1/4 (s3) and 1/2 (s2)
    (:473-499 via `ops.concat/gwc_volume_from_samples`);
  * train returns 9 predictions (:651), eval returns `pred1_s2` (:664).

All sample-based regressions use static sample counts (S+2), so every stage
compiles to a fixed shape. Constraint (inherited from the hourglass
down/up-sampling pairs, present in the reference too): ``sample_count + 2``
must be divisible by 4 — the defaults 10/14 → 12/16 satisfy it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.ops.volume import (concat_volume_from_samples,
                                           disparity_variance_confidence,
                                           gwc_volume_from_samples)
from stereo_toolbox_tpu.nn.layers import ConvBNAct, ConvTransposeBN, avg_pool


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class CFBasicBlock(nn.Module):
    """Residual block with Mish (models/CFNet/submodule.py:252-283)."""
    features: int
    strides: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNAct(self.features, 3, self.strides, act=mish,
                        dtype=self.dtype)(x, train)
        out = ConvBNAct(self.features, 3, 1, act=None,
                        dtype=self.dtype)(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBNAct(self.features, 1, self.strides, padding=0,
                          act=None, dtype=self.dtype)(x, train)
        return out + x


class PyramidPooling(nn.Module):
    """icnet sum-mode pyramid pooling (submodule.py:11-73)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        import numpy as np
        k_sizes = []
        for ps in np.linspace(2, min(h, w), 4, dtype=int):
            k_sizes.append((max(h // int(ps), 1), max(w // int(ps), 1)))
        k_sizes = k_sizes[::-1]
        pp = x
        for i, k in enumerate(k_sizes):
            out = avg_pool(x, k, k)
            out = ConvBNAct(x.shape[-1], 1, padding=0, act=mish,
                            dtype=self.dtype, name=f"path{i}")(out, train)
            out = ops.interpolate(out, (h, w), (1, 2), align_corners=False)
            pp = pp + 0.25 * out
        return mish(pp / 2.0)


class CFFeature(nn.Module):
    """UNet encoder-decoder with per-scale gw/concat heads
    (cfnet.py:12-176)."""
    concat_channels: int = 12
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        for s in (2, 1, 1):
            x = ConvBNAct(32, 3, s, act=mish, dtype=dt)(x, train)
        l2 = CFBasicBlock(64, 1, dtype=dt)(x, train)      # 1/2
        l3 = CFBasicBlock(128, 2, dtype=dt)(l2, train)    # 1/4
        l4 = CFBasicBlock(192, 2, dtype=dt)(l3, train)    # 1/8
        l5 = CFBasicBlock(256, 2, dtype=dt)(l4, train)    # 1/16
        l6 = CFBasicBlock(512, 2, dtype=dt)(l5, train)    # 1/32
        l6 = PyramidPooling(dtype=dt)(l6, train)

        def up(x, ch, name):
            x = ops.resize_nearest(x, (x.shape[1] * 2, x.shape[2] * 2),
                                   (1, 2))
            return ConvBNAct(ch, 3, act=mish, dtype=dt, name=name)(x, train)

        d5 = ConvBNAct(256, 3, act=mish, dtype=dt, name="iconv5")(
            jnp.concatenate([l5, up(l6, 256, "upconv6")], -1), train)
        d4 = ConvBNAct(192, 3, act=mish, dtype=dt, name="iconv4")(
            jnp.concatenate([l4, up(d5, 192, "upconv5")], -1), train)
        d3 = ConvBNAct(128, 3, act=mish, dtype=dt, name="iconv3")(
            jnp.concatenate([l3, up(d4, 128, "upconv4")], -1), train)
        d2 = ConvBNAct(64, 3, act=mish, dtype=dt, name="iconv2")(
            jnp.concatenate([l2, up(d3, 64, "upconv3")], -1), train)

        def head(x, mid, out, name):
            h = ConvBNAct(mid, 3, act=mish, dtype=dt,
                          name=f"{name}_0")(x, train)
            return nn.Conv(out, (1, 1), use_bias=False, dtype=dt,
                           name=f"{name}_1")(h)

        cc = self.concat_channels
        return {
            "gw2": head(d2, 80, 80, "gw2"),
            "gw3": head(d3, 160, 160, "gw3"),
            "gw4": head(d4, 160, 160, "gw4"),
            "gw5": head(d5, 320, 320, "gw5"),
            "gw6": head(l6, 320, 320, "gw6"),
            "concat_feature2": head(d2, 32, cc // 2, "concat2"),
            "concat_feature3": head(d3, 128, cc, "concat3"),
            "concat_feature4": head(d4, 128, cc, "concat4"),
            "concat_feature5": head(d5, 128, cc, "concat5"),
            "concat_feature6": head(l6, 128, cc, "concat6"),
        }


class HourglassUp(nn.Module):
    """Multi-scale fusing hourglass (cfnet.py:178-230)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, feature4, feature5, train: bool = False):
        f = self.features
        dt = self.dtype
        c1 = nn.Conv(f * 2, (3, 3, 3), strides=2, padding=1, use_bias=False,
                     dtype=dt)(x)
        c1 = ConvBNAct(f * 2, 3, act=mish, dtype=dt, name="combine1")(
            jnp.concatenate([c1, feature4], -1), train)
        c2 = ConvBNAct(f * 2, 3, act=mish, dtype=dt)(c1, train)
        c3 = nn.Conv(f * 4, (3, 3, 3), strides=2, padding=1, use_bias=False,
                     dtype=dt)(c2)
        c3 = ConvBNAct(f * 4, 3, act=mish, dtype=dt, name="combine2")(
            jnp.concatenate([c3, feature5], -1), train)
        c4 = ConvBNAct(f * 4, 3, act=mish, dtype=dt)(c3, train)
        up8 = ConvTransposeBN(f * 2, 3, 2, dtype=dt)(c4, train)
        r2 = ConvBNAct(f * 2, 1, padding=0, act=None, dtype=dt)(c2, train)
        c8 = mish(up8 + r2)
        up9 = ConvTransposeBN(f, 3, 2, dtype=dt)(c8, train)
        r1 = ConvBNAct(f, 1, padding=0, act=None, dtype=dt)(x, train)
        return mish(up9 + r1)


class HourglassMish(nn.Module):
    """Redir hourglass with Mish (cfnet.py:231-272)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        dt = self.dtype
        hg_impl = __import__("os").environ.get("STTPU_CF_HG", "auto")
        c1 = ConvBNAct(f * 2, 3, 2, act=mish, dtype=dt)(x, train)
        c2 = ConvBNAct(f * 2, 3, 1, act=mish, conv3d_impl=hg_impl,
                       dtype=dt)(c1, train)
        c3 = ConvBNAct(f * 4, 3, 2, act=mish, dtype=dt)(c2, train)
        c4 = ConvBNAct(f * 4, 3, 1, act=mish, conv3d_impl=hg_impl,
                       dtype=dt)(c3, train)
        up5 = ConvTransposeBN(f * 2, 3, 2, dtype=dt)(c4, train)
        r2 = ConvBNAct(f * 2, 1, padding=0, act=None, dtype=dt)(c2, train)
        c5 = mish(up5 + r2)
        up6 = ConvTransposeBN(f, 3, 2, dtype=dt)(c5, train)
        r1 = ConvBNAct(f, 1, padding=0, act=None, dtype=dt)(x, train)
        return mish(up6 + r1)


def uniform_samples(min_d, max_d, count):
    """`UniformSampler` + floor/ceil endpoints (submodule.py:280-300,
    cfnet.py:453-472). min_d/max_d: [B, H, W]; returns [B, count+2, H, W]
    integer-valued floats."""
    mult = (max_d - min_d) / (count + 1)
    steps = jnp.arange(1.0, count + 1)[None, :, None, None]
    samples = min_d[:, None] + mult[:, None] * steps
    samples = jnp.concatenate(
        [jnp.floor(min_d)[:, None], samples, jnp.ceil(max_d)[:, None]],
        axis=1)
    return jnp.floor(samples)  # reference casts .long() → trunc toward 0 (≥0)


class CFNet(nn.Module):
    max_disp: int = 192
    num_groups: int = 40
    concat_channels: int = 12
    sample_count_s2: int = 10
    sample_count_s3: int = 14
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        B, H, W, _ = left.shape
        dt = self.dtype
        feat = CFFeature(self.concat_channels, dtype=dt,
                         name="feature_extraction")
        from stereo_toolbox_tpu.nn.layers import dual_view_apply
        fl, fr = dual_view_apply(feat, left, right, train)

        def fused_volume(scale, d):
            gwc = ops.build_gwc_volume(fl[f"gw{scale}"], fr[f"gw{scale}"],
                                       d, self.num_groups)
            cv = ops.build_concat_volume(fl[f"concat_feature{scale}"],
                                         fr[f"concat_feature{scale}"], d)
            return jnp.concatenate([gwc, cv], -1)

        v4 = fused_volume(4, self.max_disp // 8)
        v5 = fused_volume(5, self.max_disp // 16)
        v6 = fused_volume(6, self.max_disp // 32)

        def dres(x, ch, name):
            c = ConvBNAct(ch, 3, act=mish, dtype=dt,
                          name=f"{name}_a")(x, train)
            c = ConvBNAct(ch, 3, act=mish, dtype=dt,
                          name=f"{name}_b")(c, train)
            r = ConvBNAct(ch, 3, act=mish, dtype=dt,
                          name=f"{name}_c")(c, train)
            r = ConvBNAct(ch, 3, act=None, dtype=dt,
                          name=f"{name}_d")(r, train)
            return r + c

        cost0_4 = dres(v4, 32, "dres4")
        cost0_5 = dres(v5, 64, "dres5")
        cost0_6 = dres(v6, 64, "dres6")

        out1_4 = HourglassUp(32, dtype=dt, name="combine1")(
            cost0_4, cost0_5, cost0_6, train)
        out2_4 = HourglassMish(32, dtype=dt, name="dres3")(out1_4, train)

        def classify(x, ch, name):
            c = ConvBNAct(ch, 3, act=mish, dtype=dt,
                          name=f"{name}_conv")(x, train)
            return nn.Conv(1, (3, 3, 3), use_bias=False, dtype=dt,
                           name=f"{name}_out")(c)[..., 0]

        # ---- stage s4 (1/8): full-range volume --------------------------
        d8 = self.max_disp // 8
        cost2_s4 = classify(out2_4, 32, "classif2").astype(jnp.float32)
        prob2_s4 = jax.nn.softmax(cost2_s4, axis=1)
        pred2_s4 = ops.disparity_regression(prob2_s4, d8)
        pred2_s4_cur = jax.lax.stop_gradient(pred2_s4)
        var_s4 = jnp.sqrt(ops.disparity_variance(prob2_s4, pred2_s4_cur)
                          + 1e-12)

        gamma_s3 = self.param("gamma_s3", nn.initializers.zeros, (1,))
        beta_s3 = self.param("beta_s3", nn.initializers.zeros, (1,))
        gamma_s2 = self.param("gamma_s2", nn.initializers.zeros, (1,))
        beta_s2 = self.param("beta_s2", nn.initializers.zeros, (1,))

        def upx2(d):  # [B, h, w] -> [B, 2h, 2w], values ×2
            return ops.interpolate(d * 2.0, (d.shape[1] * 2, d.shape[2] * 2),
                                   (1, 2), align_corners=True)

        min_s3 = upx2(pred2_s4_cur - (gamma_s3[0] + 1) * var_s4 - beta_s3[0])
        max_s3 = upx2(pred2_s4_cur + (gamma_s3[0] + 1) * var_s4 + beta_s3[0])

        def search_range(count, lo, hi, scale):
            cap = self.max_disp / (2 ** scale) - 1
            widen = jnp.clip(count - hi + lo, 0, None) / 2.0
            return (jnp.clip(lo - widen, 0, cap),
                    jnp.clip(hi + widen, 0, cap))

        min_s3, max_s3 = search_range(self.sample_count_s3 + 1, min_s3,
                                      max_s3, 2)
        samples_s3 = uniform_samples(min_s3, max_s3, self.sample_count_s3)

        # ---- stage s3 (1/4): sample-based volume ------------------------
        cv_concat_s3 = concat_volume_from_samples(
            fl["concat_feature3"], fr["concat_feature3"], samples_s3,
            max_shift=self.max_disp // 4)
        cv_gwc_s3 = gwc_volume_from_samples(fl["gw3"], fr["gw3"], samples_s3,
                                            self.num_groups,
                                            max_shift=self.max_disp // 4)
        conf_s3 = jnp.concatenate(
            [cv_gwc_s3, cv_concat_s3,
             samples_s3[..., None].astype(cv_gwc_s3.dtype)], -1)

        cost0_s3 = dres(conf_s3, 32, "confidence_s3")
        out1_s3 = HourglassMish(32, dtype=dt,
                                name="confidence2_s3")(cost0_s3, train)
        out2_s3 = HourglassMish(32, dtype=dt,
                                name="confidence3_s3")(out1_s3, train)

        def sample_regress(cost, samples):
            prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
            return (prob * samples).sum(axis=1), prob

        cost1_s3 = classify(out2_s3, 32, "confidence_classif1_s3")
        pred1_s3, prob1_s3 = sample_regress(cost1_s3, samples_s3)
        pred1_s3_cur = jax.lax.stop_gradient(pred1_s3)
        var_s3 = jnp.sqrt(disparity_variance_confidence(
            prob1_s3, samples_s3, pred1_s3_cur) + 1e-12)

        min_s2 = upx2(pred1_s3_cur - (gamma_s2[0] + 1) * var_s3 - beta_s2[0])
        max_s2 = upx2(pred1_s3_cur + (gamma_s2[0] + 1) * var_s3 + beta_s2[0])
        min_s2, max_s2 = search_range(self.sample_count_s2 + 1, min_s2,
                                      max_s2, 1)
        samples_s2 = uniform_samples(min_s2, max_s2, self.sample_count_s2)

        # ---- stage s2 (1/2) ---------------------------------------------
        cv_concat_s2 = concat_volume_from_samples(
            fl["concat_feature2"], fr["concat_feature2"], samples_s2,
            max_shift=self.max_disp // 2)
        cv_gwc_s2 = gwc_volume_from_samples(fl["gw2"], fr["gw2"], samples_s2,
                                            self.num_groups // 2,
                                            max_shift=self.max_disp // 2)
        conf_s2 = jnp.concatenate(
            [cv_gwc_s2, cv_concat_s2,
             samples_s2[..., None].astype(cv_gwc_s2.dtype)], -1)

        cost0_s2 = dres(conf_s2, 16, "confidence_s2")
        out1_s2 = HourglassMish(16, dtype=dt,
                                name="confidence2_s2")(cost0_s2, train)
        out2_s2 = HourglassMish(16, dtype=dt,
                                name="confidence3_s2")(out1_s2, train)
        cost1_s2 = classify(out2_s2, 16, "confidence_classif1_s2")
        pred1_s2, _ = sample_regress(cost1_s2, samples_s2)

        def up_to_full(d, factor):
            return ops.interpolate(d * factor, (H, W), (1, 2),
                                   align_corners=True)

        pred1_s2_up = up_to_full(pred1_s2, 2)
        if not train:
            return pred1_s2_up

        # ---- training heads (cfnet.py:604-651) --------------------------
        def regress_full(cost_low, d):
            c = ops.interpolate(cost_low.astype(jnp.float32),
                                (self.max_disp, H, W), (1, 2, 3),
                                align_corners=True)
            return ops.disparity_regression(jax.nn.softmax(c, 1),
                                            self.max_disp)

        pred0_4 = regress_full(classify(cost0_4, 32, "classif0"), d8)
        pred1_4 = regress_full(classify(out1_4, 32, "classif1"), d8)
        pred2_s4_up = up_to_full(pred2_s4, 8)

        pred0_s3, _ = sample_regress(
            classify(cost0_s3, 32, "confidence_classif0_s3"), samples_s3)
        predmid_s3, _ = sample_regress(
            classify(out1_s3, 32, "confidence_classifmid_s3"), samples_s3)
        pred0_s2, _ = sample_regress(
            classify(cost0_s2, 16, "confidence_classif0_s2"), samples_s2)
        predmid_s2, _ = sample_regress(
            classify(out1_s2, 16, "confidence_classifmid_s2"), samples_s2)

        return [pred0_4, pred1_4, pred2_s4_up,
                up_to_full(pred0_s3, 4), up_to_full(predmid_s3, 4),
                up_to_full(pred1_s3, 4),
                up_to_full(pred0_s2, 2), up_to_full(predmid_s2, 2),
                pred1_s2_up]
