"""ACVNet (CVPR'22) — attention cost volume with staged training.

TPU-native re-design of models/ACVNet/acv.py:
  * GwcNet trunk → 40-group correlation volume;
  * "patch" depthwise (1,3,3) 3D convs at dilations 1/2/3 over channel
    slices 8/16/16 (acv.py:109-112, applied :183-187);
  * small hourglass (with block-local multi-head attention at the
    bottleneck, submodule.py:383-429) → `att_weights`;
  * ``softmax(att_weights, D) * concat_volume`` (acv.py:196);
  * staged-training flags: `attn_weights_only` trains just the attention
    branch; `freeze_attn_weights` stops gradients into it (acv.py:96-100,
    :164-176 — `lax.stop_gradient` replaces the reference's `torch.no_grad`).

Train returns ``[pred_attention, pred0, pred1, pred2]`` (minus stages per the
flags); eval returns ``pred2`` (or `pred_attention` when attn-only).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.gwcnet import GwcFeature
from stereo_toolbox_tpu.nn.layers import Conv3dFlex, ConvBNAct, \
    ConvTransposeBN


class BlockAttention3D(nn.Module):
    """Block-local MHSA over a ``[B, D, H, W, C]`` volume
    (parity: models/ACVNet/submodule.py:383-429, block=(4,4,4))."""
    num_heads: int = 16
    block: tuple[int, int, int] = (4, 4, 4)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, D0, H0, W0, C = x.shape
        bd, bh, bw = self.block
        pd, ph, pw = (-D0) % bd, (-H0) % bh, (-W0) % bw
        x = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
        _, D, H, W, _ = x.shape
        d, h, w = D // bd, H // bh, W // bw

        # Pre-blocked layout (round 5): transpose the INPUT into
        # [B, d, h, w, 64, C] block-token form BEFORE the qkv Dense, so the
        # only big transposes move 25 MB instead of the 75 MB fused-qkv
        # tensor. Measured 11.6 → ~7 ms per call at 1088×1920
        # (tools/opt_acvnet.py attn_parts). A dot_general variant keeping
        # the (4,4,4) block axes as free dims OOM'd the chip — XLA pads
        # tiny trailing dims to full (8,128) tiles (~60× on the logits).
        hd = C // self.num_heads
        xb = x.reshape(B, d, bd, h, bh, w, bw, C).transpose(
            0, 1, 3, 5, 2, 4, 6, 7).reshape(B, d, h, w, bd * bh * bw, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(xb)
        qkv = qkv.reshape(B, d, h, w, bd * bh * bw, 3, self.num_heads, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        scale = hd ** -0.5
        attn = jnp.einsum("bdhwqnc,bdhwknc->bdhwnqk", q, k,
                          preferred_element_type=jnp.float32) * scale

        if pd or ph or pw:
            valid = jnp.zeros((D, H, W), bool).at[:D0, :H0, :W0].set(True)
            valid = valid.reshape(d, bd, h, bh, w, bw).transpose(
                0, 2, 4, 1, 3, 5).reshape(d, h, w, bd * bh * bw)
            attn = jnp.where(
                valid[None, :, :, :, None, None, :], attn, -1000.0)

        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bdhwnqk,bdhwknc->bdhwqnc", attn, v)
        out = out.reshape(B, d, h, w, bd, bh, bw, C).transpose(
            0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, C)
        out = out[:, :D0, :H0, :W0]
        return nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="proj")(out)


class HourglassAttn(nn.Module):
    """Redir hourglass with attention at the bottleneck (acv.py:56-96)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        # stride-1 inner convs: via2d A/B'd end-to-end via STTPU_ACV_HG
        hg_impl = __import__("os").environ.get("STTPU_ACV_HG", "auto")
        c1 = ConvBNAct(f * 2, 3, 2, dtype=self.dtype)(x, train)
        c2 = ConvBNAct(f * 2, 3, 1, conv3d_impl=hg_impl,
                       dtype=self.dtype)(c1, train)
        c3 = ConvBNAct(f * 4, 3, 2, dtype=self.dtype)(c2, train)
        c4 = ConvBNAct(f * 4, 3, 1, conv3d_impl=hg_impl,
                       dtype=self.dtype)(c3, train)
        c4 = BlockAttention3D(num_heads=16, dtype=self.dtype)(c4)
        up5 = ConvTransposeBN(f * 2, 3, 2, dtype=self.dtype)(c4, train)
        r2 = ConvBNAct(f * 2, 1, padding=0, act=None,
                       dtype=self.dtype)(c2, train)
        c5 = nn.relu(up5 + r2)
        up6 = ConvTransposeBN(f, 3, 2, dtype=self.dtype)(c5, train)
        r1 = ConvBNAct(f, 1, padding=0, act=None, dtype=self.dtype)(x, train)
        return nn.relu(up6 + r1)


class _DWParams(nn.Module):
    """Parameter-only twin of the grouped nn.Conv in `_depthwise`: creates
    the identical ``[1, 3, 3, 1, C]`` kernel under the same scope name so
    checkpoints/converters are layout-independent."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (1, 3, 3, 1, self.features))


class ACVNet(nn.Module):
    max_disp: int = 192
    attn_weights_only: bool = False
    freeze_attn_weights: bool = False
    num_groups: int = 40
    concat_channels: int = 32
    dtype: jnp.dtype | None = None



    def _depthwise(self, x, dilation, name):
        """Depthwise (1,3,3) 3D conv (the reference 'patch' convs).

        Measured note (round 4): an unrolled 9-shift VPU formulation was
        tried here and LOST badly (468 → 671 ms full-model at 1088×1920) —
        XLA materializes each padded shift of the 500 MB volume. The
        grouped conv is the better lowering; `_DWParams` keeps the kernel
        parameter layout stable for checkpoints either way."""
        c = x.shape[-1]
        kern = _DWParams(c, dtype=self.dtype, name=name)()
        return jax.lax.conv_general_dilated(
            x.reshape((-1,) + x.shape[2:]),  # fold D into batch: 2D dw conv
            kern[0].astype(x.dtype),
            window_strides=(1, 1),
            padding=((dilation, dilation), (dilation, dilation)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ).reshape(x.shape)

    @nn.compact
    def __call__(self, left: jax.Array, right: jax.Array,
                 train: bool = False):
        B, H, W, _ = left.shape
        d4 = self.max_disp // 4
        feat = GwcFeature(concat_feature=False, dtype=self.dtype,
                          name="feature_extraction")
        from stereo_toolbox_tpu.nn.layers import dual_view_apply
        fl, fr = dual_view_apply(lambda x, t: feat(x, t)["gwc_feature"],
                                 left, right, train)

        # ---- attention-weights branch ---------------------------------
        gwc = ops.build_gwc_volume(fl, fr, d4, self.num_groups)
        gwc = self._depthwise(gwc, 1, "patch")
        p1 = self._depthwise(gwc[..., :8], 1, "patch_l1")
        p2 = self._depthwise(gwc[..., 8:24], 2, "patch_l2")
        p3 = self._depthwise(gwc[..., 24:40], 3, "patch_l3")
        patch_volume = jnp.concatenate([p1, p2, p3], axis=-1)
        # via2d lowering wins for these two stride-1 Co=32 volume convs
        # (22.5 vs 31 ms standalone at 1088×1920) without the fusion
        # breakage a global via2d switch causes (BENCH_KERNELS.md)
        ca = ConvBNAct(32, 3, conv3d_impl="via2d",
                       dtype=self.dtype)(patch_volume, train)
        ca = ConvBNAct(32, 3, act=None, conv3d_impl="via2d",
                       dtype=self.dtype)(ca, train)
        ca = HourglassAttn(32, dtype=self.dtype)(ca, train)
        ca = ConvBNAct(32, 3, dtype=self.dtype)(ca, train)
        # Conv3dFlex keeps nn.Conv's param layout ("Conv_0", lecun init)
        # while letting the lowering be A/B'd: via2d won 4.4× standalone on
        # this Co=1 shape but regressed end-to-end (fusion breakage) —
        # STTPU_ACV_CLS switches it for measurement.
        cls_impl = __import__("os").environ.get("STTPU_ACV_CLS", "native")
        att_weights = Conv3dFlex(
            1, (3, 3, 3), use_bias=False, impl=cls_impl,
            kernel_init=nn.initializers.lecun_normal(), dtype=self.dtype,
            name="Conv_0")(ca)  # [B, D, H/4, W/4, 1]
        if self.freeze_attn_weights:
            att_weights = jax.lax.stop_gradient(att_weights)

        def regress(cost_low):
            from stereo_toolbox_tpu.ops import upsample as _ups
            if not train and _ups.FUSED_EVAL_HEAD:
                # fused trilinear-upsample→softmax→soft-argmax: the
                # D-expanded full-res f32 volume never exists (ops/upsample)
                return ops.softargmax_trilinear(cost_low[..., 0],
                                                self.max_disp, H, W)
            c = ops.interpolate(cost_low[..., 0], (self.max_disp, H, W),
                                (1, 2, 3), align_corners=False)
            prob = jax.nn.softmax(c.astype(jnp.float32), axis=1)
            return ops.disparity_regression(prob, self.max_disp)

        if self.attn_weights_only:
            pred_attention = regress(att_weights)
            return [pred_attention] if train else pred_attention

        # ---- main branch: attention-filtered concat volume ------------
        cc0 = ConvBNAct(128, 3, dtype=self.dtype, name="concatconv_0")
        cc1 = nn.Conv(self.concat_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="concatconv_1")
        cl = cc1(cc0(fl, train))
        cr = cc1(cc0(fr, train))
        # ACVNet's variant keeps left features at every d (submodule.py:180-191)
        concat_volume = ops.build_concat_volume(cl, cr, d4, mask_left=False)
        # softmax over the disparity axis (acv.py:196, dim=2 in NCDHW)
        ac_volume = jax.nn.softmax(att_weights, axis=1) * concat_volume

        # via2d on these four stride-1 volume convs measured 423.7→410.3 ms
        # end-to-end at 1088×1920 (round 5); extending it to the classifier
        # convs (449.6) or the hourglass inner convs (466.7) REGRESSED.
        main_impl = __import__("os").environ.get("STTPU_ACV_MAIN", "via2d")
        c = ConvBNAct(32, 3, conv3d_impl=main_impl,
                      dtype=self.dtype)(ac_volume, train)
        c = ConvBNAct(32, 3, conv3d_impl=main_impl, dtype=self.dtype)(c,
                                                                      train)
        cost0 = c
        c = ConvBNAct(32, 3, conv3d_impl=main_impl,
                      dtype=self.dtype)(cost0, train)
        c = ConvBNAct(32, 3, act=None, conv3d_impl=main_impl,
                      dtype=self.dtype)(c, train)
        cost0 = c + cost0
        out1 = HourglassAttn(32, dtype=self.dtype)(cost0, train)
        out2 = HourglassAttn(32, dtype=self.dtype)(out1, train)

        def classify(x, name):
            x = ConvBNAct(32, 3, dtype=self.dtype,
                          name=f"{name}_conv")(x, train)
            return Conv3dFlex(1, (3, 3, 3), use_bias=False, impl=cls_impl,
                              kernel_init=nn.initializers.lecun_normal(),
                              dtype=self.dtype, name=f"{name}_out")(x)

        pred2 = regress(classify(out2, "classif2"))
        if not train:
            return pred2
        preds = [regress(classify(cost0, "classif0")),
                 regress(classify(out1, "classif1")), pred2]
        if not self.freeze_attn_weights:
            preds = [regress(att_weights)] + preds
        return preds
