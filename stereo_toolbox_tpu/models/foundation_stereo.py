"""FoundationStereo (CVPR'25) — hybrid EdgeNeXt-small CNN + frozen
DepthAnything(DINOv2) features, attentive cost volume, selective recurrent
refinement.

Faithful TPU-native rebuild of models/FoundationStereo/foundation_stereo.py
(round 5 — replaces the round-3 ConvNeXt approximation so published
checkpoints import and pixelwise parity holds):
  * `Feature` (extractor.py:321-369): timm `edgenext_small` stem+stages
    (conv blocks + SDTA split-transpose blocks with XCA cross-covariance
    attention, extractor/timm edgenext), Conv2x_IN deconv fusion, and the
    frozen DepthAnything side network whose `out` feature (features//2
    channels) is resized to 1/4 and concatenated;
  * combined volume: 8-group gwc + concat of `proj_cmb` 12-ch projections
    (foundation_stereo.py:240-247), `corr_stem` (1×1×1 → BasicConv →
    2× ResnetBasicBlock3D) to 28 channels, FeatureAtt, and the `hourglass`
    aggregation whose convs are "reduced" separable 3D convs
    (`Conv3dNormActReduced`, spatial 3×3 then 17-tap disparity conv) and
    whose input scale carries a disparity-axis transformer on the
    4×-pooled volume (`CostVolumeDisparityAttention`, submodule.py:506-530
    — `jax.nn.dot_product_attention` plays the flash-attn role);
  * `ContextNetDino` (extractor.py:188-280): ResNet trunk fused with the
    ViT feature, two output convs per scale → net/inp;
  * selective GRU updates with shared CAM/SAM gates and the conv0/conv1
    pre-mixers (update.py:101-165), `DispHead` with EdgeNeXt conv encoders
    (update.py:19-31), 0.25-scaled mask features;
  * cosine-normalized all-pairs correlation + 28-ch GEV lookup
    (geometry.py:16-79) inside one `nn.scan`;
  * `run_hierarchical` coarse-to-fine inference (foundation_stereo.py:
    295-311).

Inputs are consumed ImageNet-normalized as-is — the reference's
`normalize_image` is commented out (foundation_stereo.py:236-238), so no
de-normalization happens here either.

S (vits) / L (vitl) variants per the published cfg.yaml bundles
(11-33-40, 23-51-11): max_disp=416, hidden 128×3, corr_levels=2, radius 4.
Train → ``(init_disp, disp_preds)``; eval → final map.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.depth_anything_v2 import (PATCH,
                                                         DepthAnythingV2)
from stereo_toolbox_tpu.models.igev_stereo import combined_geo_lookup
from stereo_toolbox_tpu.models.selective import _cam_sam_context
from stereo_toolbox_tpu.nn.gru import pool2x
from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN, BasicConvIN
from stereo_toolbox_tpu.nn.layers import FeatureAtt
from stereo_toolbox_tpu.ops.corr import (band_d_max, band_offsets,
                                         build_corr_band_pyramid,
                                         build_corr_pyramid,
                                         build_volume_pyramid)

VIT_FEAT_DIM = {"vits": 32, "vitb": 64, "vitl": 128}  # features//2


def resize_keep_aspect_ratio(h: int, w: int, divider: int = 112,
                             max_hw: int = 1344) -> tuple[int, int]:
    """Static twin of Utils.get_resize_keep_aspect_ratio (divider =
    lcm(14, 16), extractor.py:346-349)."""
    def rnd(x):
        return int(math.ceil(x / divider) * divider)

    hr, wr = rnd(h), rnd(w)
    if hr > max_hw or wr > max_hw:
        if hr > wr:
            wr, hr = rnd(wr * max_hw / hr), max_hw
        else:
            hr, wr = rnd(hr * max_hw / wr), max_hw
    return hr, wr


# --------------------------------------------------------------------------
# EdgeNeXt-small trunk (timm edgenext.py topology, channels-last)
# --------------------------------------------------------------------------

class EdgeNeXtConvBlock(nn.Module):
    """timm edgenext ConvBlock: depthwise k×k → LN → MLP → γ, residual."""
    dim: int
    kernel: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        p = self.kernel // 2
        h = nn.Conv(self.dim, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), feature_group_count=self.dim,
                    dtype=self.dtype, name="conv_dw")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return shortcut + gamma.astype(h.dtype) * h


class XCA(nn.Module):
    """Cross-covariance attention (timm CrossCovarianceAttn): attention
    over the channel axis with L2-normalized q/k and a learned per-head
    temperature."""
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 4, 1)  # [3, B, heads, hd, N]
        q, k, v = qkv[0], qkv[1], qkv[2]
        qn = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-12).astype(q.dtype)
        kn = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-12).astype(k.dtype)
        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads, 1, 1))
        attn = jnp.einsum("bhcn,bhdn->bhcd", qn, kn,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * temp, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class PositionalEncodingFourier(nn.Module):
    """timm PositionalEncodingFourier: fixed sin/cos grid → 1×1 conv."""
    dim: int
    hidden_dim: int = 32
    temperature: float = 10000.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, b: int, h: int, w: int):
        eps, scale = 1e-6, 2 * math.pi
        y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + eps)
             * scale)[:, None]
        x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + eps)
             * scale)[None, :]
        dim_t = jnp.arange(self.hidden_dim, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.hidden_dim)
        px = jnp.broadcast_to(x[..., None], (h, w, self.hidden_dim)) / dim_t
        py = jnp.broadcast_to(y[..., None], (h, w, self.hidden_dim)) / dim_t
        px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                       axis=-1).reshape(h, w, self.hidden_dim)
        py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                       axis=-1).reshape(h, w, self.hidden_dim)
        pos = jnp.concatenate([py, px], axis=-1)[None]  # [1, H, W, 2*hid]
        pos = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                      name="token_projection")(pos.astype(self.dtype or
                                                          jnp.float32))
        return jnp.broadcast_to(pos, (b, h, w, self.dim))


class SplitTransposeBlock(nn.Module):
    """timm SplitTransposeBlock (the SDTA encoder): multi-scale depthwise
    convs on channel splits, XCA over tokens, MLP — all residual."""
    dim: int
    num_scales: int = 2
    num_heads: int = 8
    use_pos_emb: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        shortcut = x
        b, h, w, c = x.shape
        nconvs = max(1, self.num_scales - 1)
        # torch .chunk(n) split sizes: ceil(c/n) except a short tail
        width = -(-c // (nconvs + 1))
        sizes = [width] * nconvs + [c - width * nconvs]
        splits, off = [], 0
        for s in sizes:
            splits.append(x[..., off:off + s])
            off += s
        spo, sp = [], splits[0]
        for i in range(nconvs):
            if i > 0:
                sp = sp + splits[i]
            sp = nn.Conv(sp.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                         feature_group_count=sp.shape[-1], dtype=self.dtype,
                         name=f"convs{i}")(sp)
            spo.append(sp)
        spo.append(splits[-1])
        x = jnp.concatenate(spo, axis=-1)

        t = x.reshape(b, h * w, c)
        if self.use_pos_emb:
            pos = PositionalEncodingFourier(self.dim, dtype=self.dtype,
                                            name="pos_embd")(b, h, w)
            t = t + pos.reshape(b, h * w, c).astype(t.dtype)
        g_xca = self.param("gamma_xca", nn.initializers.constant(1e-6),
                           (self.dim,))
        t = t + g_xca.astype(t.dtype) * XCA(
            self.dim, self.num_heads, dtype=self.dtype, name="xca")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_xca")(t))
        t = t.reshape(b, h, w, c)
        ff = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(t)
        ff = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(ff)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(ff)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return shortcut + gamma.astype(ff.dtype) * ff


class EdgeNeXtTrunk(nn.Module):
    """edgenext_small stem + 4 stages → pyramid [1/4, 1/8, 1/16, 1/32]
    (channels 48/96/160/304). Names mirror timm's state dict."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dims = (48, 96, 160, 304)
        depths = (3, 3, 9, 3)
        globals_ = (0, 1, 1, 1)
        kernels = (3, 5, 7, 9)
        scales = (2, 2, 3, 4)
        pos = (False, True, False, False)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem1")(x)
        outs = []
        for s in range(4):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"stage{s}_dsnorm")(x)
                x = nn.Conv(dims[s], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"stage{s}_dsconv")(x)
            for i in range(depths[s]):
                if i < depths[s] - globals_[s]:
                    x = EdgeNeXtConvBlock(dims[s], kernels[s],
                                          dtype=self.dtype,
                                          name=f"stage{s}_block{i}")(x)
                else:
                    x = SplitTransposeBlock(dims[s], scales[s], 8,
                                            use_pos_emb=pos[s],
                                            dtype=self.dtype,
                                            name=f"stage{s}_block{i}")(x)
            outs.append(x)
        return outs


# --------------------------------------------------------------------------
# Shared conv blocks (reference submodule.py / extractor.py variants)
# --------------------------------------------------------------------------

class ResnetBlock(nn.Module):
    """submodule.py ResnetBasicBlock(3D): bias-free convs + norm, ReLU
    (`instance_norm` swaps BN→IN as Conv2x_IN's conv2 does)."""
    features: int
    instance_norm: bool = False
    # 'via2d' halves the HBM cost of 3³ convs on narrow-channel volumes
    # (XLA pads C=28 to 128 lanes in the native layout) — see BasicConvBN
    conv3d_impl: str = "native"
    dtype: jnp.dtype | None = None

    def _norm(self, x, train, name):
        if self.instance_norm:
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5, dtype=self.dtype,
                                name=name)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name=name)(x)

    def _conv(self, x, name):
        n = x.ndim - 2
        if n == 3 and self.conv3d_impl != "native":
            from stereo_toolbox_tpu.nn.layers import Conv3dFlex
            return Conv3dFlex(self.features, (3,) * n, (1,) * n, (1,) * n,
                              impl=self.conv3d_impl, use_bias=False,
                              kernel_init=nn.initializers.lecun_normal(),
                              dtype=self.dtype, name=name)(x)
        return nn.Conv(self.features, (3,) * n, padding=((1, 1),) * n,
                       use_bias=False, dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = self._conv(x, "conv1")
        y = nn.relu(self._norm(y, train, "bn1"))
        y = self._conv(y, "conv2")
        y = self._norm(y, train, "bn2")
        return nn.relu(x + y)


class ResidualBlockExt(nn.Module):
    """extractor.py ResidualBlock: bias-ful convs, norm_fn batch/instance,
    optional 1×1 downsample."""
    features: int
    stride: int = 1
    norm: str = "batch"  # 'batch' | 'instance'
    dtype: jnp.dtype | None = None

    def _norm(self, x, train, name):
        if self.norm == "instance":
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5, dtype=self.dtype,
                                name=name)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (self.stride, self.stride)
        y = nn.Conv(self.features, (3, 3), strides=s,
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm(y, train, "norm1"))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        # NB: the reference relu's the branch BEFORE the residual add
        # (extractor.py:70-77) — unlike the textbook pre-add identity
        y = nn.relu(self._norm(y, train, "norm2"))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=s, dtype=self.dtype,
                        name="downsample")(x)
            x = self._norm(x, train, "norm3")
        return nn.relu(x + y)


class Conv2xINRes(nn.Module):
    """submodule.py Conv2x_IN (deconv+concat form): BasicConv_IN 4×4/2 up,
    concat skip, ResnetBasicBlock(InstanceNorm) out."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, rem):
        x = BasicConvIN(self.features, 4, 2, deconv=True, dtype=self.dtype,
                        name="conv1")(x)
        if x.shape[1:-1] != rem.shape[1:-1]:
            x = ops.interpolate(x, rem.shape[1:-1], (1, 2),
                                align_corners=False)
        x = jnp.concatenate([x, rem], axis=-1)
        return ResnetBlock(self.features * 2, instance_norm=True,
                           dtype=self.dtype, name="conv2")(x)


class Conv3dNormActReduced(nn.Module):
    """Separable volume conv: spatial (1,3,3) then disparity (kd,1,1),
    both bias-ful + BN + ReLU (submodule.py:89-114)."""
    features: int
    kernel_disp: int = 17
    # spatial (1,3,3) lowering: 'via2d' (= one plain 2D conv with D folded
    # into batch) measured 5.1 vs 19.4 ms native at 104×184×320×28 — the
    # native 3D path pays the 128-lane channel padding. The (kd,1,1)
    # disparity conv stays native (via2d loses there: 75 vs 19 ms).
    conv3d_impl: str = "native"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv3d_impl != "native":
            from stereo_toolbox_tpu.nn.layers import Conv3dFlex
            h = Conv3dFlex(self.features, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                           impl=self.conv3d_impl, use_bias=True,
                           kernel_init=nn.initializers.lecun_normal(),
                           dtype=self.dtype, name="conv1")(x)
        else:
            h = nn.Conv(self.features, (1, 3, 3),
                        padding=((0, 0), (1, 1), (1, 1)), dtype=self.dtype,
                        name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        kd = self.kernel_disp
        nvox = h.shape[1] * h.shape[2] * h.shape[3]
        if self.conv3d_impl != "native" and nvox >= 2_000_000:
            from stereo_toolbox_tpu.nn.layers import Conv3dFlex
            h = Conv3dFlex(self.features, (kd, 1, 1), (1, 1, 1),
                           (kd // 2, 0, 0), impl="d2d", use_bias=True,
                           kernel_init=nn.initializers.lecun_normal(),
                           dtype=self.dtype, name="conv2")(h)
        else:
            h = nn.Conv(self.features, (kd, 1, 1),
                        padding=((kd // 2, kd // 2), (0, 0), (0, 0)),
                        dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(h)
        return nn.relu(h)


class CostVolumeDisparityAttention(nn.Module):
    """Post-norm transformer along the disparity axis with fixed sinusoidal
    positions (submodule.py:472-530). d_model=28, 4 heads, ffw=28,
    4 layers, max_len = max_disp//16."""
    d_model: int = 28
    nhead: int = 4
    num_layers: int = 4
    max_len: int = 26
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # [B, D, H, W, C]
        b, d, h, w, c = x.shape
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, d, c)
        # PositionalEmbedding (submodule.py:472-503)
        pos = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div = jnp.exp(jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
                      * -(math.log(10000.0) / self.d_model))[None]
        pe = jnp.zeros((self.max_len, self.d_model), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        seq = seq + pe[None, :d].astype(seq.dtype)

        from stereo_toolbox_tpu.nn.gru import Conv2dParams
        hd = c // self.nhead
        for i in range(self.num_layers):
            # q/k/v in one matmul (same input; with d_model=28 three
            # separate Dense calls each waste 100/128 MXU lanes). Param
            # paths are unchanged — Conv2dParams with an empty kernel
            # window registers exactly nn.Dense's {kernel, bias}.
            kp, bp = zip(*(Conv2dParams(c, (), name=f"sa{i}_{nm}")(c)
                           for nm in "qkv"))
            seq_, kcat, bcat = nn.dtypes.promote_dtype(
                seq, jnp.concatenate(kp, -1), jnp.concatenate(bp),
                dtype=self.dtype)
            qkv = seq_ @ kcat + bcat
            q, k, v = (qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:])
            shp = (b * h * w, d, self.nhead, hd)
            a = jax.nn.dot_product_attention(q.reshape(shp), k.reshape(shp),
                                             v.reshape(shp))
            a = nn.Dense(c, dtype=self.dtype, name=f"sa{i}_out")(
                a.reshape(b * h * w, d, c))
            seq = nn.LayerNorm(dtype=self.dtype, name=f"sa{i}_norm1")(
                seq + a)
            f = nn.Dense(c, dtype=self.dtype, name=f"sa{i}_lin1")(seq)
            f = nn.gelu(f, approximate=False)
            f = nn.Dense(c, dtype=self.dtype, name=f"sa{i}_lin2")(f)
            seq = nn.LayerNorm(dtype=self.dtype, name=f"sa{i}_norm2")(
                seq + f)
        return seq.reshape(b, h, w, d, c).transpose(0, 3, 1, 2, 4)


class FSHourglass(nn.Module):
    """hourglass with reduced convs + disparity attention on the 4×-pooled
    volume (foundation_stereo.py:46-126)."""
    features: int = 28
    max_disp: int = 416
    conv3d_impl: str = "native"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, features, train: bool = False):
        f, dt, im = self.features, self.dtype, self.conv3d_impl
        c1 = BasicConvBN(f * 2, 3, 2, conv3d_impl=im, dtype=dt,
                         name="conv1_0")(x, train)
        c1 = Conv3dNormActReduced(f * 2, conv3d_impl=im, dtype=dt,
                                  name="conv1_1")(c1, train)
        c1 = FeatureAtt(f * 2, dtype=dt,
                        name="feature_att_8")(c1, features[1], train)
        c2 = BasicConvBN(f * 4, 3, 2, conv3d_impl=im, dtype=dt,
                         name="conv2_0")(c1, train)
        c2 = Conv3dNormActReduced(f * 4, conv3d_impl=im, dtype=dt,
                                  name="conv2_1")(c2, train)
        c2 = FeatureAtt(f * 4, dtype=dt,
                        name="feature_att_16")(c2, features[2], train)
        c3 = BasicConvBN(f * 6, 3, 2, conv3d_impl=im, dtype=dt,
                         name="conv3_0")(c2, train)
        c3 = Conv3dNormActReduced(f * 6, conv3d_impl=im, dtype=dt,
                                  name="conv3_1")(c3, train)
        c3 = FeatureAtt(f * 6, dtype=dt,
                        name="feature_att_32")(c3, features[3], train)

        c3u = BasicConvBN(f * 4, 4, 2, deconv=True, dtype=dt,
                          name="conv3_up")(c3, train)
        c2 = jnp.concatenate([c3u, c2], axis=-1)
        c2 = BasicConvBN(f * 4, 1, 1, dtype=dt, name="agg_0_0")(c2, train)
        c2 = Conv3dNormActReduced(f * 4, conv3d_impl=im, dtype=dt,
                                  name="agg_0_1")(c2, train)
        c2 = Conv3dNormActReduced(f * 4, conv3d_impl=im, dtype=dt,
                                  name="agg_0_2")(c2, train)
        c2 = FeatureAtt(f * 4, dtype=dt,
                        name="feature_att_up_16")(c2, features[2], train)
        c2u = BasicConvBN(f * 2, 4, 2, deconv=True, dtype=dt,
                          name="conv2_up")(c2, train)
        c1 = jnp.concatenate([c2u, c1], axis=-1)
        c1 = BasicConvBN(f * 2, 1, 1, dtype=dt, name="agg_1_0")(c1, train)
        c1 = Conv3dNormActReduced(f * 2, conv3d_impl=im, dtype=dt,
                                  name="agg_1_1")(c1, train)
        c1 = Conv3dNormActReduced(f * 2, conv3d_impl=im, dtype=dt,
                                  name="agg_1_2")(c1, train)
        c1 = FeatureAtt(f * 2, dtype=dt,
                        name="feature_att_up_8")(c1, features[1], train)
        conv = BasicConvBN(f, 4, 2, deconv=True, dtype=dt,
                           name="conv1_up")(c1, train)

        patch = nn.Conv(f, (4, 4, 4), strides=(4, 4, 4), padding="VALID",
                        feature_group_count=f, dtype=dt,
                        name="conv_patch_0")(x)
        patch = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt,
                             name="conv_patch_1")(patch)
        patch = CostVolumeDisparityAttention(
            f, 4, 4, max_len=self.max_disp // 16, dtype=dt,
            name="att4")(patch)
        patch = ops.interpolate(patch, conv.shape[1:4], (1, 2, 3),
                                align_corners=False)
        conv = conv + patch
        conv = Conv3dNormActReduced(f, conv3d_impl=im, dtype=dt,
                                    name="conv_out_0")(conv, train)
        return Conv3dNormActReduced(f, conv3d_impl=im, dtype=dt,
                                    name="conv_out_1")(conv, train)


class FSFeature(nn.Module):
    """Feature (extractor.py:321-369): EdgeNeXt trunk + deconv fusion +
    frozen DepthAnything side feature at 1/4."""
    vit_size: str = "vits"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, raw_x):
        # x: ImageNet-normalized [2B, H, W, 3]; raw_x = same (the reference
        # feeds the model input to both trunk and dino unchanged)
        b2, h, w, _ = x.shape
        hr, wr = resize_keep_aspect_ratio(h, w)
        dino_in = x if (hr, wr) == (h, w) else jax.image.resize(
            x, (b2, hr, wr, 3), method="cubic")
        dino = DepthAnythingV2(self.vit_size, dtype=self.dtype, name="dino")
        _, vfeats = dino(dino_in, return_features=True)
        vit_feat = jax.lax.stop_gradient(vfeats["out"])
        vit_feat = ops.interpolate(vit_feat.astype(x.dtype),
                                   (h // 4, w // 4), (1, 2),
                                   align_corners=True)

        x4, x8, x16, x32 = EdgeNeXtTrunk(dtype=self.dtype,
                                         name="edgenext")(x)
        x16 = Conv2xINRes(160, dtype=self.dtype,
                          name="deconv32_16")(x32, x16)   # 320
        x8 = Conv2xINRes(96, dtype=self.dtype,
                         name="deconv16_8")(x16, x8)      # 192
        x4 = Conv2xINRes(48, dtype=self.dtype,
                         name="deconv8_4")(x8, x4)        # 96
        x4 = jnp.concatenate([x4, vit_feat], axis=-1)
        c = x4.shape[-1]
        x4 = BasicConvIN(c, 3, 1, dtype=self.dtype, name="conv4_0")(x4)
        x4 = ResidualBlockExt(c, norm="instance", dtype=self.dtype,
                              name="conv4_1")(x4)
        x4 = ResidualBlockExt(c, norm="instance", dtype=self.dtype,
                              name="conv4_2")(x4)
        return [x4, x8, x16, x32], vit_feat


class ContextNetDino(nn.Module):
    """extractor.py:188-280 — ResNet context encoder fused with the ViT
    feature; two output convs per scale (net, inp)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, vit_feat, train: bool = False):
        dt = self.dtype
        # downsample = n_downsample = 2 → conv1 stride 1, layer2/layer3
        # stride 2 (extractor.py:102,106-108): context at 1/4, 1/8, 1/16
        x = nn.Conv(64, (7, 7), strides=(1, 1), padding=((3, 3), (3, 3)),
                    dtype=dt, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="norm1")(x)
        x = nn.relu(x)

        def layer(x, feats, stride, name):
            x = ResidualBlockExt(feats, stride, dtype=dt,
                                 name=f"{name}_0")(x, train)
            return ResidualBlockExt(feats, 1, dtype=dt,
                                    name=f"{name}_1")(x, train)

        x = layer(x, 64, 1, "layer1")
        x = layer(x, 96, 2, "layer2")
        x = layer(x, 128, 2, "layer3")
        x = jnp.concatenate([x, vit_feat.astype(x.dtype)], axis=-1)
        x = BasicConvBN(128, 3, 1, dtype=dt, name="conv2")(x, train)

        def heads(x, name, with_res=True):
            outs = []
            for j in range(2):
                y = x
                if with_res:
                    y = ResidualBlockExt(128, 1, dtype=dt,
                                         name=f"{name}_{j}_res")(y, train)
                outs.append(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                                    dtype=dt, name=f"{name}_{j}_out")(y))
            return tuple(outs)

        o04 = heads(x, "outputs04")
        y = layer(x, 128, 2, "layer4")
        o08 = heads(y, "outputs08")
        z = layer(y, 128, 2, "layer5")
        o16 = heads(z, "outputs16", with_res=False)
        return [o04, o08, o16]


class EdgeNextConvEncoder(nn.Module):
    """submodule.py:565-600 (norm=None variant used by DispHead)."""
    dim: int
    kernel: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        h = nn.Conv(self.dim, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + gamma.astype(h.dtype) * h


class FSMotionEncoder(nn.Module):
    """BasicMotionEncoder (update.py:50-70), cor_planes = levels·9·29."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp, corr):
        dt = self.dtype
        c = nn.relu(nn.Conv(256, (1, 1), dtype=dt, name="convc1")(corr))
        c = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="convc2")(c))
        d = nn.relu(nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)), dtype=dt,
                            name="convd1")(disp))
        d = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="convd2")(d))
        out = nn.relu(nn.Conv(127, (3, 3), padding=((1, 1), (1, 1)),
                              dtype=dt, name="conv")(
            jnp.concatenate([c, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)


class FSRaftGRU(nn.Module):
    hidden_dim: int
    kernel: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, x, hx):
        from stereo_toolbox_tpu.nn.gru import Conv2dParams, fused_gate_conv
        k, p = (self.kernel,) * 2, ((self.kernel // 2,) * 2,) * 2
        z, r = fused_gate_conv(
            hx, [Conv2dParams(self.hidden_dim, k, name="convz"),
                 Conv2dParams(self.hidden_dim, k, name="convr")],
            dtype=self.dtype)
        z = jax.nn.sigmoid(z)
        r = jax.nn.sigmoid(r)
        q = jnp.tanh(nn.Conv(self.hidden_dim, k, padding=p,
                             dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class FSSelectiveGRU(nn.Module):
    """SelectiveConvGRU with conv0/conv1 pre-mixers (update.py:101-122)."""
    hidden_dim: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, att, h, *xs):
        x = jnp.concatenate(xs, axis=-1)
        x = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv0")(x))
        hx = jnp.concatenate([x, h], axis=-1)
        hx = nn.relu(nn.Conv(hx.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name="conv1")(hx))
        small = FSRaftGRU(self.hidden_dim, 1, dtype=self.dtype,
                          name="small_gru")(h, x, hx)
        large = FSRaftGRU(self.hidden_dim, 3, dtype=self.dtype,
                          name="large_gru")(h, x, hx)
        return small * att + large * (1 - att)


class FSUpdateBlock(nn.Module):
    """BasicSelectiveMultiUpdateBlock (update.py:125-165)."""
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, nets, inps, atts, corr, disp):
        dt = self.dtype
        net04, net08, net16 = nets
        inp04, inp08, inp16 = inps
        att04, att08, att16 = atts
        if self.n_gru_layers == 3:
            net16 = FSSelectiveGRU(self.hidden_dims[0], dtype=dt,
                                   name="gru16")(att16, net16, inp16,
                                                 pool2x(net08))
        if self.n_gru_layers >= 2:
            xs = [inp08, pool2x(net04)]
            if self.n_gru_layers > 2:
                xs.append(ops.interpolate(net16, net08.shape[1:3], (1, 2),
                                          align_corners=True))
            net08 = FSSelectiveGRU(self.hidden_dims[1], dtype=dt,
                                   name="gru08")(att08, net08, *xs)
        motion = FSMotionEncoder(dtype=dt, name="encoder")(disp, corr)
        motion = jnp.concatenate([inp04, motion], axis=-1)
        xs = [motion]
        if self.n_gru_layers > 1:
            xs.append(ops.interpolate(net08, net04.shape[1:3], (1, 2),
                                      align_corners=True))
        net04 = FSSelectiveGRU(self.hidden_dims[2], dtype=dt,
                               name="gru04")(att04, net04, *xs)

        d = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="disp_head_0")(net04))
        d = EdgeNextConvEncoder(128, dtype=dt, name="disp_head_2")(d)
        d = EdgeNextConvEncoder(128, dtype=dt, name="disp_head_3")(d)
        delta = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                        name="disp_head_4")(d)
        m = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="mask_0")(net04))
        mask_feat = 0.25 * nn.relu(nn.Conv(32, (3, 3),
                                           padding=((1, 1), (1, 1)),
                                           dtype=dt, name="mask_2")(m))
        return (net04, net08, net16), mask_feat, delta


class _FSStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    band_offs: tuple = ()  # static — () selects the full-pyramid lookup
    # eval: upsample only the emitted (last) iteration
    # (foundation_stereo.py:279-280)
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, geo_pyr, corr_pyr, inps, atts, x0,
                 stem_2x):
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        geo_feat = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                       self.corr_radius, self.band_offs)
        nets, mask_feat, delta = FSUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block")(nets, inps, atts,
                                 geo_feat.astype(stem_2x.dtype),
                                 disp[..., None].astype(stem_2x.dtype))
        disp = disp + delta[..., 0].astype(disp.dtype)

        # spx_2_gru = Conv2x(32, 32, deconv, bn=False) + spx_gru deconv→9
        up1 = BasicConvBN(32, 4, 2, deconv=True, norm=False,
                          dtype=self.dtype, name="spx_2_gru_conv1")
        up2 = BasicConvBN(64, 3, 1, norm=False, dtype=self.dtype,
                          name="spx_2_gru_conv2")
        spxc = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="spx_gru")

        def upsample(mask_feat, stem_2x, disp):
            x = up1(mask_feat, False)
            if x.shape[1:-1] != stem_2x.shape[1:-1]:
                x = ops.interpolate(x, stem_2x.shape[1:-1], (1, 2),
                                    align_corners=False)
            x = up2(jnp.concatenate([x, stem_2x], axis=-1), False)
            spx = jax.nn.softmax(spxc(x).astype(jnp.float32), axis=-1)
            return ops.context_upsample(disp.astype(jnp.float32) * 4.0, spx)

        if not self.skip_unemitted:
            disp_up = upsample(mask_feat, stem_2x, disp)
        else:
            # params pinned by an unconditional tiny call (see igev_stereo)
            tiny = upsample(mask_feat[:, :2, :2], stem_2x[:, :4, :4],
                            disp[:, :2, :2])
            zero_full = jnp.zeros(
                disp.shape[:1] + (disp.shape[1] * 4, disp.shape[2] * 4),
                tiny.dtype) + 0.0 * tiny.mean()
            disp_up = jax.lax.cond(
                emit, lambda m, s, d: upsample(m, s, d),
                lambda m, s, d: zero_full, mask_feat, stem_2x, disp)
        return (nets, disp), disp_up


class FoundationStereo(nn.Module):
    vit_size: str = "vits"
    max_disp: int = 416
    cv_group: int = 8
    volume_dim: int = 28
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 2
    corr_radius: int = 4
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    # 'banded' caps corr lookups at max_disp + band_margin; the
    # reference pyramid is all-pairs — use 'reg' for uncapped parity
    corr_impl: str = "banded"
    band_margin: int = 32
    # volume-conv lowering for the corr_stem / classifier / hourglass 3D
    # convs ('native' | 'via2d'); via2d sidesteps the 128-lane channel
    # padding of the C=28 volume (2-4× per conv at 736×1280) and is exact
    # up to float reassociation. Param trees are impl-invariant.
    conv3d_impl: str = "via2d"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None, init_disp=None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        b, h, w, _ = left.shape
        h4, w4 = h // 4, w // 4
        dt = self.dtype
        # the reference consumes ImageNet-normalized input unchanged
        # (normalize_image is commented out, foundation_stereo.py:236-238)
        both = jnp.concatenate([left, right], 0)

        feats, vit_feat = FSFeature(self.vit_size, dtype=dt,
                                    name="feature")(both, both)
        fl = [f[:b] for f in feats]
        fr0 = feats[0][b:]
        vit_feat = vit_feat[:b]

        # stem_2 (foundation_stereo.py:167-172): BasicConv_IN s2 + conv +
        # IN + plain ReLU
        s2 = BasicConvIN(32, 3, 2, dtype=dt, name="stem_2_0")(left)
        s2 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=dt, name="stem_2_1")(s2)
        s2 = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                          use_scale=False, epsilon=1e-5, dtype=dt,
                          name="stem_2_2")(s2)
        stem_2x = nn.relu(s2)

        d4 = self.max_disp // 4
        # per-group COSINE correlation (submodule.py:388-397 normalizes
        # each group's channels before the dot product)
        gwc = ops.build_gwc_volume_cosine(fl[0], fr0, d4, self.cv_group)
        proj = nn.Conv(12, (1, 1), dtype=dt, name="proj_cmb")
        c3im = self.conv3d_impl
        if c3im != "native":
            # corr_stem_0 (1×1×1 over concat([gwc, concat_volume])) is
            # linear — factorize it so the 2C-channel concat volume is
            # never materialized (ops.pointwise_conv_gwc_concat); exact up
            # to float reassociation, params identical to the nn.Conv
            from stereo_toolbox_tpu.nn.layers import Conv3dFlex
            kern, kbias = Conv3dFlex(
                self.volume_dim, (1, 1, 1), use_bias=True,
                kernel_init=nn.initializers.lecun_normal(), dtype=dt,
                name="corr_stem_0")(
                jnp.zeros((1, 1, 1, 1,
                           self.cv_group + 24), dt or jnp.float32),
                raw=True)
            pl, pr, kern, kbias = nn.dtypes.promote_dtype(
                proj(fl[0]), proj(fr0), kern, kbias, dtype=dt)
            comb = ops.pointwise_conv_gwc_concat(
                gwc.astype(pl.dtype), pl, pr, kern, kbias)
        else:
            # FoundationStereo keeps left features at every d
            # (submodule.py:416-427)
            cvol = ops.build_concat_volume(proj(fl[0]), proj(fr0), d4,
                                           mask_left=False)
            comb = jnp.concatenate([gwc, cvol], -1)
            comb = nn.Conv(self.volume_dim, (1, 1, 1), dtype=dt,
                           name="corr_stem_0")(comb)
        comb = BasicConvBN(self.volume_dim, 3, 1, conv3d_impl=c3im, dtype=dt,
                           name="corr_stem_1")(comb, train)
        comb = ResnetBlock(self.volume_dim, conv3d_impl=c3im, dtype=dt,
                           name="corr_stem_2")(comb, train)
        comb = ResnetBlock(self.volume_dim, conv3d_impl=c3im, dtype=dt,
                           name="corr_stem_3")(comb, train)
        comb = FeatureAtt(self.volume_dim, dtype=dt,
                          name="corr_feature_att")(comb, fl[0], train)
        gev = FSHourglass(self.volume_dim, self.max_disp,
                          conv3d_impl=c3im, dtype=dt,
                          name="cost_agg")(comb, fl, train)

        cls = BasicConvBN(self.volume_dim // 2, 3, 1, conv3d_impl=c3im,
                          dtype=dt, name="classifier_0")(gev, train)
        cls = ResnetBlock(self.volume_dim // 2, conv3d_impl=c3im, dtype=dt,
                          name="classifier_1")(cls, train)
        # the 7^3 Co=1 head runs at 0.37 TF/s on XLA's native conv
        # (157 ms at 736x1280); the kd-folded via2d lowering computes the
        # 7 kd-taps as 2D-conv output channels instead (param-compatible)
        from stereo_toolbox_tpu.nn.layers import Conv3dFlex
        cls = Conv3dFlex(1, (7, 7, 7), padding=(3, 3, 3), use_bias=True,
                         impl=__import__("os").environ.get(
                             "STTPU_FS_CLS", "via2d"),
                         kernel_init=nn.initializers.lecun_normal(),
                         dtype=dt, name="classifier_2")(cls)
        prob = jax.nn.softmax(cls[..., 0].astype(jnp.float32), 1)
        if init_disp is None:
            init_disp = ops.disparity_regression(prob, d4)

        cnet_out = ContextNetDino(dtype=dt, name="cnet")(
            left, ops.interpolate(vit_feat, (h4, w4), (1, 2),
                                  align_corners=True)
            if vit_feat.shape[1:3] != (h4, w4) else vit_feat, train)
        nets, inps, atts = _cam_sam_context(cnet_out, dt)

        # Lookup pyramids stay in the model dtype: bf16 halves the HBM
        # traffic of the per-iteration hat contractions (the scan's single
        # hottest op at 736×1280 — 8.6 → 3.5 ms/iter) while positions and
        # weight construction remain f32 (ops/sampling.py). dtype=None keeps
        # the exact f32 path parity tests and goldens run on.
        lkdt = dt or jnp.float32
        geo_vol = jnp.moveaxis(gev, 1, 3).astype(lkdt)
        geo_pyr = tuple(build_volume_pyramid(geo_vol, self.corr_levels))
        # cosine (L2-normalized) correlation — geometry.py:66-79
        fln = fl[0].astype(jnp.float32)
        fln = fln / (jnp.linalg.norm(fln, axis=-1, keepdims=True) + 1e-12)
        frn = fr0.astype(jnp.float32)
        frn = frn / (jnp.linalg.norm(frn, axis=-1, keepdims=True) + 1e-12)
        band_offs = ()
        if self.corr_impl == "banded":
            # eval: capped at max_disp + margin; train: full width (the
            # cap degrades optimization — see igev_stereo)
            db = band_d_max(None if train else d4, fl[0].shape[2])
            m4 = max(self.band_margin // 4, 1)
            band_offs = band_offsets(self.corr_levels, db,
                                     self.corr_radius, m4)
            corr_pyr = build_corr_band_pyramid(
                fln.astype(lkdt), frn.astype(lkdt), self.corr_levels, db,
                self.corr_radius, m4, normalize=False)
            corr_pyr = tuple(c.astype(lkdt) for c in corr_pyr)
        else:
            corr = jnp.einsum("bhic,bhjc->bhij", fln, frn)
            corr_pyr = tuple(build_corr_pyramid(corr, self.corr_levels))
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))

        emit = jnp.ones((iters,), bool) if train else \
            jnp.arange(iters) == iters - 1
        step = nn.scan(
            _FSStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 6,
            out_axes=0, length=iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          band_offs=band_offs, skip_unemitted=not train, dtype=dt,
          name="step")
        (nets, disp), ups = step((nets, init_disp.astype(jnp.float32)),
                                 emit, geo_pyr, corr_pyr, inps, atts, x0,
                                 stem_2x)

        if not train:
            return ups[-1]
        return init_disp, [ups[i] for i in range(iters)]


def run_hierarchical(model, variables, left, right, iters: int = 12,
                     small_ratio: float = 0.5):
    """Coarse-to-fine inference for high resolution
    (foundation_stereo.py:295-311): a half-resolution pass seeds the
    full-resolution init disparity."""
    b, h, w, _ = left.shape
    hs = int(h * small_ratio) // 32 * 32
    ws = int(w * small_ratio) // 32 * 32
    l_s = ops.interpolate(left, (hs, ws), (1, 2), align_corners=False)
    r_s = ops.interpolate(right, (hs, ws), (1, 2), align_corners=False)
    disp_s = model.apply(variables, l_s, r_s, train=False,
                         mutable=["batch_stats"])[0]
    disp_up = jnp.clip(
        ops.interpolate(disp_s, (h, w), (1, 2), align_corners=True)
        * (w / ws), 0, None)
    init = ops.interpolate(disp_up, (h // 4, w // 4), (1, 2),
                           align_corners=True) * 0.25
    return model.apply(variables, left, right, train=False, iters=iters,
                       init_disp=init, mutable=["batch_stats"])[0]


def FoundationStereo_S(**kw) -> FoundationStereo:
    return FoundationStereo(vit_size="vits", **kw)


def FoundationStereo_L(**kw) -> FoundationStereo:
    return FoundationStereo(vit_size="vitl", **kw)
