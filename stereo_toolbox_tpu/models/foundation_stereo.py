"""FoundationStereo (CVPR'25) — hybrid CNN + ViT features, attentive cost
volume, selective recurrent refinement.

TPU-native re-design of models/FoundationStereo/foundation_stereo.py:
  * Feature: EdgeNeXt-small-style conv trunk (channels 48/96/160/304 at
    1/4..1/32; the timm backbone is approximated with ConvNeXt-style blocks
    since pretrained weights are unavailable offline) + a frozen
    DepthAnythingV2 side network whose features are resized to 1/4 and fused
    (extractor.py:321-369);
  * 8-group gwc + projected concat combined volume (foundation_stereo.py:
    243-248) → corr stem → FeatureAtt → hourglass whose convolutions are
    "reduced" separable 3D convs (spatial 3×3 + long 17-tap disparity conv,
    `Conv3dNormActReduced`) and whose bottom carries a disparity-axis
    transformer on a 4×-pooled volume (`CostVolumeDisparityAttention`,
    submodule.py:506-530 — `jax.nn.dot_product_attention` replaces
    flash-attn);
  * GEV + all-pairs lookup with CAM/SAM selective GRU updates
    (foundation_stereo.py:262-264, shared with SelectiveIGEV);
  * `run_hierarchical`: coarse pass at `small_ratio` seeds the full-res
    init disparity (foundation_stereo.py:295-311).

S/L variants by `vit_size` ∈ {'vits', 'vitl'}. Train →
``(init_disp, disp_preds)``; eval → final map.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.depth_anything_v2 import (PATCH,
                                                         DepthAnythingV2)
from stereo_toolbox_tpu.models.igev_stereo import combined_geo_lookup
from stereo_toolbox_tpu.models.raft_stereo import IMAGENET_MEAN, IMAGENET_STD
from stereo_toolbox_tpu.models.selective import (SelectiveUpdateBlock,
                                                 _cam_sam_context)
from stereo_toolbox_tpu.nn.igev_blocks import (BasicConvBN, BasicConvIN,
                                               Conv2x)
from stereo_toolbox_tpu.nn.layers import FeatureAtt
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         band_offsets,
                                         build_corr_band_pyramid,
                                         build_corr_pyramid,
                                         build_volume_pyramid)


class ConvNeXtBlock(nn.Module):
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (7, 7), padding="SAME",
                    feature_group_count=self.features, dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.Dense(4 * self.features, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.features, dtype=self.dtype)(h)
        return x + h


class EdgeTrunk(nn.Module):
    """EdgeNeXt-small-shaped trunk: stem /4, stages at /4,/8,/16,/32 with
    channels (48, 96, 160, 304)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        chans = (48, 96, 160, 304)
        depths = (3, 3, 9, 3)
        x = nn.Conv(chans[0], (4, 4), strides=(4, 4), dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        outs = []
        for i, (c, d) in enumerate(zip(chans, depths)):
            if i > 0:
                x = nn.LayerNorm(dtype=self.dtype)(x)
                x = nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
            for _ in range(d):
                x = ConvNeXtBlock(c, dtype=self.dtype)(x)
            outs.append(x)
        return outs  # [x4, x8, x16, x32]


class Conv3dNormActReduced(nn.Module):
    """Separable volume conv: spatial (1,3,3) then disparity (k_disp,1,1)
    (FoundationStereo submodule `Conv3dNormActReduced`)."""
    features: int
    kernel_disp: int = 17
    strides: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (self.strides,) * 3
        h = nn.Conv(self.features, (1, 3, 3), strides=s, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (self.kernel_disp, 1, 1), padding="SAME",
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        return nn.relu(h)


class CostVolumeDisparityAttention(nn.Module):
    """Transformer along the disparity axis (submodule.py:506-530)."""
    num_layers: int = 4
    num_heads: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # x: [B, D, H, W, C] → attention over D per pixel
        b, d, h, w, c = x.shape
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, d, c)
        for i in range(self.num_layers):
            a = nn.LayerNorm(dtype=self.dtype)(seq)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=c,
                dtype=self.dtype, name=f"attn{i}")(a, a)
            seq = seq + a
            f = nn.LayerNorm(dtype=self.dtype)(seq)
            f = nn.Dense(c, dtype=self.dtype)(nn.relu(
                nn.Dense(c, dtype=self.dtype)(f)))
            seq = seq + f
        return seq.reshape(b, h, w, d, c).transpose(0, 3, 1, 2, 4)


class FSHourglass(nn.Module):
    """Hourglass with reduced convs + disparity-axis attention at the input
    scale (foundation_stereo.py:46-126)."""
    features: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, features, train: bool = False):
        f = self.features
        dt = self.dtype
        c1 = BasicConvBN(f * 2, 3, 2, dtype=dt)(x, train)
        c1 = Conv3dNormActReduced(f * 2, dtype=dt)(c1, train)
        c1 = FeatureAtt(f * 2, dtype=dt)(c1, features[1], train)
        c2 = BasicConvBN(f * 4, 3, 2, dtype=dt)(c1, train)
        c2 = Conv3dNormActReduced(f * 4, dtype=dt)(c2, train)
        c2 = FeatureAtt(f * 4, dtype=dt)(c2, features[2], train)
        c3 = BasicConvBN(f * 6, 3, 2, dtype=dt)(c2, train)
        c3 = Conv3dNormActReduced(f * 6, dtype=dt)(c3, train)
        c3 = FeatureAtt(f * 6, dtype=dt)(c3, features[3], train)

        up2 = BasicConvBN(f * 4, 4, 2, deconv=True, dtype=dt)(c3, train)
        c2 = jnp.concatenate([up2, c2], -1)
        c2 = BasicConvBN(f * 4, 1, 1, dtype=dt)(c2, train)
        c2 = Conv3dNormActReduced(f * 4, dtype=dt)(c2, train)
        c2 = FeatureAtt(f * 4, dtype=dt)(c2, features[2], train)
        up1 = BasicConvBN(f * 2, 4, 2, deconv=True, dtype=dt)(c2, train)
        c1 = jnp.concatenate([up1, c1], -1)
        c1 = BasicConvBN(f * 2, 1, 1, dtype=dt)(c1, train)
        c1 = Conv3dNormActReduced(f * 2, dtype=dt)(c1, train)
        c1 = FeatureAtt(f * 2, dtype=dt)(c1, features[1], train)
        out = BasicConvBN(f, 4, 2, deconv=True, dtype=dt)(c1, train)

        # disparity-axis attention branch on the 4×-pooled input volume
        patch = nn.Conv(f, (4, 4, 4), strides=(4, 4, 4), padding="VALID",
                        feature_group_count=f, use_bias=False,
                        dtype=dt, name="conv_patch")(x)
        patch = nn.BatchNorm(use_running_average=not train, dtype=dt)(patch)
        patch = CostVolumeDisparityAttention(dtype=dt, name="att4")(patch)
        patch = ops.interpolate(patch, out.shape[1:4], (1, 2, 3),
                                align_corners=False)
        out = out + patch
        out = Conv3dNormActReduced(f, dtype=dt)(out, train)
        return Conv3dNormActReduced(f, dtype=dt)(out, train)


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
        nets, mask_feat, delta = SelectiveUpdateBlock(
            self.hidden_dims, self.n_gru_layers, "superpixel",
            dtype=self.dtype, name="update_block")(
                nets, inps, atts, geo_feat, disp[..., None])
        disp = disp + delta[..., 0].astype(disp.dtype)
        spx2 = Conv2x(32, deconv=True, dtype=self.dtype, name="spx_2_gru")
        spxc = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="spx_gru")

        def upsample(mask_feat, stem_2x, disp):
            spx = jax.nn.softmax(
                spxc(spx2(mask_feat, stem_2x)).astype(jnp.float32), axis=-1)
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
    max_disp: int = 192
    cv_group: int = 8
    volume_dim: int = 8
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 2
    corr_radius: int = 4
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    imagenet_norm_input: bool = True
    # disparity-banded relative corr volumes by default (ops/corr.py)
    corr_impl: str = "banded"
    band_margin: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None, init_disp=None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        b, h, w, _ = left.shape
        h4, w4 = h // 4, w // 4
        dt = self.dtype
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        if self.imagenet_norm_input:
            img1 = 2.0 * (left * std + mean) - 1.0
            img2 = 2.0 * (right * std + mean) - 1.0
        else:
            img1, img2 = left, right

        both = jnp.concatenate([img1, img2], 0)

        # CNN trunk + frozen ViT side features
        trunk = EdgeTrunk(dtype=dt, name="trunk")
        x4, x8, x16, x32 = trunk(both)
        rh = -(-h // PATCH) * PATCH
        rw = -(-w // PATCH) * PATCH
        danv2 = DepthAnythingV2(self.vit_size, dtype=dt, name="dino")
        both_in = jnp.concatenate([left, right], 0)
        _, vfeats = danv2(
            ops.interpolate(both_in, (rh, rw), (1, 2), align_corners=False),
            return_features=True)
        vit_feat = jax.lax.stop_gradient(vfeats["path_1"])
        vit_feat = ops.interpolate(vit_feat, (h4, w4), (1, 2),
                                   align_corners=True)
        vit_feat = nn.Conv(32, (1, 1), dtype=dt, name="vit_proj")(
            vit_feat.astype(x4.dtype))

        x16 = Conv2x(160, deconv=True, instance_norm=True, dtype=dt,
                     name="deconv32_16")(x32, x16)
        x8 = Conv2x(96, deconv=True, instance_norm=True, dtype=dt,
                    name="deconv16_8")(x16, x8)
        x4 = Conv2x(48, deconv=True, instance_norm=True, dtype=dt,
                    name="deconv8_4")(x8, x4)
        x4 = jnp.concatenate([x4, vit_feat], -1)
        x4 = BasicConvIN(x4.shape[-1], 3, 1, dtype=dt, name="conv4")(x4)

        fl = [x4[:b], x8[:b], x16[:b], x32[:b]]
        fr0 = x4[b:]
        stem_2a = BasicConvIN(32, 3, 2, dtype=dt, name="stem_2a")
        stem_2x = stem_2a(img1)

        d4 = self.max_disp // 4
        gwc = ops.build_gwc_volume(fl[0], fr0, d4, self.cv_group)
        proj = nn.Conv(12, (1, 1), use_bias=False, dtype=dt,
                       name="proj_cmb")
        # FoundationStereo keeps left features at every d (submodule.py:416-427)
        cvol = ops.build_concat_volume(proj(fl[0]), proj(fr0), d4,
                                       mask_left=False)
        comb = jnp.concatenate([gwc, cvol], -1)
        comb = BasicConvBN(self.volume_dim, 3, 1, dtype=dt,
                           name="corr_stem")(comb, train)
        comb = FeatureAtt(self.volume_dim, dtype=dt,
                          name="corr_feature_att")(comb, fl[0], train)
        gev = FSHourglass(self.volume_dim, dtype=dt,
                          name="cost_agg")(comb, fl, train)

        prob = jax.nn.softmax(
            nn.Conv(1, (3, 3, 3), use_bias=False, dtype=dt,
                    name="classifier")(gev)[..., 0].astype(jnp.float32), 1)
        if init_disp is None:
            init_disp = ops.disparity_regression(prob, d4)

        # context: trunk features + CAM/SAM
        c04 = nn.Conv(self.hidden_dims[2] * 2, (3, 3), padding="SAME",
                      dtype=dt, name="cnet4")(fl[0])
        c08 = nn.Conv(self.hidden_dims[1] * 2, (3, 3), padding="SAME",
                      dtype=dt, name="cnet8")(fl[1])
        c16 = nn.Conv(self.hidden_dims[0] * 2, (3, 3), padding="SAME",
                      dtype=dt, name="cnet16")(fl[2])
        cnet_out = [tuple(jnp.split(c, 2, axis=-1))
                    for c in (c04, c08, c16)]
        nets, inps, atts = _cam_sam_context(cnet_out, dt)

        gev32 = jnp.moveaxis(gev.astype(jnp.float32), 1, 3)
        geo_pyr = tuple(build_volume_pyramid(gev32, self.corr_levels))
        # IGEV-style corr is unnormalized (FoundationStereo/geometry.py:62-72)
        band_offs = ()
        if self.corr_impl == "banded":
            m4 = max(self.band_margin // 4, 1)
            band_offs = band_offsets(self.corr_levels, d4,
                                     self.corr_radius, m4)
            corr_pyr = build_corr_band_pyramid(
                fl[0].astype(jnp.float32), fr0.astype(jnp.float32),
                self.corr_levels, d4, self.corr_radius, m4,
                normalize=False)
        else:
            corr = all_pairs_correlation(fl[0].astype(jnp.float32),
                                         fr0.astype(jnp.float32),
                                         normalize=False)
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
