"""MonSter (CVPR'25) — dual-branch stereo + monocular-foundation fusion.

TPU-native re-design of models/MonSter/monster.py:
  * frozen DepthAnythingV2 provides monocular inverse depth + 4-scale decoder
    features (monster.py:342-356 `infer_mono`); `Feat_transfer` /
    `Feat_transfer_cnet` adapt them into the stereo trunk and the GRU context
    (monster.py:138-219);
  * IGEV-style stereo branch (8-group volume → GEV hourglass → init disp);
  * two-phase recurrence: plain IGEV updates, then for the last 7 iterations
    two coupled GRU branches exchange warped-feature "flaw" maps and each
    other's geo lookups (monster.py:455-480, update.py:485-563), after a
    per-image least-squares scale-shift alignment of the mono disparity
    (monster.py:31-66, applied :462-466);
  * final REMP refinement on the full-res pair (refinement.py:363-430).

Contract: train → ``(init_disp, disp_preds, depth_mono)`` (monster.py last
lines; disp_preds interleaves mono and stereo upsamples during the mix
phase); eval → final refined map. The DAv2 trunk initializes randomly (no
network access) and is frozen via stop_gradient.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.depth_anything_v2 import DepthAnythingV2
from stereo_toolbox_tpu.models.igev_stereo import (GEVHourglass,
                                                   combined_geo_lookup)
from stereo_toolbox_tpu.models.raft_stereo import IMAGENET_MEAN, IMAGENET_STD
from stereo_toolbox_tpu.nn.gru import ConvGRU, pool2x
from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN, BasicConvIN, Conv2x
from stereo_toolbox_tpu.nn.layers import FeatureAtt
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         band_d_max, band_offsets,
                                         build_corr_band_pyramid,
                                         build_corr_pyramid,
                                         build_volume_pyramid)


def monster_disp_warp(img: jax.Array, disp: jax.Array) -> jax.Array:
    """MonSter's disp_warp (warp.py:54-80), replicated verbatim: coords are
    (S-1)-normalized but sampled with grid_sample's align_corners=False and
    padding_mode='border', i.e. the effective sample position is
    ``c·S/(S-1) − 0.5`` on BOTH axes (a systematic sub-pixel shift, the same
    class of quirk as PCWNet's refinement warp) with edge-clamped bilinear.

    Args:
      img: ``[B, H, W, C]``; disp: ``[B, H, W]`` positive left disparity.
    """
    b, h, w, _ = img.shape
    from stereo_toolbox_tpu.ops.sampling import (bilinear_sampler,
                                                 coords_grid)
    grid = coords_grid(b, h, w, dtype=disp.dtype)
    px = (grid[..., 0] - disp) * (w / (w - 1.0)) - 0.5
    py = grid[..., 1] * (h / (h - 1.0)) - 0.5
    px = jnp.clip(px, 0.0, w - 1.0)  # border padding ≡ coordinate clamp
    py = jnp.clip(py, 0.0, h - 1.0)
    return bilinear_sampler(img, jnp.stack([px, py], axis=-1))


def compute_scale_shift(mono: jax.Array, stereo: jax.Array):
    """Per-image least-squares (scale, shift) aligning mono to stereo.

    Parity: monster.py:31-66 — valid where stereo > 0 and mono above both
    1e-2 and its 20th percentile; ridge-regularized 2×2 solve.

    Args:
      mono, stereo: ``[B, H, W]``.

    Returns:
      (scale, shift): each ``[B, 1, 1]``.
    """
    def per_image(m, s):
        # reference threshold: sorted[int(0.2*N)] (monster.py:45-48), not an
        # interpolated percentile
        flat = jnp.sort(m.reshape(-1))
        thresh = flat[int(0.2 * flat.shape[0])]
        mask = (s > 0) & (m > 1e-2) & (m > thresh)
        wgt = mask.astype(jnp.float32).reshape(-1)
        x = m.reshape(-1)
        y = s.reshape(-1)
        sw = wgt.sum() + 1e-6
        sx = (wgt * x).sum()
        sxx = (wgt * x * x).sum()
        sy = (wgt * y).sum()
        sxy = (wgt * x * y).sum()
        a = jnp.array([[sxx + 1e-6, sx], [sx, sw + 1e-6]])
        b = jnp.array([sxy, sy])
        p = jnp.linalg.solve(a, b)
        return p[0], p[1]

    scale, shift = jax.vmap(per_image)(mono.astype(jnp.float32),
                                       stereo.astype(jnp.float32))
    return scale[:, None, None], shift[:, None, None]


class FeatTransfer(nn.Module):
    """monster.py:160-219 `Feat_transfer` — mono decoder features → stereo
    pyramid [48@4x, 64@8x, 192@16x, 160@32x]. Each conv*x is a biased Conv
    + param-free InstanceNorm + plain ReLU; upsamplers are bias-free k3/s2
    ConvTransposes; res_* are biased 1×1 residual projections."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats):
        f4, f8, f16, f32 = feats  # each [B, h_s, w_s, C]
        dt = self.dtype

        def conv_in_relu(x, features, k, name):
            p = k // 2
            x = nn.Conv(features, (k, k), padding=((p, p), (p, p)),
                        dtype=dt, name=name)(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, epsilon=1e-5,
                             name=f"{name}_in")(x)
            return nn.relu(x)

        x32 = conv_in_relu(f32, 160, 3, "conv32x")
        up32 = nn.ConvTranspose(192, (3, 3), strides=(2, 2),
                                padding=((1, 2), (1, 2)),
                                use_bias=False, dtype=dt,
                                name="up32")(x32)
        x16 = conv_in_relu(jnp.concatenate([f16, up32], -1), 192, 5,
                           "conv16x") + nn.Conv(
            192, (1, 1), dtype=dt, name="res16")(f16)
        up16 = nn.ConvTranspose(64, (3, 3), strides=(2, 2),
                                padding=((1, 2), (1, 2)),
                                use_bias=False, dtype=dt, name="up16")(x16)
        x8 = conv_in_relu(jnp.concatenate([f8, up16], -1), 64, 5,
                          "conv8x") + nn.Conv(
            64, (1, 1), dtype=dt, name="res8")(f8)
        up8 = nn.ConvTranspose(48, (3, 3), strides=(2, 2),
                               padding=((1, 2), (1, 2)),
                               use_bias=False, dtype=dt, name="up8")(x8)
        x4 = conv_in_relu(jnp.concatenate([f4, up8], -1), 48, 5,
                          "conv4x") + nn.Conv(
            48, (1, 1), dtype=dt, name="res4")(f4)
        return [x4, x8, x16, x32]


class MixMotionEncoder(nn.Module):
    """update.py:524-563: fuses own and counterpart geo/flaw/disp."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp, corr, flaw, disp_o, corr_o, flaw_o):
        dt = self.dtype

        def branch(corr_, flaw_, disp_, tag):
            c = nn.relu(nn.Conv(64, (1, 1), dtype=dt, name=f"c1{tag}")(
                jnp.concatenate([corr_, flaw_], -1)))
            c = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                                name=f"c2{tag}")(c))
            d = nn.relu(nn.Conv(64, (7, 7), padding="SAME", dtype=dt,
                                name=f"d1{tag}")(disp_))
            d = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                                name=f"d2{tag}")(d))
            return nn.relu(nn.Conv(63, (3, 3), padding="SAME", dtype=dt,
                                   name=f"o{tag}")(
                jnp.concatenate([c, d], -1)))

        own = branch(corr, flaw, disp, "")
        other = branch(corr_o, flaw_o, disp_o, "_mono")
        return jnp.concatenate([own, disp, other, disp_o], -1)


class MixUpdateBlock(nn.Module):
    """update.py:485-522."""
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, nets, contexts, disp, corr, flaw, disp_o, corr_o,
                 flaw_o):
        net04, net08, net16 = nets
        ctx04, ctx08, ctx16 = contexts
        if self.n_gru_layers == 3:
            net16 = ConvGRU(self.hidden_dims[0], dtype=self.dtype,
                            name="gru16")(net16, pool2x(net08), ctx16)
        if self.n_gru_layers >= 2:
            x08 = [pool2x(net04)]
            if self.n_gru_layers > 2:
                x08.append(ops.interpolate(net16, net08.shape[1:3], (1, 2),
                                           align_corners=True))
            net08 = ConvGRU(self.hidden_dims[1], dtype=self.dtype,
                            name="gru08")(net08, jnp.concatenate(x08, -1),
                                          ctx08)
        motion = MixMotionEncoder(dtype=self.dtype, name="encoder")(
            disp, corr, flaw, disp_o, corr_o, flaw_o)
        x04 = [motion]
        if self.n_gru_layers > 1:
            x04.append(ops.interpolate(net08, net04.shape[1:3], (1, 2),
                                       align_corners=True))
        net04 = ConvGRU(self.hidden_dims[2], dtype=self.dtype,
                        name="gru04")(net04, jnp.concatenate(x04, -1), ctx04)
        d = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="disp_head_1")(net04))
        delta = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                        name="disp_head_2")(d)
        mask_feat = nn.relu(nn.Conv(32, (3, 3), padding="SAME",
                                    dtype=self.dtype,
                                    name="mask_feat_4")(net04))
        return (net04, net08, net16), mask_feat, delta


class ConvBNLeaky(nn.Module):
    """refinement.py:8-13 `conv2d`: Conv(bias=False) + BN + LeakyReLU(0.2)."""
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), kernel_dilation=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, 0.2)


class BasicConvNow(nn.Module):
    """refinement.py:55-81 `BasicConv_now`: Conv/Deconv(bias=False)+BN+ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    deconv: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deconv:
            # torch ConvTranspose2d(k=4, s=2, p=1) ≡ flax SAME
            x = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                                 strides=(self.stride, self.stride),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype, name="conv")(x)
        else:
            p = self.dilation if self.dilation > 1 else self.kernel // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)),
                        kernel_dilation=self.dilation, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class Conv2xNow(nn.Module):
    """refinement.py:16-53 `Conv2x_now` (concat variant)."""
    features: int
    deconv: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        k = 4 if self.deconv else 3
        x = BasicConvNow(self.features, k, 2, deconv=self.deconv,
                         dtype=self.dtype, name="conv1")(x, train)
        x = jnp.concatenate([x, rem], -1)
        x = BasicConvNow(self.features, 3, 1, dtype=self.dtype,
                         name="conv2")(x, train)
        return x


class SimpleUNet(nn.Module):
    """refinement.py:164-222 `Simple_UNet`: 4-level encoder, deconv pass,
    re-encode pass, final deconv pass — all skip links concatenated."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        rem0 = x
        rem1 = x = BasicConvNow(48, 3, 2, dtype=dt, name="conv1a")(x, train)
        rem2 = x = BasicConvNow(64, 3, 2, dtype=dt, name="conv2a")(x, train)
        rem3 = x = BasicConvNow(96, 3, 2, dilation=2, dtype=dt,
                                name="conv3a")(x, train)
        rem4 = x = BasicConvNow(128, 3, 2, dilation=2, dtype=dt,
                                name="conv4a")(x, train)

        rem3 = x = Conv2xNow(96, True, dt, name="deconv4a")(x, rem3, train)
        rem2 = x = Conv2xNow(64, True, dt, name="deconv3a")(x, rem2, train)
        rem1 = x = Conv2xNow(48, True, dt, name="deconv2a")(x, rem1, train)
        rem0 = x = Conv2xNow(32, True, dt, name="deconv1a")(x, rem0, train)

        rem1 = x = Conv2xNow(48, False, dt, name="conv1b")(x, rem1, train)
        rem2 = x = Conv2xNow(64, False, dt, name="conv2b")(x, rem2, train)
        rem3 = x = Conv2xNow(96, False, dt, name="conv3b")(x, rem3, train)
        x = Conv2xNow(128, False, dt, name="conv4b")(x, rem4, train)

        x = Conv2xNow(96, True, dt, name="deconv4b")(x, rem3, train)
        x = Conv2xNow(64, True, dt, name="deconv3b")(x, rem2, train)
        x = Conv2xNow(48, True, dt, name="deconv2b")(x, rem1, train)
        x = Conv2xNow(32, True, dt, name="deconv1b")(x, rem0, train)
        return x


class REMP(nn.Module):
    """Full-res refinement on mono/stereo flaws — faithful port of
    refinement.py:363-433: conv2d stems, dilated conv_start, Simple_UNet,
    LFE (global) vs LMC (local) gating blended as (1-motif)·low + motif·x,
    and a LeakyReLU on the refined disparity."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp_mono, disp_stereo, left, right,
                 train: bool = False):
        dt = self.dtype
        flaw_m = monster_disp_warp(right, disp_mono) - left
        flaw_s = monster_disp_warp(right, disp_stereo) - left
        rm = ConvBNLeaky(16, dtype=dt, name="conv1_mono")(
            jnp.concatenate([flaw_m, left], -1), train)
        rs = ConvBNLeaky(16, dtype=dt, name="conv1_stereo")(
            jnp.concatenate([flaw_s, left], -1), train)
        dm = ConvBNLeaky(16, dtype=dt, name="conv2_mono")(
            disp_mono[..., None], train)
        ds = ConvBNLeaky(16, dtype=dt, name="conv2_stereo")(
            disp_stereo[..., None], train)
        x = jnp.concatenate([rm, dm, rs, ds], -1)
        x = BasicConvNow(32, 3, 1, dilation=2, dtype=dt,
                         name="conv_start")(x, train)
        x = SimpleUNet(dtype=dt, name="unet")(x, train)

        gap = x.mean(axis=(1, 2), keepdims=True)
        low = nn.Conv(64, (1, 1), dtype=dt, name="lfe_1")(gap)
        low = jax.nn.sigmoid(
            nn.Conv(32, (1, 1), dtype=dt, name="lfe_2")(nn.relu(low)))
        motif = nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                        name="lmc_1")(x)
        motif = nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                        name="lmc_2")(motif)
        motif = jax.nn.sigmoid(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                       name="lmc_3")(nn.relu(motif)))
        x = (1.0 - motif) * low + motif * x
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=dt,
                    name="final_conv")(x)[..., 0].astype(jnp.float32)
        return nn.leaky_relu(disp_stereo.astype(jnp.float32) + x, 0.01)


class _MonsterStep(nn.Module):
    """Plain IGEV update (phase 1)."""
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    band_offs: tuple = ()  # static — () selects the full-pyramid lookup
    # eval: phase-1 upsamples are never read (monster.py:486), skip them all
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, geo_pyr, corr_pyr, contexts, x0,
                 stem_2x):
        from stereo_toolbox_tpu.models.igev_stereo import IGEVUpdateBlock
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        geo_feat = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                       self.corr_radius, self.band_offs)
        nets, mask_feat, delta = IGEVUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block")(nets, contexts, geo_feat, disp[..., None])
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


class _MonsterMixStep(nn.Module):
    """Coupled stereo+mono update (phase 2, last 7 iterations)."""
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    band_offs: tuple = ()
    # eval: only the final iteration's upsamples are read (monster.py:486)
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, geo_pyr, corr_pyr, contexts, x0,
                 stem_2x, feat_l, feat_r):
        nets, nets_m, disp, disp_m = carry
        disp = jax.lax.stop_gradient(disp)
        disp_m = jax.lax.stop_gradient(disp_m)

        geo = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                  self.corr_radius, self.band_offs)
        geo_m = combined_geo_lookup(geo_pyr, corr_pyr, disp_m, x0,
                                    self.corr_radius, self.band_offs)
        flaw = monster_disp_warp(feat_r, disp) - feat_l
        flaw_m = monster_disp_warp(feat_r, disp_m) - feat_l

        nets, mask_feat, delta = MixUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block_mix_stereo")(
                nets, contexts, disp[..., None], geo, flaw,
                disp_m[..., None], geo_m, flaw_m)
        nets_m, mask_feat_m, delta_m = MixUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block_mix_mono")(
                nets_m, contexts, disp_m[..., None], geo_m, flaw_m,
                disp[..., None], geo, flaw)
        disp = disp + delta[..., 0].astype(disp.dtype)
        disp_m = disp_m + delta_m[..., 0].astype(disp_m.dtype)

        spx2 = Conv2x(32, deconv=True, dtype=self.dtype, name="spx_2_gru")
        spxc = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="spx_gru")

        def up(d, mf, s2x):
            spx = jax.nn.softmax(
                spxc(spx2(mf, s2x)).astype(jnp.float32), axis=-1)
            return ops.context_upsample(d.astype(jnp.float32) * 4.0, spx)

        if not self.skip_unemitted:
            outs = (up(disp, mask_feat, stem_2x),
                    up(disp_m, mask_feat_m, stem_2x))
        else:
            tiny = up(disp[:, :2, :2], mask_feat[:, :2, :2],
                      stem_2x[:, :4, :4])
            zero_full = jnp.zeros(
                disp.shape[:1] + (disp.shape[1] * 4, disp.shape[2] * 4),
                tiny.dtype) + 0.0 * tiny.mean()
            outs = jax.lax.cond(
                emit,
                lambda: (up(disp, mask_feat, stem_2x),
                         up(disp_m, mask_feat_m, stem_2x)),
                lambda: (zero_full, zero_full))
        return (nets, nets_m, disp, disp_m), outs


class Monster(nn.Module):
    encoder: str = "vits"  # reference default: vitl
    max_disp: int = 192
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 2
    corr_radius: int = 4
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    mix_iters: int = 7
    imagenet_norm_input: bool = True
    # disparity-banded relative corr volumes by default (ops/corr.py)
    # 'banded' caps corr lookups at max_disp + band_margin; the
    # reference pyramid is all-pairs — use 'reg' for uncapped parity
    corr_impl: str = "banded"
    band_margin: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        mix_iters = min(self.mix_iters, iters)
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

        # --- frozen mono branch (monster.py:342-356) ---------------------
        rh = max(round(h * 14 / 16 / 14) * 14, 14)
        rw = max(round(w * 14 / 16 / 14) * 14, 14)
        danv2 = DepthAnythingV2(self.encoder, dtype=dt, name="mono")
        both = jnp.concatenate([left, right], axis=0)
        both_r = ops.interpolate(both, (rh, rw), (1, 2), align_corners=True)
        depth_all, feats = danv2(both_r, return_features=True)
        depth_all = jax.lax.stop_gradient(depth_all)
        paths = [jax.lax.stop_gradient(p) for p in feats["paths"]]

        depth_mono = ops.interpolate(depth_all[:b], (h, w), (1, 2),
                                     align_corners=False)
        disp_mono = ops.interpolate(depth_mono, (h4, w4), (1, 2),
                                    align_corners=False)

        # mono decoder paths → per-view pyramids at 4x/8x/16x/32x
        p4, p3, p2, p1 = paths  # coarse→fine
        sizes = [(h4, w4), (h // 8, w // 8), (h // 16, w // 16),
                 (h // 32, w // 32)]
        pyr = [ops.interpolate(p, s, (1, 2), align_corners=True)
               for p, s in zip((p1, p2, p3, p4), sizes)]
        ft = FeatTransfer(dtype=dt, name="feat_transfer")
        feats_l = ft([p[:b] for p in pyr])
        feats_r = ft([p[b:] for p in pyr])

        # --- stems (IGEV) -------------------------------------------------
        stem_2a = BasicConvIN(32, 3, 2, dtype=dt, name="stem_2a")
        stem_2b = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                          dtype=dt, name="stem_2b")
        stem_4a = BasicConvIN(48, 3, 2, dtype=dt, name="stem_4a")
        stem_4b = nn.Conv(48, (3, 3), padding="SAME", use_bias=False,
                          dtype=dt, name="stem_4b")
        stem_8a = BasicConvIN(96, 3, 2, dtype=dt, name="stem_8a")
        stem_8b = nn.Conv(96, (3, 3), padding="SAME", use_bias=False,
                          dtype=dt, name="stem_8b")
        stem_16a = BasicConvIN(192, 3, 2, dtype=dt, name="stem_16a")
        stem_16b = nn.Conv(192, (3, 3), padding="SAME", use_bias=False,
                           dtype=dt, name="stem_16b")

        def inorm(x, name):
            return nn.relu(nn.GroupNorm(num_groups=None, group_size=1,
                                        use_bias=False, use_scale=False,
                                        epsilon=1e-5, name=name)(x))

        stem_2x = inorm(stem_2b(stem_2a(img1)), "stem_2n")
        stem_4x = inorm(stem_4b(stem_4a(stem_2x)), "stem_4n")
        stem_2y = inorm(stem_2b(stem_2a(img2)), "stem_2n_y")
        stem_4y = inorm(stem_4b(stem_4a(stem_2y)), "stem_4n_y")
        stem_8x = inorm(stem_8b(stem_8a(stem_4x)), "stem_8n")
        stem_16x = inorm(stem_16b(stem_16a(stem_8x)), "stem_16n")

        fl0 = jnp.concatenate([feats_l[0], stem_4x], -1)  # 96ch
        fr0 = jnp.concatenate([feats_r[0], stem_4y], -1)
        features = [fl0, feats_l[1], feats_l[2], feats_l[3]]

        conv = BasicConvIN(96, 3, 1, dtype=dt, name="conv")
        desc = nn.Conv(96, (1, 1), dtype=dt, name="desc")
        match_left = desc(conv(fl0))
        match_right = desc(conv(fr0))

        d4 = self.max_disp // 4
        gwc = ops.build_gwc_volume(match_left, match_right, d4, 8)
        gwc = BasicConvBN(8, 3, 1, dtype=dt, name="corr_stem")(gwc, train)
        gwc = FeatureAtt(8, dtype=dt, name="corr_feature_att")(gwc, fl0,
                                                               train)
        gev = GEVHourglass(8, dtype=dt, name="cost_agg")(gwc, features,
                                                         train)
        prob = jax.nn.softmax(
            nn.Conv(1, (3, 3, 3), use_bias=False, dtype=dt,
                    name="classifier")(gev)[..., 0].astype(jnp.float32), 1)
        init_disp = ops.disparity_regression(prob, d4)

        # --- context from RAW mono features (Feat_transfer_cnet,
        # monster.py:140-155: res_*x on cat(features_mono[k], stem)) -------
        mono_l = [p[:b] for p in pyr]  # raw decoder features, C=features
        ctx16 = nn.Conv(self.hidden_dims[0], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_16")(
            jnp.concatenate([mono_l[2], stem_16x], -1))
        ctx08 = nn.Conv(self.hidden_dims[1], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_8")(
            jnp.concatenate([mono_l[1], stem_8x], -1))
        ctx04 = nn.Conv(self.hidden_dims[2], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_4")(
            jnp.concatenate([mono_l[0], stem_4x], -1))
        nets = tuple(jnp.tanh(x) for x in (ctx04, ctx08, ctx16))
        contexts = []
        for i, cc in enumerate((ctx04, ctx08, ctx16)):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=dt, name=f"context_zqr_{i}")(nn.relu(cc))
            contexts.append(tuple(jnp.split(z, 3, axis=-1)))
        contexts = tuple(contexts)

        # lookup pyramids in the model dtype (bf16 halves per-iteration
        # HBM traffic; positions/weights stay f32 — ops/sampling.py);
        # dtype=None keeps the exact f32 parity/golden path
        lkdt = self.dtype or jnp.float32
        geo_vol = jnp.moveaxis(gev, 1, 3).astype(lkdt)
        geo_pyr = tuple(build_volume_pyramid(geo_vol, self.corr_levels))
        # IGEV-style corr is unnormalized (MonSter/geometry.py:60-68)
        band_offs = ()
        if self.corr_impl == "banded":
            # eval: capped at max_disp + margin; train: full width (the
            # cap degrades optimization — see igev_stereo)
            d4 = band_d_max(None if train else self.max_disp // 4,
                            match_left.shape[2])
            m4 = max(self.band_margin // 4, 1)
            band_offs = band_offsets(self.corr_levels, d4,
                                     self.corr_radius, m4)
            corr_pyr = build_corr_band_pyramid(
                match_left.astype(lkdt),
                match_right.astype(lkdt), self.corr_levels, d4,
                self.corr_radius, m4, normalize=False)
            corr_pyr = tuple(c.astype(lkdt) for c in corr_pyr)
        else:
            corr = all_pairs_correlation(match_left.astype(jnp.float32),
                                         match_right.astype(jnp.float32),
                                         normalize=False)
            corr_pyr = tuple(build_corr_pyramid(corr, self.corr_levels))
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))

        # --- phase 1: plain updates --------------------------------------
        n1 = iters - mix_iters
        emit1 = jnp.ones((n1,), bool) if train else jnp.zeros((n1,), bool)
        step1 = nn.scan(
            _MonsterStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 5,
            out_axes=0, length=n1,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          band_offs=band_offs, skip_unemitted=not train, dtype=dt,
          name="phase1")
        # the mono branch's GRU state starts from the INITIAL contexts —
        # the reference clones net_list before the loop (monster.py:452)
        nets0 = nets
        (nets, disp), ups1 = step1((nets, init_disp), emit1, geo_pyr,
                                   corr_pyr, contexts, x0, stem_2x)

        # --- scale-shift alignment of mono disparity ----------------------
        scale, shift = compute_scale_shift(disp_mono, disp)
        scale = jax.lax.stop_gradient(scale)
        shift = jax.lax.stop_gradient(shift)
        disp_m = (scale * disp_mono + shift).astype(jnp.float32)

        # --- phase 2: coupled mono/stereo updates -------------------------
        emit2 = jnp.ones((mix_iters,), bool) if train else \
            jnp.arange(mix_iters) == mix_iters - 1
        step2 = nn.scan(
            _MonsterMixStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 7,
            out_axes=0, length=mix_iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          band_offs=band_offs, skip_unemitted=not train, dtype=dt,
          name="phase2")
        (nets, nets_m, disp, disp_m), (ups_s, ups_m) = step2(
            (nets, nets0, disp, disp_m), emit2, geo_pyr, corr_pyr, contexts,
            x0, stem_2x, fl0, fr0)

        # refine_value = REMP(mono_up, disp_up, img1, img2); the reference
        # adds it as a residual on top of disp_up (monster.py:491-493),
        # with REMP itself returning LeakyReLU(disp_up + x).
        disp_up = ups_s[-1]
        refine = REMP(dtype=dt, name="remp")(ups_m[-1], disp_up, img1, img2,
                                             train)
        disp_final = disp_up + refine

        if not train:
            return disp_final

        # spx_4 = Sequential(BasicConv_IN, Conv, IN, ReLU) (monster.py:299)
        xspx = BasicConvIN(24, 3, 1, dtype=dt, name="spx_4")(fl0)
        xspx = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=dt, name="spx_4b")(xspx)
        xspx = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, epsilon=1e-5,
                            name="spx_4n")(xspx)
        xspx = nn.relu(xspx)
        xspx = Conv2x(32, deconv=True, instance_norm=True, dtype=dt,
                      name="spx_2")(xspx, stem_2x)
        spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=dt, name="spx")(xspx)
        spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
        init_up = ops.context_upsample(init_disp * 4.0, spx)

        preds = [ups1[i] for i in range(n1)]
        for i in range(mix_iters):
            preds.append(ups_m[i])
            preds.append(ups_s[i] if i < mix_iters - 1 else disp_final)
        return init_up, preds, depth_mono
