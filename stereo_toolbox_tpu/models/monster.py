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
                                         build_corr_pyramid,
                                         build_volume_pyramid)
from stereo_toolbox_tpu.ops.sampling import warp_right_to_left


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
        thresh = jnp.percentile(m, 20.0)
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
    """monster.py:158-219 — mono decoder features → stereo pyramid
    [48@4x, 64@8x, 192@16x, 160@32x]."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats):
        f4, f8, f16, f32 = feats  # each [B, h_s, w_s, C]
        dt = self.dtype
        x32 = BasicConvIN(160, 3, 1, dtype=dt, name="conv32x")(f32)
        up32 = nn.ConvTranspose(192, (3, 3), strides=(2, 2), padding="SAME",
                                use_bias=False, dtype=dt,
                                name="up32")(x32)
        x16 = BasicConvIN(192, 5, 1, dtype=dt, name="conv16x")(
            jnp.concatenate([f16, up32], -1)) + nn.Conv(
                192, (1, 1), dtype=dt, name="res16")(f16)
        up16 = nn.ConvTranspose(64, (3, 3), strides=(2, 2), padding="SAME",
                                use_bias=False, dtype=dt, name="up16")(x16)
        x8 = BasicConvIN(64, 5, 1, dtype=dt, name="conv8x")(
            jnp.concatenate([f8, up16], -1)) + nn.Conv(
                64, (1, 1), dtype=dt, name="res8")(f8)
        up8 = nn.ConvTranspose(48, (3, 3), strides=(2, 2), padding="SAME",
                               use_bias=False, dtype=dt, name="up8")(x8)
        x4 = BasicConvIN(48, 5, 1, dtype=dt, name="conv4x")(
            jnp.concatenate([f4, up8], -1)) + nn.Conv(
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


class REMP(nn.Module):
    """Full-res refinement on mono/stereo flaws (refinement.py:363-430),
    with a compact UNet + global (LFE) and local (LMC) channel attention."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp_mono, disp_stereo, left, right,
                 train: bool = False):
        dt = self.dtype
        flaw_m = warp_right_to_left(right, disp_mono) - left
        flaw_s = warp_right_to_left(right, disp_stereo) - left
        rm = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt)(
            jnp.concatenate([flaw_m, left], -1)))
        rs = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt)(
            jnp.concatenate([flaw_s, left], -1)))
        dm = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt)(
            disp_mono[..., None]))
        ds = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt)(
            disp_stereo[..., None]))
        x = jnp.concatenate([rm, dm, rs, ds], -1)
        x = BasicConvBN(32, 3, 1, dilation=2, dtype=dt)(x, train)

        # small UNet
        d1 = BasicConvBN(48, 3, 2, dtype=dt)(x, train)
        d2 = BasicConvBN(64, 3, 2, dtype=dt)(d1, train)
        u1 = Conv2x(48, deconv=True, concat=False, dtype=dt)(d2, d1, train)
        u0 = Conv2x(32, deconv=True, concat=False, dtype=dt)(u1, x, train)

        gap = u0.mean(axis=(1, 2), keepdims=True)
        lfe = nn.Dense(64, dtype=dt)(gap)
        lfe = jax.nn.sigmoid(nn.Dense(32, dtype=dt)(nn.relu(lfe)))
        lmc = nn.Conv(32, (3, 3), padding="SAME", dtype=dt)(u0)
        lmc = nn.Conv(64, (3, 3), padding="SAME", dtype=dt)(lmc)
        lmc = jax.nn.sigmoid(nn.Conv(32, (3, 3), padding="SAME",
                                     dtype=dt)(nn.relu(lmc)))
        u0 = u0 * lfe + u0 * lmc
        return nn.Conv(1, (3, 3), padding="SAME", dtype=dt)(
            u0)[..., 0].astype(jnp.float32)


class _MonsterStep(nn.Module):
    """Plain IGEV update (phase 1)."""
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, geo_pyr, corr_pyr, contexts, x0, stem_2x):
        from stereo_toolbox_tpu.models.igev_stereo import IGEVUpdateBlock
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        geo_feat = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                       self.corr_radius)
        nets, mask_feat, delta = IGEVUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block")(nets, contexts, geo_feat, disp[..., None])
        disp = disp + delta[..., 0].astype(disp.dtype)
        xspx = Conv2x(32, deconv=True, dtype=self.dtype,
                      name="spx_2_gru")(mask_feat, stem_2x)
        spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=self.dtype, name="spx_gru")(xspx)
        spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
        disp_up = ops.context_upsample(disp.astype(jnp.float32) * 4.0, spx)
        return (nets, disp), disp_up


class _MonsterMixStep(nn.Module):
    """Coupled stereo+mono update (phase 2, last 7 iterations)."""
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, geo_pyr, corr_pyr, contexts, x0, stem_2x,
                 feat_l, feat_r):
        nets, nets_m, disp, disp_m = carry
        disp = jax.lax.stop_gradient(disp)
        disp_m = jax.lax.stop_gradient(disp_m)

        geo = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                  self.corr_radius)
        geo_m = combined_geo_lookup(geo_pyr, corr_pyr, disp_m, x0,
                                    self.corr_radius)
        flaw = warp_right_to_left(feat_r, disp) - feat_l
        flaw_m = warp_right_to_left(feat_r, disp_m) - feat_l

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

        def up(d, mf):
            spx = jax.nn.softmax(
                spxc(spx2(mf, stem_2x)).astype(jnp.float32), axis=-1)
            return ops.context_upsample(d.astype(jnp.float32) * 4.0, spx)

        return (nets, nets_m, disp, disp_m), (up(disp, mask_feat),
                                              up(disp_m, mask_feat_m))


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
        stem_8 = BasicConvIN(96, 3, 2, dtype=dt, name="stem_8")
        stem_16 = BasicConvIN(192, 3, 2, dtype=dt, name="stem_16")

        def inorm(x, name):
            return nn.relu(nn.GroupNorm(num_groups=None, group_size=1,
                                        use_bias=False, use_scale=False,
                                        name=name)(x))

        stem_2x = inorm(stem_2b(stem_2a(img1)), "stem_2n")
        stem_4x = inorm(stem_4b(stem_4a(stem_2x)), "stem_4n")
        stem_2y = inorm(stem_2b(stem_2a(img2)), "stem_2n_y")
        stem_4y = inorm(stem_4b(stem_4a(stem_2y)), "stem_4n_y")
        stem_8x = stem_8(stem_4x)
        stem_16x = stem_16(stem_8x)

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

        # --- context from mono features (Feat_transfer_cnet) -------------
        ctx16 = nn.Conv(self.hidden_dims[0], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_16")(
            jnp.concatenate([feats_l[2], stem_16x], -1))
        ctx08 = nn.Conv(self.hidden_dims[1], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_8")(
            jnp.concatenate([feats_l[1], stem_8x], -1))
        ctx04 = nn.Conv(self.hidden_dims[2], (3, 3), padding="SAME",
                        dtype=dt, name="cnet_4")(
            jnp.concatenate([feats_l[0], stem_4x], -1))
        nets = tuple(jnp.tanh(x) for x in (ctx04, ctx08, ctx16))
        contexts = []
        for i, cc in enumerate((ctx04, ctx08, ctx16)):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=dt, name=f"context_zqr_{i}")(nn.relu(cc))
            contexts.append(tuple(jnp.split(z, 3, axis=-1)))
        contexts = tuple(contexts)

        gev32 = jnp.moveaxis(gev.astype(jnp.float32), 1, 3)
        geo_pyr = tuple(build_volume_pyramid(gev32, self.corr_levels))
        # IGEV-style corr is unnormalized (MonSter/geometry.py:60-68)
        corr = all_pairs_correlation(match_left.astype(jnp.float32),
                                     match_right.astype(jnp.float32),
                                     normalize=False)
        corr_pyr = tuple(build_corr_pyramid(corr, self.corr_levels))
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))

        # --- phase 1: plain updates --------------------------------------
        n1 = iters - mix_iters
        step1 = nn.scan(
            _MonsterStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(nn.broadcast,) * 5,
            out_axes=0, length=n1,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius, dtype=dt,
          name="phase1")
        (nets, disp), ups1 = step1((nets, init_disp), geo_pyr, corr_pyr,
                                   contexts, x0, stem_2x)

        # --- scale-shift alignment of mono disparity ----------------------
        scale, shift = compute_scale_shift(disp_mono, disp)
        scale = jax.lax.stop_gradient(scale)
        shift = jax.lax.stop_gradient(shift)
        disp_m = (scale * disp_mono + shift).astype(jnp.float32)

        # --- phase 2: coupled mono/stereo updates -------------------------
        step2 = nn.scan(
            _MonsterMixStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(nn.broadcast,) * 7,
            out_axes=0, length=mix_iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius, dtype=dt,
          name="phase2")
        (nets, nets_m, disp, disp_m), (ups_s, ups_m) = step2(
            (nets, nets, disp, disp_m), geo_pyr, corr_pyr, contexts, x0,
            stem_2x, fl0, fr0)

        disp_up = ups_s[-1]
        refine = REMP(dtype=dt, name="remp")(ups_m[-1], disp_up, img1, img2,
                                             train)
        disp_final = disp_up + refine

        if not train:
            return disp_final

        xspx = BasicConvIN(24, 3, 1, dtype=dt, name="spx_4")(fl0)
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
