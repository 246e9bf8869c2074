"""IGEV-Stereo (CVPR'23) — Geometry Encoding Volume + ConvGRU refinement.

TPU-native re-design of models/IGEVStereo/igev_stereo.py:
  * MobileNetV2 feature pyramid with deconv fusion
    (extractor.py:327-362; trained from scratch, no timm);
  * stems at 1/2 and 1/4 merged into the matching features
    (igev_stereo.py:197-202);
  * 8-group correlation volume → corr_stem → FeatureAtt → 3-scale 3D
    hourglass with per-scale FeatureAtt = Geometry Encoding Volume
    (igev_stereo.py:204-209, hourglass :23-90);
  * init disparity by softmax regression over the GEV (igev_stereo.py:212);
  * per-iteration Combined_Geo_Encoding_Volume lookup (geometry.py:35-59):
    the GEV sampled at disp±4 and the all-pairs corr pyramid sampled at
    (x - disp)±4, two levels each — realized with the shared
    `volume_lookup_1d`/`corr_lookup_1d` ops inside one `nn.scan`;
  * superpixel `context_upsample` (submodule.py:243-255).

Contract: train → ``(init_disp, [disp_preds...])`` full-res (matches the
trainer's sequence loss, trainer_torchrun.py:274-284); eval → final map.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.nn.gru import ConvGRU, pool2x
from stereo_toolbox_tpu.nn.igev_blocks import (BasicConvBN, BasicConvIN,
                                               Conv2x, IGEVFeature)
from stereo_toolbox_tpu.nn.layers import FeatureAtt
from stereo_toolbox_tpu.models.raft_stereo import (IMAGENET_MEAN,
                                                   IMAGENET_STD,
                                                   MultiBasicEncoder)
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         band_d_max, band_offsets,
                                         build_corr_band_pyramid,
                                         build_corr_pyramid,
                                         build_volume_pyramid,
                                         corr_lookup_1d_banded)
from stereo_toolbox_tpu.ops.sampling import sample_1d


class GEVHourglass(nn.Module):
    """3-scale 3D hourglass with FeatureAtt at every scale
    (igev_stereo.py:23-90)."""
    features: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, features, train: bool = False):
        f = self.features
        c1 = BasicConvBN(f * 2, 3, 2, dtype=self.dtype)(x, train)
        c1 = BasicConvBN(f * 2, 3, 1, dtype=self.dtype)(c1, train)
        c1 = FeatureAtt(f * 2, dtype=self.dtype)(c1, features[1], train)

        c2 = BasicConvBN(f * 4, 3, 2, dtype=self.dtype)(c1, train)
        c2 = BasicConvBN(f * 4, 3, 1, dtype=self.dtype)(c2, train)
        c2 = FeatureAtt(f * 4, dtype=self.dtype)(c2, features[2], train)

        c3 = BasicConvBN(f * 6, 3, 2, dtype=self.dtype)(c2, train)
        c3 = BasicConvBN(f * 6, 3, 1, dtype=self.dtype)(c3, train)
        c3 = FeatureAtt(f * 6, dtype=self.dtype)(c3, features[3], train)

        up2 = BasicConvBN(f * 4, 4, 2, deconv=True,
                          dtype=self.dtype)(c3, train)
        c2 = jnp.concatenate([up2, c2], axis=-1)
        c2 = BasicConvBN(f * 4, 1, 1, dtype=self.dtype)(c2, train)
        c2 = BasicConvBN(f * 4, 3, 1, dtype=self.dtype)(c2, train)
        c2 = BasicConvBN(f * 4, 3, 1, dtype=self.dtype)(c2, train)
        c2 = FeatureAtt(f * 4, dtype=self.dtype)(c2, features[2], train)

        up1 = BasicConvBN(f * 2, 4, 2, deconv=True,
                          dtype=self.dtype)(c2, train)
        c1 = jnp.concatenate([up1, c1], axis=-1)
        c1 = BasicConvBN(f * 2, 1, 1, dtype=self.dtype)(c1, train)
        c1 = BasicConvBN(f * 2, 3, 1, dtype=self.dtype)(c1, train)
        c1 = BasicConvBN(f * 2, 3, 1, dtype=self.dtype)(c1, train)
        c1 = FeatureAtt(f * 2, dtype=self.dtype)(c1, features[1], train)

        return BasicConvBN(8, 4, 2, deconv=True, norm=False, relu=False,
                           dtype=self.dtype)(c1, train)


class IGEVMotionEncoder(nn.Module):
    """update.py:73-91: geo features + disparity → 128-dim features."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp: jax.Array, geo: jax.Array) -> jax.Array:
        c = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype)(geo))
        c = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(c))
        d = nn.relu(nn.Conv(64, (7, 7), padding="SAME",
                            dtype=self.dtype)(disp))
        d = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(d))
        out = nn.relu(nn.Conv(127, (3, 3), padding="SAME", dtype=self.dtype)(
            jnp.concatenate([c, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)


class IGEVUpdateBlock(nn.Module):
    """Multi-scale GRU + disp head + mask features (update.py:115-139)."""
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, nets, contexts, geo, disp):
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
        motion = IGEVMotionEncoder(dtype=self.dtype,
                                   name="encoder")(disp, geo)
        x04 = [motion]
        if self.n_gru_layers > 1:
            x04.append(ops.interpolate(net08, net04.shape[1:3], (1, 2),
                                       align_corners=True))
        net04 = ConvGRU(self.hidden_dims[2], dtype=self.dtype,
                        name="gru04")(net04, jnp.concatenate(x04, -1), ctx04)

        d = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="disp_head_1")(net04))
        delta_disp = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                             name="disp_head_2")(d)
        mask_feat = nn.relu(nn.Conv(32, (3, 3), padding="SAME",
                                    dtype=self.dtype,
                                    name="mask_feat_4")(net04))
        return (net04, net08, net16), mask_feat, delta_disp


class _IGEVStep(nn.Module):
    """One refinement iteration (igev_stereo.py:237-248)."""
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    band_offs: tuple = ()  # static — () selects the full-pyramid lookup
    # eval protocol: upsample only when `emit` is set — the reference skips
    # the superpixel upsample on all but the last eval iteration
    # (igev_stereo.py:244-245), worth ~7 ms/iter at 1088×1920
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, geo_pyr, corr_pyr, contexts, x0,
                 stem_2x):
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        geo_feat = combined_geo_lookup(geo_pyr, corr_pyr, disp, x0,
                                       self.corr_radius, self.band_offs)
        nets, mask_feat, delta = IGEVUpdateBlock(
            self.hidden_dims, self.n_gru_layers, dtype=self.dtype,
            name="update_block")(nets, contexts, geo_feat, disp[..., None])
        disp = disp + delta[..., 0].astype(disp.dtype)

        # in-loop superpixel upsample (igev_stereo.py:160-167)
        spx2 = Conv2x(32, deconv=True, dtype=self.dtype, name="spx_2_gru")
        spxc = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="spx_gru")

        def upsample(mask_feat, stem_2x, disp):
            spx = spxc(spx2(mask_feat, stem_2x))
            spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
            return ops.context_upsample(disp.astype(jnp.float32) * 4.0, spx)

        if not self.skip_unemitted:
            disp_up = upsample(mask_feat, stem_2x, disp)
        else:
            # Param creation must happen unconditionally (outside lax.cond,
            # else the scanned init fails with a broadcast-var dependency);
            # a 2×2 dummy costs nothing and pins the variable structure.
            tiny = upsample(mask_feat[:, :2, :2], stem_2x[:, :4, :4],
                            disp[:, :2, :2])
            zero_full = jnp.zeros(
                disp.shape[:1] + (disp.shape[1] * 4, disp.shape[2] * 4),
                tiny.dtype) + 0.0 * tiny.mean()
            disp_up = jax.lax.cond(
                emit,
                lambda m, s, d: upsample(m, s, d),
                lambda m, s, d: zero_full,
                mask_feat, stem_2x, disp)
        return (nets, disp), disp_up


def combined_geo_lookup(geo_pyr, corr_pyr, disp, x0, radius, band_offs=()):
    """Combined GEV + corr windowed lookup (geometry.py:35-59): per level,
    geo volume at disp/2^i ± dx and init corr at (x - disp)/2^i ± dx.

    With ``band_offs`` set, ``corr_pyr`` holds disparity-banded relative
    volumes (ops/corr.py `build_corr_band_pyramid`) instead of full
    ``[B,H,W,W]`` pyramids — bitwise-equal samples at ~7× less work.

    Channel layout parity: the reference flattens the geo samples
    channel-major, window-minor (geometry.py:48-49: ``[bhw, c, 1, K]``
    → ``view(b, h, w, -1)``)."""
    geo_parts, corr_parts = [], []
    for i, gv in enumerate(geo_pyr):
        dx = jnp.arange(-radius, radius + 1, dtype=disp.dtype)
        pos_d = disp[..., None] / (2.0 ** i) + dx
        v = jnp.moveaxis(gv, -1, -2)  # [B,H,W,C,D_i]
        g = sample_1d(v, pos_d[..., None, :])  # [B,H,W,C,K]
        geo_parts.append(g.reshape(g.shape[:3] + (-1,)))  # C-major, K-minor
    if band_offs:
        looked = corr_lookup_1d_banded(corr_pyr, x0 - disp, band_offs,
                                       radius)
        k = 2 * radius + 1
        corr_parts = [looked[..., i * k:(i + 1) * k]
                      for i in range(len(corr_pyr))]
    else:
        for i, cv in enumerate(corr_pyr):
            dx = jnp.arange(-radius, radius + 1, dtype=disp.dtype)
            pos_c = (x0 - disp)[..., None] / (2.0 ** i) + dx
            corr_parts.append(sample_1d(cv, pos_c))
    out = []
    for g, c in zip(geo_parts, corr_parts):
        out.extend([g, c])
    return jnp.concatenate(out, axis=-1)


class IGEVStereo(nn.Module):
    hidden_dims: Sequence[int] = (128, 128, 128)
    max_disp: int = 192
    corr_levels: int = 2
    corr_radius: int = 4
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    imagenet_norm_input: bool = True
    # 'banded' relative corr volumes (default) vs 'reg' full pyramids —
    # bitwise-equal lookups for disp ∈ [-margin, max_disp + margin]
    # (ops/corr.py `build_corr_band_pyramid`)
    # 'banded' caps corr lookups at max_disp + band_margin; the
    # reference pyramid is all-pairs — use 'reg' for uncapped parity
    corr_impl: str = "banded"
    band_margin: int = 32  # full-res px of slack around [0, max_disp]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left: jax.Array, right: jax.Array,
                 train: bool = False, iters: int | None = None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        if self.imagenet_norm_input:
            mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
            std = jnp.asarray(IMAGENET_STD, left.dtype)
            img1 = 2.0 * (left * std + mean) - 1.0
            img2 = 2.0 * (right * std + mean) - 1.0
        else:
            img1, img2 = left, right

        feature = IGEVFeature(dtype=self.dtype, name="feature")
        fl = feature(img1, train)
        fr = feature(img2, train)

        stem_2a = BasicConvIN(32, 3, 2, dtype=self.dtype, name="stem_2a")
        stem_2b = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                          dtype=self.dtype, name="stem_2b")
        stem_2n = nn.GroupNorm(num_groups=None, group_size=1,
                               use_bias=False, use_scale=False,
                               epsilon=1e-5, name="stem_2n")
        stem_4a = BasicConvIN(48, 3, 2, dtype=self.dtype, name="stem_4a")
        stem_4b = nn.Conv(48, (3, 3), padding="SAME", use_bias=False,
                          dtype=self.dtype, name="stem_4b")
        stem_4n = nn.GroupNorm(num_groups=None, group_size=1,
                               use_bias=False, use_scale=False,
                               epsilon=1e-5, name="stem_4n")

        def stem_2(x):
            return nn.relu(stem_2n(stem_2b(stem_2a(x))))

        def stem_4(x):
            return nn.relu(stem_4n(stem_4b(stem_4a(x))))

        stem_2x = stem_2(img1)
        stem_4x = stem_4(stem_2x)
        stem_2y = stem_2(img2)
        stem_4y = stem_4(stem_2y)
        fl0 = jnp.concatenate([fl[0], stem_4x], axis=-1)  # 96ch
        fr0 = jnp.concatenate([fr[0], stem_4y], axis=-1)
        features = [fl0] + fl[1:]

        conv = BasicConvIN(96, 3, 1, dtype=self.dtype, name="conv")
        desc = nn.Conv(96, (1, 1), dtype=self.dtype, name="desc")
        match_left = desc(conv(fl0))
        match_right = desc(conv(fr0))

        d4 = self.max_disp // 4
        gwc = ops.build_gwc_volume(match_left, match_right, d4, 8)
        gwc = BasicConvBN(8, 3, 1, dtype=self.dtype,
                          name="corr_stem")(gwc, train)
        gwc = FeatureAtt(8, dtype=self.dtype,
                         name="corr_feature_att")(gwc, fl0, train)
        gev = GEVHourglass(8, dtype=self.dtype,
                           name="cost_agg")(gwc, features, train)

        prob = jax.nn.softmax(
            nn.Conv(1, (3, 3, 3), use_bias=False, dtype=self.dtype,
                    name="classifier")(gev)[..., 0].astype(jnp.float32),
            axis=1)
        init_disp = ops.disparity_regression(prob, d4)  # quarter-res units

        cnet_out = MultiBasicEncoder(self.hidden_dims, self.hidden_dims,
                                     norm="batch", dtype=self.dtype,
                                     name="cnet")(img1)
        nets = tuple(jnp.tanh(h) for h, _ in cnet_out)  # fine→coarse
        contexts = []
        for i, (_, c) in enumerate(cnet_out):
            c = nn.relu(c)
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr_{i}")(c)
            contexts.append(tuple(jnp.split(z, 3, axis=-1)))
        contexts = tuple(contexts)

        # pyramids for the combined lookup. Values are held in the model
        # dtype (bf16 halves the per-iteration hat-contraction HBM
        # traffic; sample positions and interpolation weights stay f32 —
        # ops/sampling.py); dtype=None keeps the exact f32 path parity
        # tests and goldens run on.
        lkdt = self.dtype or jnp.float32
        geo_vol = jnp.moveaxis(gev, 1, 3).astype(lkdt)  # [B,H,W,D,8]
        geo_pyr = tuple(build_volume_pyramid(geo_vol, self.corr_levels))
        band_offs = ()
        if self.corr_impl == "banded":
            # eval: band reach = the model's own max_disp (the GEV's
            # reach) + margin, clamped to the map width; TRAIN uses the
            # full width (the cap degrades optimization — RAFT's 120-step
            # golden trains to EPE 2.78 full vs 4.38 capped). NOTE: the
            # reference's corr pyramid is all-pairs — eval lookups beyond
            # max_disp + band_margin read zero; corr_impl='reg' restores
            # uncapped behavior everywhere.
            db = band_d_max(None if train else d4, match_left.shape[2])
            m4 = max(self.band_margin // 4, 1)
            band_offs = band_offsets(self.corr_levels, db,
                                     self.corr_radius, m4)
            corr_pyr = build_corr_band_pyramid(
                match_left.astype(lkdt),
                match_right.astype(lkdt), self.corr_levels, db,
                self.corr_radius, m4, normalize=False)
            corr_pyr = tuple(c.astype(lkdt) for c in corr_pyr)
        else:
            corr = all_pairs_correlation(match_left.astype(jnp.float32),
                                         match_right.astype(jnp.float32),
                                         normalize=False)
            corr_pyr = tuple(build_corr_pyramid(corr, self.corr_levels))

        b, h4, w4 = match_left.shape[0], match_left.shape[1], \
            match_left.shape[2]
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))

        emit = jnp.ones((iters,), bool) if train else \
            jnp.arange(iters) == iters - 1
        step = nn.scan(
            _IGEVStep,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 5,
            out_axes=0,
            length=iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          band_offs=band_offs, skip_unemitted=not train,
          dtype=self.dtype, name="step")
        (nets, disp), disp_ups = step((nets, init_disp), emit, geo_pyr,
                                      corr_pyr, contexts, x0, stem_2x)

        if not train:
            return disp_ups[-1]

        # init-disp superpixel upsample (train only, igev_stereo.py:217-221)
        # spx_4 is Sequential(BasicConv_IN, Conv, IN, ReLU)
        # (igev_stereo.py:136-140)
        xspx = BasicConvIN(24, 3, 1, dtype=self.dtype, name="spx_4")(fl0)
        xspx = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                       dtype=self.dtype, name="spx_4b")(xspx)
        xspx = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, epsilon=1e-5,
                            name="spx_4n")(xspx)
        xspx = nn.relu(xspx)
        xspx = Conv2x(32, deconv=True, instance_norm=True, dtype=self.dtype,
                      name="spx_2")(xspx, stem_2x)
        spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=self.dtype, name="spx")(xspx)
        spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
        init_up = ops.context_upsample(init_disp * 4.0, spx)
        return init_up, [disp_ups[i] for i in range(iters)]
