"""Selective-Stereo (CVPR'24): SelectiveRAFT and SelectiveIGEV.

TPU-native re-design of models/SelectiveStereo/:
  * CAM channel attention on the context features and SAM spatial attention
    maps (SelectiveIGEV/update.py:16-45), computed once before the loop
    (raft.py:139-141 / igev_stereo.py:226-228);
  * SelectiveConvGRU: per-pixel blend of a 1×1-kernel and a 3×3-kernel GRU,
    ``h = small*att + large*(1-att)`` (SelectiveIGEV/update.py:61-71);
  * the context features are concatenated into the GRU inputs directly
    (no zqr gate biases — update.py:156-171);
  * SelectiveRAFT keeps RAFT's corr pyramid + convex upsampling with a
    1-channel disparity state; SelectiveIGEV keeps IGEV's GEV + superpixel
    upsampling. Both train with the positive-left disparity convention (the
    reference's SelectiveRAFT train path returns un-negated values,
    raft.py:166-170 — an inconsistency we do not reproduce).

Contracts: SelectiveRAFT train → list of maps; SelectiveIGEV train →
``(init_disp, [maps])``; eval → final map.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.nn.gru import pool2x
from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN, BasicConvIN, \
    Conv2x, IGEVFeature
from stereo_toolbox_tpu.nn.layers import FeatureAtt
from stereo_toolbox_tpu.models.raft_stereo import (IMAGENET_MEAN,
                                                   IMAGENET_STD,
                                                   BasicEncoder,
                                                   MultiBasicEncoder)
from stereo_toolbox_tpu.models.igev_stereo import (GEVHourglass,
                                                   combined_geo_lookup)
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         band_d_max, band_offsets,
                                         build_corr_band_pyramid,
                                         build_corr_pyramid,
                                         build_volume_pyramid,
                                         corr_lookup_1d,
                                         corr_lookup_1d_banded)


class ChannelAttentionEnhancement(nn.Module):
    """CAM (SelectiveIGEV/update.py:16-31)."""
    ratio: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False,
                      dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc2")
        avg = x.mean(axis=(1, 2), keepdims=True)
        mx = x.max(axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)


class SpatialAttentionExtractor(nn.Module):
    """SAM (SelectiveIGEV/update.py:33-45)."""
    kernel_size: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = nn.Conv(1, (self.kernel_size, self.kernel_size), padding="SAME",
                    use_bias=False, dtype=self.dtype)(h)
        return jax.nn.sigmoid(h)


class RaftConvGRU(nn.Module):
    """Plain conv GRU with kernel size k (SelectiveIGEV/update.py:47-59)."""
    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        from stereo_toolbox_tpu.nn.gru import Conv2dParams, fused_gate_conv
        k = (self.kernel_size, self.kernel_size)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = fused_gate_conv(
            hx, [Conv2dParams(self.hidden_dim, k, name="convz"),
                 Conv2dParams(self.hidden_dim, k, name="convr")],
            dtype=self.dtype)
        z = jax.nn.sigmoid(z)
        r = jax.nn.sigmoid(r)
        q = jnp.tanh(nn.Conv(self.hidden_dim, k, padding="SAME",
                             dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SelectiveConvGRU(nn.Module):
    """att-blended small/large-kernel GRU (SelectiveIGEV/update.py:61-71)."""
    hidden_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, att: jax.Array, h: jax.Array,
                 x: jax.Array) -> jax.Array:
        small = RaftConvGRU(self.hidden_dim, 1, dtype=self.dtype,
                            name="small_gru")(h, x)
        large = RaftConvGRU(self.hidden_dim, 3, dtype=self.dtype,
                            name="large_gru")(h, x)
        return small * att + large * (1 - att)


class SelectiveMotionEncoder(nn.Module):
    """1-channel disparity motion encoder (SelectiveRAFT/update.py:73-94)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp: jax.Array, corr: jax.Array) -> jax.Array:
        c = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(c))
        d = nn.relu(nn.Conv(64, (7, 7), padding="SAME",
                            dtype=self.dtype)(disp))
        d = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(d))
        out = nn.relu(nn.Conv(127, (3, 3), padding="SAME", dtype=self.dtype)(
            jnp.concatenate([c, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)


class SelectiveUpdateBlock(nn.Module):
    """BasicSelectiveMultiUpdateBlock (SelectiveIGEV/update.py:222-259).

    `head` selects the output adapter: 'convex' (RAFT-style up-mask) or
    'superpixel' (IGEV-style 32-ch mask features).
    """
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    head: str = "superpixel"
    factor: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, nets, inps, atts, corr, disp):
        net04, net08, net16 = nets
        inp04, inp08, inp16 = inps
        att04, att08, att16 = atts
        if self.n_gru_layers == 3:
            x16 = jnp.concatenate([inp16, pool2x(net08)], axis=-1)
            net16 = SelectiveConvGRU(self.hidden_dims[0], dtype=self.dtype,
                                     name="gru16")(att16, net16, x16)
        if self.n_gru_layers >= 2:
            x08 = [inp08, pool2x(net04)]
            if self.n_gru_layers > 2:
                x08.append(ops.interpolate(net16, net08.shape[1:3], (1, 2),
                                           align_corners=True))
            net08 = SelectiveConvGRU(self.hidden_dims[1], dtype=self.dtype,
                                     name="gru08")(
                att08, net08, jnp.concatenate(x08, axis=-1))
        motion = SelectiveMotionEncoder(dtype=self.dtype,
                                        name="encoder")(disp, corr)
        x04 = [inp04, motion]
        if self.n_gru_layers > 1:
            x04.append(ops.interpolate(net08, net04.shape[1:3], (1, 2),
                                       align_corners=True))
        net04 = SelectiveConvGRU(self.hidden_dims[2], dtype=self.dtype,
                                 name="gru04")(
            att04, net04, jnp.concatenate(x04, axis=-1))

        d = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="disp_head_1")(net04))
        delta_disp = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                             name="disp_head_2")(d)
        if self.head == "convex":
            m = nn.relu(nn.Conv(256, (3, 3), padding="SAME",
                                dtype=self.dtype, name="mask_1")(net04))
            mask = 0.25 * nn.Conv(self.factor ** 2 * 9, (1, 1),
                                  dtype=self.dtype, name="mask_2")(m)
        else:
            mask = 0.25 * nn.relu(
                nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                        name="mask_feat_4")(net04))
        return (net04, net08, net16), mask, delta_disp


def _cam_sam_context(cnet_out, dtype):
    """inp = cam(inp)*inp; att = sam(inp) — shared CAM/SAM modules applied
    per scale (raft.py:139-141)."""
    cam = ChannelAttentionEnhancement(dtype=dtype, name="cam")
    sam = SpatialAttentionExtractor(dtype=dtype, name="sam")
    nets, inps, atts = [], [], []
    for h, c in cnet_out:
        nets.append(jnp.tanh(h))
        i = nn.relu(c)
        i = cam(i) * i
        inps.append(i)
        atts.append(sam(i))
    return tuple(nets), tuple(inps), tuple(atts)


class _SelectiveRAFTStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    factor: int
    band_offs: tuple = ()  # static — () selects the full-pyramid lookup
    # eval: upsample only the emitted (last) iteration (raft.py:159-160)
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, pyramid, inps, atts, x0):
        nets, disp = carry  # disp: signed offset (coords1 - coords0)
        disp = jax.lax.stop_gradient(disp)
        if self.band_offs:
            corr = corr_lookup_1d_banded(pyramid, x0 + disp,
                                         self.band_offs, self.corr_radius)
        else:
            corr = corr_lookup_1d(pyramid, x0 + disp, self.corr_radius)
        nets, mask, delta = SelectiveUpdateBlock(
            self.hidden_dims, self.n_gru_layers, "convex", self.factor,
            dtype=self.dtype, name="update_block")(
                nets, inps, atts, corr, disp[..., None])
        disp = disp + delta[..., 0]

        def blend(d, m):
            return ops.convex_upsample(-d.astype(jnp.float32),
                                       m.astype(jnp.float32), self.factor)

        if not self.skip_unemitted:
            disp_up = blend(disp, mask)
        else:
            b, h, w = disp.shape
            disp_up = jax.lax.cond(
                emit, blend,
                lambda d, m: jnp.zeros(
                    (b, h * self.factor, w * self.factor), jnp.float32),
                disp, mask)
        return (nets, disp), disp_up


class SelectiveRAFT(nn.Module):
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    n_downsample: int = 2
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    imagenet_norm_input: bool = True
    # disparity-banded relative corr volumes by default (ops/corr.py).
    # CAVEAT: lookups beyond band_max_disp + band_margin (224 full-res px
    # by default) read zero correlation where the reference's all-pairs
    # volume would not — large-disparity scenes deviate from imported-
    # checkpoint behavior. band_max_disp=None derives full coverage from
    # the image width (exact everywhere); corr_impl='reg' matches the
    # reference's uncapped pyramid.
    corr_impl: str = "banded"
    band_max_disp: int | None = 192
    band_margin: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        factor = 2 ** self.n_downsample
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        if self.imagenet_norm_input:
            img1 = 2.0 * (left * std + mean) - 1.0
            img2 = 2.0 * (right * std + mean) - 1.0
        else:
            img1, img2 = left, right

        fnet = BasicEncoder(256, "instance", dtype=self.dtype, name="fnet")
        fmap1 = fnet(img1).astype(jnp.float32)
        fmap2 = fnet(img2).astype(jnp.float32)
        cnet_out = MultiBasicEncoder(self.hidden_dims, self.hidden_dims,
                                     norm="batch", dtype=self.dtype,
                                     name="cnet")(img1)
        nets, inps, atts = _cam_sam_context(cnet_out, self.dtype)

        band_offs = ()
        if self.corr_impl == "banded":
            # train uses the full-width band — see RAFTStereo
            d4 = band_d_max(
                None if (train or self.band_max_disp is None)
                else max(self.band_max_disp // factor, 1), fmap1.shape[2])
            m4 = max(self.band_margin // factor, 1)
            band_offs = band_offsets(self.corr_levels, d4,
                                     self.corr_radius, m4)
            # bf16 bands in the model dtype — see RAFTStereo
            lkdt = self.dtype or jnp.float32
            pyramid = build_corr_band_pyramid(
                fmap1.astype(lkdt), fmap2.astype(lkdt), self.corr_levels,
                d4, self.corr_radius, m4)
            pyramid = tuple(c.astype(lkdt) for c in pyramid)
        else:
            corr = all_pairs_correlation(fmap1, fmap2)
            pyramid = tuple(build_corr_pyramid(corr, self.corr_levels))

        b, h4, w4 = fmap1.shape[:3]
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))
        disp = jnp.zeros((b, h4, w4), jnp.float32)

        emit = jnp.ones((iters,), bool) if train else \
            jnp.arange(iters) == iters - 1
        step = nn.scan(
            _SelectiveRAFTStep,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 4,
            out_axes=0,
            length=iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius, factor,
          band_offs=band_offs, skip_unemitted=not train,
          dtype=self.dtype, name="step")
        (nets, disp), disp_ups = step((nets, disp), emit, pyramid, inps,
                                      atts, x0)

        if train:
            return [disp_ups[i] for i in range(iters)]
        return disp_ups[-1]


class _SelectiveIGEVStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    band_offs: tuple = ()  # static — () selects the full-pyramid lookup
    # eval: upsample only the emitted (last) iteration (igev_stereo.py:242)
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
            spx = spxc(spx2(mask_feat, stem_2x))
            spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
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
                emit,
                lambda m, s, d: upsample(m, s, d),
                lambda m, s, d: zero_full,
                mask_feat, stem_2x, disp)
        return (nets, disp), disp_up


class SelectiveIGEV(nn.Module):
    hidden_dims: Sequence[int] = (128, 128, 128)
    max_disp: int = 192
    corr_levels: int = 2
    corr_radius: int = 4
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
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
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        if self.imagenet_norm_input:
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
        stem_4a = BasicConvIN(48, 3, 2, dtype=self.dtype, name="stem_4a")
        stem_4b = nn.Conv(48, (3, 3), padding="SAME", use_bias=False,
                          dtype=self.dtype, name="stem_4b")

        def inorm(x, name):
            return nn.relu(nn.GroupNorm(num_groups=None, group_size=1,
                                        use_bias=False, use_scale=False,
                                        epsilon=1e-5, name=name)(x))

        stem_2x = inorm(stem_2b(stem_2a(img1)), "stem_2n")
        stem_4x = inorm(stem_4b(stem_4a(stem_2x)), "stem_4n")
        stem_2y = inorm(stem_2b(stem_2a(img2)), "stem_2n2")
        stem_4y = inorm(stem_4b(stem_4a(stem_2y)), "stem_4n2")

        fl0 = jnp.concatenate([fl[0], stem_4x], axis=-1)
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
        init_disp = ops.disparity_regression(prob, d4)

        cnet_out = MultiBasicEncoder(self.hidden_dims, self.hidden_dims,
                                     norm="batch", dtype=self.dtype,
                                     name="cnet")(img1)
        nets, inps, atts = _cam_sam_context(cnet_out, self.dtype)

        # lookup pyramids in the model dtype (bf16 halves per-iteration
        # HBM traffic; positions/weights stay f32 — ops/sampling.py);
        # dtype=None keeps the exact f32 parity/golden path
        lkdt = self.dtype or jnp.float32
        geo_vol = jnp.moveaxis(gev, 1, 3).astype(lkdt)
        geo_pyr = tuple(build_volume_pyramid(geo_vol, self.corr_levels))
        # IGEV-style corr is unnormalized (SelectiveIGEV/geometry.py:60-68)
        band_offs = ()
        if self.corr_impl == "banded":
            # eval: capped at max_disp + margin; train: full width (the
            # cap degrades optimization — see RAFTStereo)
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

        b, h4, w4 = match_left.shape[:3]
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))

        emit = jnp.ones((iters,), bool) if train else \
            jnp.arange(iters) == iters - 1
        step = nn.scan(
            _SelectiveIGEVStep,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 6,
            out_axes=0,
            length=iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          band_offs=band_offs, skip_unemitted=not train,
          dtype=self.dtype, name="step")
        (nets, disp), disp_ups = step((nets, init_disp), emit, geo_pyr,
                                      corr_pyr, inps, atts, x0, stem_2x)

        if not train:
            return disp_ups[-1]

        # spx_4 is Sequential(BasicConv_IN, Conv, IN, ReLU)
        # (SelectiveIGEV/igev_stereo.py:135-140)
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
