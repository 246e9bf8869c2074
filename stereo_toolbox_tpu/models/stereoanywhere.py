"""StereoAnywhere (CVPR'25) — volume-level fusion of stereo and mono priors.

TPU-native re-design of models/StereoAnywhere/stereoanywhere.py:
  * frozen DepthAnythingV2 mono depths, jointly normalized to [0,1]
    (stereoanywhere.py:122-127);
  * normal-map correlation volume from mono depth gradients
    (utils.py:73-77, ×1.73 — stereoanywhere.py:167-168);
  * depth-binned masks gate the stereo all-pairs volume; both volumes are
    aggregated by mono-guided 3D hourglasses over (H, W, W')
    (stereoanywhere.py:170-201, hourglass.py — compacted here to a 2-level
    gated encoder-decoder);
  * soft-argmax left/right disparities + entropy confidences + soft LRC
    (utils.py:112-198) feed a confidence-weighted least-squares scale/shift
    of the mono depth (stereoanywhere.py:218-229), which initializes the
    RAFT recurrence (stereoanywhere.py:293-294);
  * GRU loop with DUAL lookups into the aggregated stereo and mono volumes
    (stereoanywhere.py:299-325).

Deviations (documented): the train-time volume-corruption augmentations
(stereoanywhere.py:249-283) and the handcrafted mirror detector / volume
truncation (:233-237) are not reproduced. Deformable conv is available
(nn/dcn.py `DeformableConv2d`, ops/dcn.py, switchable via
``BasicConvBN(dcn=True)``) with the same off-by-default semantics as the
reference — no reference config ever passes ``dcn=True``
(StereoAnywhere/submodule.py:44-47 has no enabling call site).
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
from stereo_toolbox_tpu.models.raft_stereo import (IMAGENET_MEAN,
                                                   IMAGENET_STD,
                                                   BasicEncoder,
                                                   MultiBasicEncoder)
from stereo_toolbox_tpu.nn.gru import ConvGRU, pool2x
from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         build_corr_pyramid, corr_lookup_1d)


def estimate_normals(depth: jax.Array, gain: float) -> jax.Array:
    """Pseudo normals from depth gradients (utils.py:73-77). [B,H,W]→[B,H,W,3]."""
    d = depth * gain
    gx = jnp.pad(d[:, :, 2:] - d[:, :, :-2], ((0, 0), (0, 0), (1, 1))) / 2
    gy = jnp.pad(d[:, 2:] - d[:, :-2], ((0, 0), (1, 1), (0, 0))) / 2
    n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def generate_masks(mde: jax.Array, n: int) -> jax.Array:
    """Depth-bin masks (utils.py:48-54). [B,H,W]→[B,N,H,W]."""
    i = jnp.arange(n, dtype=mde.dtype)[None, :, None, None]
    m = mde[:, None]
    return ((m >= i / n) & (m < (i + 1) / n)).astype(mde.dtype)


def estimate_left_disparity(vol: jax.Array) -> jax.Array:
    """Soft-argmax over W' → left disparity (utils.py:112-131). [B,H,W,W']."""
    w2 = vol.shape[3]
    prob = jax.nn.softmax(vol, axis=3)
    match = (prob * jnp.arange(w2, dtype=vol.dtype)).sum(3)
    x = jnp.arange(vol.shape[2], dtype=vol.dtype)[None, None, :]
    return x - match


def estimate_right_disparity(vol: jax.Array) -> jax.Array:
    """utils.py:133-152."""
    w1 = vol.shape[2]
    prob = jax.nn.softmax(vol, axis=2)
    match = (prob * jnp.arange(w1, dtype=vol.dtype)[:, None]).sum(2)
    x = jnp.arange(vol.shape[3], dtype=vol.dtype)[None, None, :]
    return match - x


def entropy_confidence(vol: jax.Array, axis: int) -> jax.Array:
    """1 - normalized entropy (utils.py:154-170)."""
    prob = jax.nn.softmax(vol, axis=axis)
    ent = -(prob * jnp.log2(prob + 1e-6)).sum(axis)
    return 1.0 - ent / math.log2(vol.shape[axis])


def softlrc(disp2, disp3, lrc_th: float = 1.0):
    """Soft left-right consistency weights (utils.py:189-198)."""
    from stereo_toolbox_tpu.ops.sampling import bilinear_sampler, coords_grid
    b, h, w = disp2.shape
    div = math.log(1 + math.exp(lrc_th))
    grid = coords_grid(b, h, w)
    # warp disp3 into the left view (sample right at x - d2)
    c2 = grid.at[..., 0].add(-jnp.maximum(disp2, 0))
    warped3 = bilinear_sampler(disp3[..., None], c2)[..., 0]
    # warp disp2 into the right view (sample left at x + d3)
    c3 = grid.at[..., 0].add(jnp.maximum(disp3, 0))
    warped2 = bilinear_sampler(disp2[..., None], c3)[..., 0]
    s2 = jax.nn.softplus(-jnp.abs(disp2 - warped3) + lrc_th) / div
    s3 = jax.nn.softplus(-jnp.abs(disp3 - warped2) + lrc_th) / div
    return s2, s3


def weighted_lsq(mde, disp, conf):
    """Confidence-weighted scale/shift (stereoanywhere.py:223-229).
    mde/disp/conf: [B, H, W] (already pooled over views by concatenation).
    The 2×2 solve must run in f32 — XLA's LuDecomposition has no bf16
    kernel on TPU (seen as a compile failure at bench time)."""
    def per_image(m, d, c):
        w = c.reshape(-1).astype(jnp.float32)
        x = m.reshape(-1).astype(jnp.float32)
        y = d.reshape(-1).astype(jnp.float32)
        sw = w.sum() + 1e-6
        sx = (w * x).sum()
        sxx = (w * x * x).sum() + 1e-6
        sy = (w * y).sum()
        sxy = (w * x * y).sum()
        a = jnp.array([[sxx, sx], [sx, sw]])
        bb = jnp.array([sxy, sy])
        p = jnp.linalg.solve(a, bb)
        return p[0], p[1]

    s, t = jax.vmap(per_image)(mde, disp, conf)
    return s[:, None, None], t[:, None, None]


class VolumeHourglass(nn.Module):
    """Mono-guided 3D hourglass over a (H, W, W') volume
    (compacted from models/StereoAnywhere/hourglass.py)."""
    features: int = 8
    out_channels: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, vol, fl, fr, train: bool = False):
        # vol: [B, H, W, W', 1]; fl/fr: [B, H, W] mono depths at volume res
        dt = self.dtype
        gate_in = jnp.concatenate(
            [jnp.broadcast_to(fl[..., None, None], vol.shape[:4] + (1,)),
             jnp.broadcast_to(fr[:, :, None, :, None],
                              vol.shape[:4] + (1,))], -1)
        gate = jax.nn.sigmoid(nn.Conv(self.features, (1, 1, 1),
                                      dtype=dt)(gate_in))
        x = BasicConvBN(self.features, 3, 1, dtype=dt)(vol, train) * gate
        d1 = BasicConvBN(self.features * 2, 3, 2, dtype=dt)(x, train)
        d1 = BasicConvBN(self.features * 2, 3, 1, dtype=dt)(d1, train)
        d2 = BasicConvBN(self.features * 4, 3, 2, dtype=dt)(d1, train)
        d2 = BasicConvBN(self.features * 4, 3, 1, dtype=dt)(d2, train)
        u1 = BasicConvBN(self.features * 2, 4, 2, deconv=True,
                         dtype=dt)(d2, train)
        u1 = BasicConvBN(self.features * 2, 3, 1, dtype=dt)(
            u1 + d1, train)
        u0 = BasicConvBN(self.features, 4, 2, deconv=True,
                         dtype=dt)(u1, train)
        u0 = BasicConvBN(self.features, 3, 1, dtype=dt)(u0 + x, train)
        return nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                       use_bias=False, dtype=dt)(u0)


class DualMotionEncoder(nn.Module):
    """Motion features from stereo + mono lookups (StereoAnywhere update)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, flow, corr_s, corr_m):
        dt = self.dtype

        def enc(c, tag):
            c = nn.relu(nn.Conv(64, (1, 1), dtype=dt, name=f"c1{tag}")(c))
            return nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                                   name=f"c2{tag}")(c))

        cs = enc(corr_s, "s")
        cm = enc(corr_m, "m")
        f = nn.relu(nn.Conv(64, (7, 7), padding="SAME", dtype=dt)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=dt)(f))
        out = nn.relu(nn.Conv(126, (3, 3), padding="SAME", dtype=dt)(
            jnp.concatenate([cs, cm, f], -1)))
        return jnp.concatenate([out, flow], -1)


class _SAStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    factor: int
    # eval: upsample only the emitted (last) iteration
    # (stereoanywhere.py:318-319)
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, pyr_s, pyr_m, contexts, x0):
        nets, flow_x = carry
        flow_x = jax.lax.stop_gradient(flow_x)
        corr_s = corr_lookup_1d(pyr_s, x0 + flow_x, self.corr_radius)
        corr_m = corr_lookup_1d(pyr_m, x0 + flow_x, self.corr_radius)
        flow = jnp.stack([flow_x, jnp.zeros_like(flow_x)], -1)

        net08, net16, net32 = nets
        ctx08, ctx16, ctx32 = contexts
        if self.n_gru_layers == 3:
            net32 = ConvGRU(self.hidden_dims[0], dtype=self.dtype,
                            name="gru32")(net32, pool2x(net16), ctx32)
        if self.n_gru_layers >= 2:
            x16 = [pool2x(net08)]
            if self.n_gru_layers > 2:
                x16.append(ops.interpolate(net32, net16.shape[1:3], (1, 2),
                                           align_corners=True))
            net16 = ConvGRU(self.hidden_dims[1], dtype=self.dtype,
                            name="gru16")(net16, jnp.concatenate(x16, -1),
                                          ctx16)
        motion = DualMotionEncoder(dtype=self.dtype, name="encoder")(
            flow, corr_s, corr_m)
        x08 = [motion]
        if self.n_gru_layers > 1:
            x08.append(ops.interpolate(net16, net08.shape[1:3], (1, 2),
                                       align_corners=True))
        net08 = ConvGRU(self.hidden_dims[2], dtype=self.dtype,
                        name="gru08")(net08, jnp.concatenate(x08, -1), ctx08)

        d = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="flow_head_1")(net08))
        delta = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                        name="flow_head_2")(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="mask_1")(net08))
        mask = 0.25 * nn.Conv(self.factor ** 2 * 9, (1, 1),
                              dtype=self.dtype, name="mask_2")(m)
        flow_x = flow_x + delta[..., 0]

        def blend(fx, mk):
            return ops.convex_upsample(-fx.astype(jnp.float32),
                                       mk.astype(jnp.float32), self.factor)

        if not self.skip_unemitted:
            disp_up = blend(flow_x, mask)
        else:
            b, hh, ww = flow_x.shape
            disp_up = jax.lax.cond(
                emit, blend,
                lambda fx, mk: jnp.zeros(
                    (b, hh * self.factor, ww * self.factor), jnp.float32),
                flow_x, mask)
        return ((net08, net16, net32), flow_x), disp_up


class StereoAnywhere(nn.Module):
    encoder: str = "vits"
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    n_downsample: int = 2
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    vol_n_masks: int = 8
    normal_gain: int = 10
    # trilinear (H, W, W') volume downsampling factor 2^k — the reference's
    # high-res memory valve (stereoanywhere.py:173-205)
    vol_downsample: int = 0
    lrc_th: float = 1.0
    init_disparity_zero: bool = False
    imagenet_norm_input: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        factor = 2 ** self.n_downsample
        b, h, w, _ = left.shape
        h4, w4 = h // factor, w // factor
        dt = self.dtype
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        if self.imagenet_norm_input:
            img1 = 2.0 * (left * std + mean) - 1.0
            img2 = 2.0 * (right * std + mean) - 1.0
        else:
            img1, img2 = left, right

        # --- frozen mono branch ------------------------------------------
        rh = -(-h // PATCH) * PATCH
        rw = -(-w // PATCH) * PATCH
        danv2 = DepthAnythingV2(self.encoder, dtype=dt, name="mono_model")
        both = jnp.concatenate([left, right], 0)
        depths = danv2(ops.interpolate(both, (rh, rw), (1, 2),
                                       align_corners=False))
        depths = jax.lax.stop_gradient(
            ops.interpolate(depths, (h, w), (1, 2), align_corners=False))
        dmin, dmax = depths.min(), depths.max()
        depths = (depths - dmin) / (dmax - dmin + 1e-6)
        mde2, mde3 = depths[:b], depths[b:]
        mde2_low = ops.interpolate(mde2, (h4, w4), (1, 2),
                                   align_corners=True)
        mde3_low = ops.interpolate(mde3, (h4, w4), (1, 2),
                                   align_corners=True)

        # --- context from the mono depth (stereoanywhere.py:148) ----------
        mde_rgb = jnp.repeat(mde2[..., None], 3, axis=-1)
        cnet_out = MultiBasicEncoder(self.hidden_dims, self.hidden_dims,
                                     norm="batch", dtype=dt,
                                     name="cnet")(mde_rgb)
        nets = tuple(jnp.tanh(hh) for hh, _ in cnet_out)
        contexts = []
        for i, (_, cc) in enumerate(cnet_out):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=dt, name=f"context_zqr_{i}")(nn.relu(cc))
            contexts.append(tuple(jnp.split(z, 3, axis=-1)))
        contexts = tuple(contexts)

        # --- volumes -------------------------------------------------------
        fnet = BasicEncoder(256, "instance", dtype=dt, name="fnet")
        fmap2 = fnet(img1).astype(jnp.float32)
        fmap3 = fnet(img2).astype(jnp.float32)
        vol_s = all_pairs_correlation(fmap2, fmap3)  # [B, H4, W4, W4]

        n2 = estimate_normals(mde2_low, w4 / self.normal_gain)
        n3 = estimate_normals(mde3_low, w4 / self.normal_gain)
        vol_m = 1.73 * all_pairs_correlation(n2, n3)

        masks_l = generate_masks(mde2_low, self.vol_n_masks)
        masks_r = generate_masks(mde3_low, self.vol_n_masks)
        gate = jnp.einsum("bnhw,bnhv->bhwv", masks_l, masks_r)
        masked_s = vol_s * gate

        # optional trilinear volume downsampling for high resolution
        # (stereoanywhere.py:173-205 `vol_downsample`) — the reference's own
        # memory valve, upsampled back after aggregation
        hd, wd, vd = h4, w4, w4
        feats_lo = (mde2_low, mde3_low)
        if self.vol_downsample > 0:
            s = 2 ** self.vol_downsample
            hd, wd, vd = h4 // s, w4 // s, w4 // s
            masked_s = ops.interpolate(masked_s, (hd, wd, vd), (1, 2, 3),
                                       align_corners=True)
            vol_m = ops.interpolate(vol_m, (hd, wd, vd), (1, 2, 3),
                                    align_corners=True)
            feats_lo = tuple(
                ops.interpolate(f, (hd, wd), (1, 2), align_corners=True)
                for f in feats_lo)

        agg_s = VolumeHourglass(8, 1, dtype=dt, name="hourglass_stereo")(
            masked_s[..., None], *feats_lo, train)[..., 0]
        agg_m2 = VolumeHourglass(8, 2, dtype=dt, name="hourglass_mono")(
            vol_m[..., None], *feats_lo, train)
        agg_m, conf_m = agg_m2[..., 0], agg_m2[..., 1]
        if self.vol_downsample > 0:
            agg_s = ops.interpolate(agg_s, (h4, w4, w4), (1, 2, 3),
                                    align_corners=True)
            agg_m = ops.interpolate(agg_m, (h4, w4, w4), (1, 2, 3),
                                    align_corners=True)
            conf_m = ops.interpolate(conf_m, (h4, w4, w4), (1, 2, 3),
                                     align_corners=True)

        # --- coarse disparities + confidences + scale/shift ---------------
        disp2_m = estimate_left_disparity(agg_m)
        disp3_m = estimate_right_disparity(agg_m)
        conf2 = entropy_confidence(conf_m, 3)
        conf3 = entropy_confidence(conf_m, 2)
        s2, s3 = softlrc(disp2_m, disp3_m, self.lrc_th)
        c2 = conf2 * s2
        c3 = conf3 * s3
        scale, shift = weighted_lsq(
            jnp.concatenate([mde2_low, mde3_low], 1),
            jnp.concatenate([disp2_m, disp3_m], 1),
            jnp.concatenate([c2, c3], 1))
        scaled_mde2_low = scale * mde2_low + shift

        pyr_s = tuple(build_corr_pyramid(agg_s.astype(jnp.float32),
                                         self.corr_levels))
        pyr_m = tuple(build_corr_pyramid(agg_m.astype(jnp.float32),
                                         self.corr_levels))

        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))
        flow_x = (jnp.zeros((b, h4, w4), jnp.float32)
                  if self.init_disparity_zero
                  else -jnp.maximum(scaled_mde2_low.astype(jnp.float32), 0))

        emit = jnp.ones((iters,), bool) if train else \
            jnp.arange(iters) == iters - 1
        step = nn.scan(
            _SAStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 4,
            out_axes=0, length=iters,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius, factor,
          skip_unemitted=not train, dtype=dt, name="step")
        (nets, flow_x), ups = step((nets, flow_x), emit, pyr_s, pyr_m,
                                   contexts, x0)

        if train:
            return [ups[i] for i in range(iters)]
        return ups[-1]
