"""StereoAnywhere (CVPR'25) — stereo branch fused with a frozen DAv2 mono
branch at the volume level.

Faithful TPU-native rebuild of models/StereoAnywhere/stereoanywhere.py
(round 5 — replaces the round-4 compacted hourglass so published
checkpoints import and pixelwise parity holds):
  * frozen DAv2 mono depths via the MiDaS 'lower_bound' 518-snap resize
    (depth_anything_v2/dpt.py:188-238, exact torch-bicubic kernel) and a
    global min/max normalization over both views;
  * normal-map mono correlation volume (utils.py:73-77, 271-284) and a
    plain stereo correlation volume from RAFT-style fnet features;
  * per-depth-bin masked volumes: ``vol · mask_l[n] ⊗ mask_r[n]`` gives an
    8-channel (H, W, W') volume (stereoanywhere.py:192);
  * `Hourglass` aggregation over the (W', H, W) permutation with
    `DoubleFeatureAtt` gates from a 4-scale mono-depth pyramid
    (hourglass.py:13-104, submodule.py:113-140) — instance-norm BasicConv
    (LeakyReLU) throughout;
  * disparity/confidence classifiers, entropy confidences, softLRC with
    the reference's (W−1)/W grid-sample scale (utils.py:174-200), the
    quantile-masked weighted least squares scale/shift (utils.py:345-384),
    and the handcrafted mirror detector + volume truncation
    (utils.py:225-270, `use_truncate_vol=True` default);
  * RAFT-style GRU refinement over BOTH corr pyramids (truncated stereo +
    aggregated mono) with a shared motion-conv encoder (update.py:64-91)
    and convex upsampling.

Inputs follow the reference verbatim: ``img·2 − 1`` on the toolbox's
ImageNet-normalized tensors (stereoanywhere.py:136), the mono model
consuming the un-scaled input.

Contract: train → list of `iters` full-res disparity maps; eval → final
map (the reference's auxiliary coarse outputs are exposed via
`return_aux=True`).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.depth_anything_v2 import DepthAnythingV2
from stereo_toolbox_tpu.models.raft_stereo import (BasicEncoder,
                                                   MultiBasicEncoder)
from stereo_toolbox_tpu.nn.gru import ConvGRU, pool2x
from stereo_toolbox_tpu.nn.igev_blocks import BasicConvIN
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         build_corr_pyramid, corr_lookup_1d)


# --------------------------------------------------------------------------
# utils.py ports
# --------------------------------------------------------------------------

def estimate_normals(depth: jax.Array, gain: float) -> jax.Array:
    """Pseudo normals from depth gradients (utils.py:73-77): kornia 'diff'
    central differences with replicate borders. [B,H,W]→[B,H,W,3]."""
    d = depth * gain
    dp = jnp.pad(d, ((0, 0), (1, 1), (1, 1)), mode="edge")
    gx = (dp[:, 1:-1, 2:] - dp[:, 1:-1, :-2]) / 2.0
    gy = (dp[:, 2:, 1:-1] - dp[:, :-2, 1:-1]) / 2.0
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
    """1 - normalized entropy (utils.py:154-172)."""
    prob = jax.nn.softmax(vol, axis=axis)
    ent = -(prob * jnp.log2(prob + 1e-6)).sum(axis)
    return 1.0 - ent / math.log2(vol.shape[axis])


def _disp_warp(disp: jax.Array, img: jax.Array,
               right_disp: bool = False) -> jax.Array:
    """utils.py:174-190 `disp_warping`: grid_sample align_corners=True on a
    ``2·(x±d)/W − 1`` grid — i.e. sample position ``(x±d)·(W−1)/W``, zeros
    outside. disp/img: [B, H, W]."""
    from stereo_toolbox_tpu.ops.sampling import sample_1d
    b, h, w = disp.shape
    x = jnp.arange(w, dtype=disp.dtype)[None, None, :]
    pos = (x + disp) if right_disp else (x - disp)
    pos = pos * ((w - 1) / w)
    return sample_1d(img, pos)  # img [B,H,W] sampled along W


def softlrc(disp2, disp3, lrc_th: float = 1.0):
    """Soft left-right consistency weights (utils.py:192-200)."""
    div = math.log(1 + math.exp(lrc_th))
    warped2 = _disp_warp(nn.relu(disp3), disp2, right_disp=True)
    warped3 = _disp_warp(nn.relu(disp2), disp3, right_disp=False)
    s2 = jax.nn.softplus(-jnp.abs(disp2 - warped3) + lrc_th) / div
    s3 = jax.nn.softplus(-jnp.abs(disp3 - warped2) + lrc_th) / div
    return s2, s3


def fuzzy_and(x, y):
    return x * y


def fuzzy_or(x, y):
    return x + y - x * y


def mirror_detector(stereo_disp, mono_disp, stereo_conf, mono_conf,
                    conf_th: float = 0.5, step_gain: float = 20.0):
    """handcrafted_mirror_detector (utils.py:255-270)."""
    both = fuzzy_and(stereo_conf, mono_conf)
    mono_near = jax.nn.sigmoid(step_gain * (mono_disp - stereo_disp))
    a = fuzzy_and(both, mono_near)
    b = fuzzy_and(1.0 - stereo_conf, mono_conf)
    better = fuzzy_or(a, b)
    return jax.nn.sigmoid(step_gain * (better - conf_th))


def truncate_corr_volume(disp_left, conf_left,
                         attenuation_gain: float = 0.9) -> jax.Array:
    """truncate_corr_volume_v2 (utils.py:225-253, conf_th=None path):
    attenuate matches right of the expected correspondence. [B,H,W] →
    [B,H,W,W']."""
    b, h, w = disp_left.shape
    x = jnp.arange(w, dtype=disp_left.dtype)[None, None, :, None]
    dv = jnp.arange(w, dtype=disp_left.dtype)[None, None, None, :]
    center = x - disp_left[..., None]
    t = center - dv
    conf = conf_left[..., None]
    return (1.0 - conf) + conf * (
        jax.nn.sigmoid(t) * (1.0 - attenuation_gain) + attenuation_gain)


def weighted_lsq(mde, disp, conf, min_q: float = 0.2, max_q: float = 0.9):
    """Quantile-masked, confidence-weighted least squares scale/shift
    (utils.py:345-384): minimize Σ w·(s·|mde| + t − |relu(disp)|)² with
    w = 0.9·|conf| + 0.1 over disp's [q20, q90] per image, via the normal
    equations (≡ torch.linalg.lstsq with √w-scaled rows)."""
    def per_image(m, d, c):
        d = nn.relu(d.reshape(-1).astype(jnp.float32))
        lo = jnp.quantile(d, min_q)
        hi = jnp.quantile(d, max_q)
        keep = ((d >= lo) & (d <= hi)).astype(jnp.float32)
        x = jnp.abs(m.reshape(-1).astype(jnp.float32))
        y = jnp.abs(d)
        w = (jnp.abs(c.reshape(-1).astype(jnp.float32)) * 0.9 + 0.1) * keep
        sw = w.sum() + 1e-8
        sx = (w * x).sum()
        sxx = (w * x * x).sum() + 1e-8
        sy = (w * y).sum()
        sxy = (w * x * y).sum()
        a = jnp.array([[sxx, sx], [sx, sw]])
        bb = jnp.array([sxy, sy])
        p = jnp.linalg.solve(a, bb)
        return p[0], p[1]

    s, t = jax.vmap(per_image)(mde, disp, conf)
    return s[:, None, None], t[:, None, None]


# --------------------------------------------------------------------------
# hourglass.py / submodule.py ports
# --------------------------------------------------------------------------

class DoubleFeatureAtt(nn.Module):
    """submodule.py:113-140: sigmoid gates from left/right 1-ch depth
    features, outer-product broadcast over the (W', H, W) volume, trilinear
    resize to the volume's scale."""
    cv_chan: int
    kernel: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, cv, feat_left, feat_right):
        # cv: [B, W3, H, W2, C]; feats: [B, h, w, Cf]
        cf = feat_left.shape[-1]
        mid = max(32, cf // 2)
        al = BasicConvIN(mid, self.kernel, 1, dtype=self.dtype,
                         name="left_0")(feat_left)
        al = nn.Conv(self.cv_chan, (1, 1), dtype=self.dtype,
                     name="left_1")(al)
        ar = BasicConvIN(mid, self.kernel, 1, dtype=self.dtype,
                         name="right_0")(feat_right)
        ar = nn.Conv(self.cv_chan, (1, 1), dtype=self.dtype,
                     name="right_1")(ar)
        # [B, 1, h, w, C] ⊙ [B, w, h, 1, C] → [B, w, h, w, C]
        g = jax.nn.sigmoid(al)[:, None] * \
            jax.nn.sigmoid(ar).transpose(0, 2, 1, 3)[:, :, :, None]
        if g.shape[1:4] != cv.shape[1:4]:
            g = ops.interpolate(g, cv.shape[1:4], (1, 2, 3),
                                align_corners=True)
        return g * cv


class SAHourglass(nn.Module):
    """hourglass.py Hourglass: 4-scale encoder/decoder over the permuted
    (W', H, W) volume with instance-norm BasicConvs and DoubleFeatureAtt
    at every scale. `features` are the 1-channel mono-depth pyramid maps
    at 1/4..1/32."""
    in_channels: int = 8
    out_channels: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, feats_l, feats_r):
        # x: [B, H, W2, W3, C] natural layout → permute to [B, W3, H, W2, C]
        dt = self.dtype
        x = x.transpose(0, 3, 1, 2, 4)
        original = x
        n_scales = 4
        down = []
        for i in range(n_scales - 1):
            cout = self.in_channels * 2 * (i + 1)  # 16, 32, 48
            x = BasicConvIN(cout, 3, 2, dtype=dt, name=f"down{i}_0")(x)
            x = BasicConvIN(cout, 3, 1, dtype=dt, name=f"down{i}_1")(x)
            x = DoubleFeatureAtt(cout, dtype=dt, name=f"att{i}")(
                x, feats_l[i + 1], feats_r[i + 1])
            down.append(x)

        for i in range(n_scales - 2):
            skip = down[n_scales - 3 - i]
            cout = skip.shape[-1]
            xu = ops.interpolate(x, skip.shape[1:4], (1, 2, 3),
                                 align_corners=True)
            x = jnp.concatenate([xu, skip], axis=-1)
            x = BasicConvIN(cout, 1, 1, dtype=dt, name=f"agg{i}_0")(x)
            x = BasicConvIN(cout, 3, 1, dtype=dt, name=f"agg{i}_1")(x)
            x = BasicConvIN(cout, 3, 1, dtype=dt, name=f"agg{i}_2")(x)
            x = DoubleFeatureAtt(cout, dtype=dt, name=f"att_up{i}")(
                x, feats_l[n_scales - 2 - i], feats_r[n_scales - 2 - i])

        xu = ops.interpolate(x, original.shape[1:4], (1, 2, 3),
                             align_corners=True)
        x = jnp.concatenate([original, xu], axis=-1)
        x = BasicConvIN(self.in_channels, 1, 1, dtype=dt,
                        name="final_agg_0")(x)
        x = BasicConvIN(self.in_channels, 3, 1, dtype=dt,
                        name="final_agg_1")(x)
        x = BasicConvIN(self.out_channels, 3, 1, dtype=dt,
                        name="final_agg_2")(x)
        x = DoubleFeatureAtt(self.out_channels, dtype=dt,
                             name="final_att")(x, feats_l[0], feats_r[0])
        return x.transpose(0, 2, 3, 1, 4)  # back to [B, H, W2, W3, C]


class SAMotionEncoder(nn.Module):
    """BasicMotionEncoder (update.py:64-91): convc1/convc2 SHARED between
    the stereo and mono correlation features."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, flow, corr_s, corr_m):
        dt = self.dtype
        c1 = nn.Conv(64, (1, 1), dtype=dt, name="convc1")
        c2 = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                     name="convc2")
        cs = nn.relu(c2(nn.relu(c1(corr_s))))
        cm = nn.relu(c2(nn.relu(c1(corr_m))))
        f = nn.relu(nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)), dtype=dt,
                            name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="convf2")(f))
        out = nn.relu(nn.Conv(126, (3, 3), padding=((1, 1), (1, 1)),
                              dtype=dt, name="conv")(
            jnp.concatenate([cs, cm, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class _SAStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    factor: int
    # eval: upsample only the emitted (last) iteration
    # (stereoanywhere.py:306-307)
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
        motion = SAMotionEncoder(dtype=self.dtype, name="encoder")(
            flow.astype(net08.dtype), corr_s.astype(net08.dtype),
            corr_m.astype(net08.dtype))
        x08 = [motion]
        if self.n_gru_layers > 1:
            x08.append(ops.interpolate(net16, net08.shape[1:3], (1, 2),
                                       align_corners=True))
        net08 = ConvGRU(self.hidden_dims[2], dtype=self.dtype,
                        name="gru08")(net08, jnp.concatenate(x08, -1), ctx08)

        d = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="flow_head_1")(net08))
        delta = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="flow_head_2")(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="mask_1")(net08))
        mask = 0.25 * nn.Conv(self.factor ** 2 * 9, (1, 1),
                              dtype=self.dtype, name="mask_2")(m)
        flow_x = flow_x + delta[..., 0].astype(flow_x.dtype)

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
    encoder: str = "vitl"
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    n_downsample: int = 2
    n_gru_layers: int = 3
    train_iters: int = 22
    valid_iters: int = 32
    vol_n_masks: int = 8
    volume_channels: int = 8
    normal_gain: int = 10
    # trilinear mono-volume downsampling 2^k — the reference's high-res
    # memory valve (stereoanywhere.py:173-205)
    vol_downsample: int = 0
    lrc_th: float = 1.0
    mirror_conf_th: float = 0.98
    mirror_attenuation: float = 0.9
    use_truncate_vol: bool = True
    init_disparity_zero: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None, return_aux: bool = False):
        iters = iters or (self.train_iters if train else self.valid_iters)
        factor = 2 ** self.n_downsample
        b, h, w, _ = left.shape
        h4, w4 = h // factor, w // factor
        dt = self.dtype

        # --- frozen mono branch (stereoanywhere.py:121-127) ---------------
        # MiDaS lower_bound resize to the nearer of 518/1036 per dimension,
        # exact torch-bicubic kernel; the mono model sees the UN-scaled
        # toolbox input
        tw = 518 if abs(w - 518) <= abs(w - 518 * 2) else 1036
        th = 518 if abs(h - 518) <= abs(h - 518 * 2) else 1036
        if h > w:  # image2tensor swaps targets for portrait inputs
            th, tw = tw, th
        scale = max(th / h, tw / w)
        rh = _constrain14(scale * h, th)
        rw = _constrain14(scale * w, tw)
        both = jnp.concatenate([left, right], 0)
        dino_in = ops.interpolate_bicubic(both, (rh, rw), (1, 2))
        danv2 = DepthAnythingV2(self.encoder, out_align_corners=False,
                        dtype=dt, name="mono_model")
        depths = danv2(dino_in)
        depths = jax.lax.stop_gradient(
            ops.interpolate(depths, (h, w), (1, 2), align_corners=False))
        dmin, dmax = depths.min(), depths.max()
        depths = (depths - dmin) / (dmax - dmin)
        mde2, mde3 = depths[:b], depths[b:]

        img1 = 2.0 * left - 1.0
        img2 = 2.0 * right - 1.0

        mde2_low = ops.interpolate(mde2, (h4, w4), (1, 2),
                                   align_corners=True)
        mde3_low = ops.interpolate(mde3, (h4, w4), (1, 2),
                                   align_corners=True)
        vs = 2 ** self.vol_downsample
        if self.vol_downsample > 0:
            mde2_vol = ops.interpolate(mde2, (h // vs, w // vs), (1, 2),
                                       align_corners=True)
            mde3_vol = ops.interpolate(mde3, (h // vs, w // vs), (1, 2),
                                       align_corners=True)
        else:
            mde2_vol, mde3_vol = mde2, mde3
        n2 = estimate_normals(mde2_low, w4 / self.normal_gain)
        n3 = estimate_normals(mde3_low, w4 / self.normal_gain)

        # context from the mono depth (stereoanywhere.py:148-152)
        mde_rgb = jnp.repeat(mde2[..., None], 3, axis=-1).astype(
            left.dtype)
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

        # 1-ch depth pyramid features for the hourglass gates
        # (stereoanywhere.py:156-157): 1/4, 1/8, 1/16, 1/32 of mde_vol
        hv, wv = mde2_vol.shape[1:3]
        fl_pyr, fr_pyr = [], []
        for i in range(2, 6):
            s = 2 ** i
            # clamp to >=1 so tiny inputs (or deep vol_downsample) keep a
            # valid pyramid — the att maps are trilinearly resized to the
            # volume scale anyway
            sz = (max(hv // s, 1), max(wv // s, 1))
            fl_pyr.append(ops.interpolate(
                mde2_vol, sz, (1, 2),
                align_corners=True)[..., None].astype(dt or jnp.float32))
            fr_pyr.append(ops.interpolate(
                mde3_vol, sz, (1, 2),
                align_corners=True)[..., None].astype(dt or jnp.float32))

        # --- volumes ------------------------------------------------------
        fnet = BasicEncoder(256, "instance", dtype=dt, name="fnet")
        fmap2 = fnet(img1).astype(jnp.float32)
        fmap3 = fnet(img2).astype(jnp.float32)
        vol_s = all_pairs_correlation(fmap2, fmap3)  # [B, H4, W4, W4]
        vol_m = 1.73 * all_pairs_correlation(n2, n3)

        masks_l = generate_masks(mde2_low, self.vol_n_masks)
        masks_r = generate_masks(mde3_low, self.vol_n_masks)
        if self.vol_downsample > 0:
            hd, wd = h4 // vs, w4 // vs
            vol_m = ops.interpolate(vol_m, (hd, wd, wd), (1, 2, 3),
                                    align_corners=True)
            masks_l = ops.resize_nearest(masks_l, (hd, wd), (2, 3))
            masks_r = ops.resize_nearest(masks_r, (hd, wd), (2, 3))
        # vol · mask_l[n] ⊗ mask_r[n] → [B, h, w, w', N]
        masked_m = (vol_m[..., None].astype(dt or jnp.float32)
                    * jnp.moveaxis(masks_l, 1, -1)[:, :, :, None, :]
                    * jnp.moveaxis(masks_r, 1, -1)[:, :, None, :, :])

        agg = SAHourglass(self.vol_n_masks, self.volume_channels, dtype=dt,
                          name="hourglass_mono")(masked_m, fl_pyr, fr_pyr)
        cls = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                      dtype=dt, name="classifier_mono")
        clsc = nn.Conv(1, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                       dtype=dt, name="classifier_monoconf")
        agg_m = cls(agg)[..., 0].astype(jnp.float32)
        conf_m = clsc(jax.lax.stop_gradient(agg))[..., 0].astype(
            jnp.float32)
        if self.vol_downsample > 0:
            agg_m = ops.interpolate(agg_m, (h4, w4, w4), (1, 2, 3),
                                    align_corners=True)
            conf_m = ops.interpolate(conf_m, (h4, w4, w4), (1, 2, 3),
                                     align_corners=True)

        # --- coarse disparities, confidences, scale/shift -----------------
        disp2_m = estimate_left_disparity(agg_m)
        disp3_m = estimate_right_disparity(agg_m)
        lconf2 = entropy_confidence(conf_m, 3)
        lconf3 = entropy_confidence(conf_m, 2)
        s2, s3 = softlrc(disp2_m, disp3_m, self.lrc_th)
        c2 = fuzzy_and(lconf2, s2)
        c3 = fuzzy_and(lconf3, s3)
        scale_g, shift_g = weighted_lsq(
            jnp.concatenate([mde2_low, mde3_low], 1),
            jnp.concatenate([disp2_m, disp3_m], 1),
            jnp.concatenate([c2, c3], 1))
        scaled_mde2_low = scale_g * mde2_low + shift_g
        scaled_mde3_low = scale_g * mde3_low + shift_g

        if self.use_truncate_vol:
            slrc2_scaled, _ = softlrc(scaled_mde2_low, scaled_mde3_low,
                                      self.lrc_th)
            mirror2 = mirror_detector(disp2_m, scaled_mde2_low, c2,
                                      slrc2_scaled,
                                      conf_th=self.mirror_conf_th)
            trunc = jax.lax.stop_gradient(truncate_corr_volume(
                scaled_mde2_low, mirror2, self.mirror_attenuation))
            vol_s = vol_s * trunc

        pyr_s = tuple(build_corr_pyramid(vol_s.astype(jnp.float32),
                                         self.corr_levels))
        pyr_m = tuple(build_corr_pyramid(agg_m.astype(jnp.float32),
                                         self.corr_levels))

        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))
        flow_x = (jnp.zeros((b, h4, w4), jnp.float32)
                  if self.init_disparity_zero
                  else -scaled_mde2_low.astype(jnp.float32))

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

        if return_aux:
            return ups[-1], {
                "mde2": mde2, "mde2_low": mde2_low, "disp2_m": disp2_m,
                "disp3_m": disp3_m, "lconf2": lconf2, "c2": c2,
                "scale": scale_g, "shift": shift_g,
                "scaled_mde2_low": scaled_mde2_low, "agg_m": agg_m,
                "vol_m": vol_m, "vol_s": vol_s, "n2": n2}
        if train:
            return [ups[i] for i in range(iters)]
        return ups[-1]


def _constrain14(x: float, min_val: int) -> int:
    y = int(round(x / 14) * 14)
    if y < min_val:
        y = int(math.ceil(x / 14) * 14)
    return y
