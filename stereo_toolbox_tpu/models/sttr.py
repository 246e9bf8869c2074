"""STTR (ICCV'21) — stereo transformer with optimal-transport matching.

TPU-native re-design of models/STTR/:
  * SPP backbone + DenseBlock tokenizer → full-resolution 128-ch descriptors
    (feat_extractor_backbone.py, feat_extractor_tokenizer.py);
  * grid subsampling by `downsample` (sttr.py:101-110) so attention runs on
    every 3rd row/column;
  * alternating self/cross attention along epipolar lines with 1D relative
    sine position encoding (transformer.py:17-230, pos_encoder.py:13-62,
    attention.py) — batched here as ``[N*H, W, C]`` einsum attention (the
    reference's gradient checkpointing is `jax.checkpoint` on each layer);
  * optimal-transport (Sinkhorn, 10 iters, log-space) regression with dustbin
    occlusion handling (regression_head.py:143-206), 3-px window re-weighted
    regression (:39-73), and the context adjustment layer (the reference's
    weight_norm convs are plain convs here — same function class).

Contract: eval → ``[B, H, W]`` disparity; train → dict with `disp_pred`,
`occ_pred`, `disp_pred_low_res` (sttr.py:138-141; RR-loss responses require
GT inside the forward pass and are computed by the loss utilities instead).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.nn.layers import BatchStatNorm, avg_pool


class SConvBN(nn.Module):
    """Conv → batch-stat BN → optional ReLU. Every STTR BatchNorm runs with
    ``track_running_stats=False`` (sttr.py `_disable_batchnorm_tracking`), so
    normalization always uses the current batch's statistics."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # batch-stat BN has no train/eval distinction
        k = (self.kernel_size, self.kernel_size)
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, k, strides=self.strides,
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype)(x)
        x = BatchStatNorm(dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class STTRResBlock(nn.Module):
    """torchvision-style BasicBlock (ReLU after the residual add)."""
    features: int
    strides: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = SConvBN(self.features, 3, self.strides,
                      dtype=self.dtype)(x, train)
        out = SConvBN(self.features, 3, 1, relu=False,
                      dtype=self.dtype)(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = SConvBN(self.features, 1, self.strides, relu=False,
                        dtype=self.dtype)(x, train)
        return nn.relu(out + x)


class SppBackbone(nn.Module):
    """feat_extractor_backbone.py:15-103 → [img, 1/4, 1/8, 1/16]."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        out = SConvBN(16, 3, 2, dtype=dt)(x, train)
        out = SConvBN(16, 3, 1, dtype=dt)(out, train)
        out = SConvBN(32, 3, 1, dtype=dt)(out, train)
        o1 = STTRResBlock(64, 2, dtype=dt)(out, train)
        for _ in range(2):
            o1 = STTRResBlock(64, 1, dtype=dt)(o1, train)
        o2 = STTRResBlock(128, 2, dtype=dt)(o1, train)
        for _ in range(2):
            o2 = STTRResBlock(128, 1, dtype=dt)(o2, train)

        hs, ws = -(-h // 16), -(-w // 16)
        branches = []
        for pool in (16, 8, 4, 2):
            p = (min(pool, o2.shape[1]), min(pool, o2.shape[2]))
            b = avg_pool(o2, p, p)
            b = SConvBN(32, 1, dtype=dt)(b, train)
            branches.append(ops.interpolate(b, (hs, ws), (1, 2),
                                            align_corners=False))
        o3 = jnp.concatenate(branches, -1)
        return [x, o1, o2, o3]


class DenseBlock(nn.Module):
    """torchvision `_DenseBlock` (BN-ReLU-1×1(4g) → BN-ReLU-3×3(g), concat)."""
    num_layers: int
    growth_rate: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.growth_rate
        for _ in range(self.num_layers):
            h = BatchStatNorm(dtype=self.dtype)(x)
            h = nn.relu(h)
            h = nn.Conv(4 * g, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = BatchStatNorm(dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(g, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype)(h)
            x = jnp.concatenate([x, h], -1)
        return x


def _center_crop(x, th, tw):
    h, w = x.shape[1:3]
    y0 = (h - th) // 2
    x0 = (w - tw) // 2
    return x[:, y0:y0 + th, x0:x0 + tw]


class Tokenizer(nn.Module):
    """feat_extractor_tokenizer.py:62-117 — DenseBlock expanding path."""
    hidden_dim: int = 128
    growth_rate: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        dt = self.dtype
        g4 = 4 * self.growth_rate
        img, f4, f8, f16 = features
        out = DenseBlock(4, self.growth_rate, dtype=dt)(f16, train)[..., -g4:]

        def up2(x, skip):
            x = nn.ConvTranspose(x.shape[-1], (3, 3), strides=(2, 2),
                                 padding="VALID", dtype=dt)(x)
            x = _center_crop(x, skip.shape[1], skip.shape[2])
            return jnp.concatenate([x, skip], -1)

        out = DenseBlock(4, self.growth_rate, dtype=dt)(
            up2(out, f8), train)[..., -g4:]
        out = DenseBlock(4, self.growth_rate, dtype=dt)(
            up2(out, f4), train)[..., -g4:]
        # final: ×4 up to full res, concat the image, DoubleConv
        x = nn.ConvTranspose(self.hidden_dim, (3, 3), strides=(2, 2),
                             padding="VALID", use_bias=False, dtype=dt)(out)
        x = BatchStatNorm(dtype=dt)(x)
        x = nn.ConvTranspose(self.hidden_dim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=dt)(x)
        x = _center_crop(x, img.shape[1], img.shape[2])
        x = jnp.concatenate([x, img], -1)
        x = SConvBN(self.hidden_dim, 3, dtype=dt)(x, train)
        x = SConvBN(self.hidden_dim, 3, dtype=dt)(x, train)
        return x


def sine_pos_encoding_1d(width: int, channels: int, scale: float,
                         temperature: float = 10000.0) -> jax.Array:
    """Relative sine encoding over 2W-1 shifts (pos_encoder.py:13-62)."""
    x_embed = jnp.linspace(width - 1, -width + 1, 2 * width - 1) * scale
    dim_t = jnp.arange(channels, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / channels)
    pos = x_embed[:, None] / dim_t
    return jnp.stack([jnp.sin(pos[:, 0::2]), jnp.cos(pos[:, 1::2])],
                     axis=2).reshape(2 * width - 1, channels)


class RelativeMHA(nn.Module):
    """Multi-head attention with relative-position q/k terms
    (attention.py:30-139). Inputs are ``[B', W, C]`` (B' = N*H).

    Epipolar rows attend independently, so the param-free core (the
    ``[B', E, W, W]`` logits + softmax + value blend) is chunked over B'
    with `lax.map` whenever the logits would exceed ``attn_budget`` bytes
    — numerically identical, but peak memory stays bounded. This is how
    the TPU build clears the resolutions where the reference's STTR OOMs
    on a 24 GB RTX 4090 (reference README.md:161,190)."""
    num_heads: int = 8
    # Two-level logits budget (measured at Table-3 shapes): if the full
    # [B', E, W, W] f32 logits fit in `attn_budget` bytes, run unchunked
    # (chunking 736×1280 only serialized: 914→807 ms unchunked); otherwise
    # chunk rows to `attn_chunk_budget` — LARGE chunks regressed 1088×1920
    # to 2.7 s vs 2.0 s with ~1 GB chunks.
    attn_budget: int = 4 << 30
    attn_chunk_budget: int = 1 << 30
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, key, value, pos_rel=None, attn_mask=None,
                 return_raw=False):
        c = query.shape[-1]
        e = self.num_heads
        hd = c // e
        in_w = self.param("in_proj_w", nn.initializers.xavier_uniform(),
                          (c, 3 * c))
        in_b = self.param("in_proj_b", nn.initializers.zeros, (3 * c,))

        q = query @ in_w[:, :c] + in_b[:c]
        k = key @ in_w[:, c:2 * c] + in_b[c:2 * c]
        v = value @ in_w[:, 2 * c:] + in_b[2 * c:]

        scaling = float(hd) ** -0.5
        q = q * scaling
        wq, wk = query.shape[1], key.shape[1]
        qh = q.reshape(-1, wq, e, hd)
        kh = k.reshape(-1, wk, e, hd)
        vh = v.reshape(-1, wk, e, hd)

        q_r = k_r = None
        if pos_rel is not None:
            # pos_rel: [W, W', C] relative encodings; q_r/k_r reuse the q/k
            # projections (attention.py:66-77)
            q_r = (pos_rel @ in_w[:, :c] + in_b[:c]) * scaling
            k_r = pos_rel @ in_w[:, c:2 * c] + in_b[c:2 * c]
            q_r = q_r.reshape(wq, wk, e, hd)
            k_r = k_r.reshape(wq, wk, e, hd)

        def attend(args):
            qc, kc, vc = args
            attn = jnp.einsum("bwec,bvec->bewv", qc, kc,
                              preferred_element_type=jnp.float32)
            if pos_rel is not None:
                attn = attn + jnp.einsum("bwec,wvec->bewv", qc, k_r)
                attn = attn + jnp.einsum("bvec,wvec->bewv", kc, q_r)
            if attn_mask is not None:
                attn = attn + attn_mask[None, None]
            raw = attn.sum(axis=1)
            p = jax.nn.softmax(attn, axis=-1).astype(vc.dtype)
            return jnp.einsum("bewv,bvec->bwec", p, vc), raw

        b = qh.shape[0]
        total = b * e * wq * wk * 4
        rows = b if total <= self.attn_budget else             max(1, self.attn_chunk_budget // (e * wq * wk * 4))
        if rows >= b:
            out, raw = attend((qh, kh, vh))
        else:
            pad = (-b) % rows
            n = (b + pad) // rows

            def split(a):
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                return a.reshape(n, rows, *a.shape[1:])

            out, raw = jax.lax.map(attend, (split(qh), split(kh),
                                            split(vh)))
            out = out.reshape(n * rows, wq, e, hd)[:b]
            raw = raw.reshape(n * rows, wq, wk)[:b]

        out = out.reshape(-1, wq, c)
        out_proj = nn.Dense(c, dtype=self.dtype, name="out_proj")
        out = out_proj(out)
        if return_raw:
            return out, raw
        return out


class STTRTransformer(nn.Module):
    """Alternating self/cross attention (transformer.py:17-116)."""
    hidden_dim: int = 128
    num_heads: int = 8
    num_layers: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feat_left, feat_right, pos_enc,
                 train: bool = False):
        # feat_*: [B', W, C]; pos_enc: [2W-1, C]
        w = feat_left.shape[1]
        idx = (jnp.arange(w - 1, -1, -1)[:, None]
               + jnp.arange(w)[None, :]).reshape(-1)
        pos_rel = jnp.take(pos_enc, idx, axis=0).reshape(
            w, w, pos_enc.shape[-1])
        pos_rel_flipped = jnp.take(pos_enc[::-1], idx, axis=0).reshape(
            w, w, pos_enc.shape[-1])

        def layer_body(mdl, feat_left, feat_right, pos_rel,
                       pos_rel_flipped, i, last):
            # self attention (shared weights across the two views)
            sa = RelativeMHA(mdl.num_heads, dtype=mdl.dtype,
                             name=f"self_attn_{i}")
            norm1 = nn.LayerNorm(name=f"self_norm_{i}")
            both = jnp.concatenate([feat_left, feat_right], axis=0)
            both2 = norm1(both)
            both = both + sa(both2, both2, both2, pos_rel)
            n = feat_left.shape[0]
            feat_left, feat_right = both[:n], both[n:]

            # cross attention
            ca = RelativeMHA(mdl.num_heads, dtype=mdl.dtype,
                             name=f"cross_attn_{i}")
            cn1 = nn.LayerNorm(name=f"cross_norm1_{i}")
            cn2 = nn.LayerNorm(name=f"cross_norm2_{i}")
            fl2 = cn1(feat_left)
            fr2 = cn1(feat_right)
            feat_right = feat_right + ca(fr2, fl2, fl2, pos_rel_flipped)
            fr2 = cn2(feat_right)
            mask = None
            if last:
                mask = jnp.triu(jnp.full((w, w), -jnp.inf), k=1)
            out, raw_attn = ca(fl2, fr2, fr2, pos_rel, attn_mask=mask,
                               return_raw=True)
            feat_left = feat_left + out
            return feat_left, feat_right, raw_attn

        # Train-time gradient checkpointing over the alternating layers
        # (the reference remats each layer, STTR/transformer.py:54-66):
        # without it every layer's [2B', W, W] logits stay live for the
        # backward pass — rematting bounds train memory to ~one layer's.
        body = nn.remat(layer_body, static_argnums=(5, 6)) if train \
            else layer_body

        raw_attn = None
        for i in range(self.num_layers):
            feat_left, feat_right, raw_attn = body(
                self, feat_left, feat_right, pos_rel, pos_rel_flipped, i,
                i == self.num_layers - 1)
        return raw_attn  # [B', W, W]


def sinkhorn_ot(attn, phi, iters: int = 10):
    """Log-space Sinkhorn with dustbins (regression_head.py:143-190).

    attn: [B', W, W] raw similarities → returns [B', W+1, W+1]."""
    b, w, _ = attn.shape
    sim = jnp.concatenate(
        [attn, jnp.broadcast_to(phi, (b, w, 1))], -1)
    sim = jnp.concatenate(
        [sim, jnp.broadcast_to(phi, (b, 1, w + 1))], -2)
    marginal = jnp.concatenate([jnp.ones(w), jnp.array([float(w)])]) / (2 * w)
    log_mu = jnp.log(marginal)[None].repeat(b, 0)
    log_nu = log_mu
    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    for _ in range(iters):
        v = log_nu - jax.nn.logsumexp(sim + u[:, :, None], axis=1)
        u = log_mu - jax.nn.logsumexp(sim + v[:, None, :], axis=2)
    return jnp.exp(sim + u[:, :, None] + v[:, None, :] + math.log(2.0 * w))


class ContextAdjustmentLayer(nn.Module):
    """context_adjustment_layer.py:10-54 (weight_norm → plain convs)."""
    num_blocks: int = 8
    feat_dim: int = 16
    expansion: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp, occ, img):
        dt = self.dtype
        feat = nn.Conv(self.feat_dim, (3, 3), padding="SAME", dtype=dt)(
            jnp.concatenate([disp[..., None], img], -1))
        for i in range(self.num_blocks):
            h = jnp.concatenate([disp[..., None], feat], -1)
            h = nn.relu(nn.Conv(self.feat_dim * self.expansion, (3, 3),
                                padding="SAME", dtype=dt,
                                name=f"res{i}_a")(h))
            h = nn.Conv(self.feat_dim, (3, 3), padding="SAME", dtype=dt,
                        name=f"res{i}_b")(h)
            feat = feat + h
        delta = nn.Conv(1, (3, 3), padding="SAME", dtype=dt)(feat)[..., 0]
        disp_final = disp + delta

        o = jnp.concatenate([occ[..., None], img], -1)
        o = nn.Conv(self.feat_dim, (3, 3), padding="SAME", dtype=dt)(o)
        o = nn.relu(nn.Conv(self.feat_dim, (3, 3), padding="SAME",
                            dtype=dt)(o))
        o = nn.Conv(self.feat_dim, (3, 3), padding="SAME", dtype=dt)(o)
        o = nn.relu(nn.Conv(self.feat_dim, (3, 3), padding="SAME",
                            dtype=dt)(o))
        occ_final = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), padding="SAME", dtype=dt)(o)[..., 0])
        return disp_final, occ_final


class STTR(nn.Module):
    channel_dim: int = 128
    num_attn_layers: int = 6
    num_heads: int = 8
    downsample: int = 3
    cal_num_blocks: int = 8
    cal_feat_dim: int = 16
    cal_expansion: int = 4
    ot: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        b, h, w, _ = left.shape
        both = jnp.concatenate([left, right], axis=0)
        feats = SppBackbone(dtype=self.dtype, name="backbone")(both, train)
        tokens = Tokenizer(self.channel_dim, dtype=self.dtype,
                           name="tokenizer")(feats, train)

        # grid subsampling (sttr.py:101-110)
        if self.downsample > 0:
            off = self.downsample // 2
            cols = jnp.arange(off, w, self.downsample)
            rows = jnp.arange(off, h, self.downsample)
            tokens = jnp.take(jnp.take(tokens, rows, axis=1), cols, axis=2)
            scale = w / float(cols.shape[0])
        else:
            scale = 1.0
        feat_left, feat_right = tokens[:b], tokens[b:]
        _, hs, ws, c = feat_left.shape

        pos_enc = sine_pos_encoding_1d(ws, c, scale)
        fl = feat_left.reshape(b * hs, ws, c)
        fr = feat_right.reshape(b * hs, ws, c)
        raw_attn = STTRTransformer(
            c, self.num_heads, self.num_attn_layers, dtype=self.dtype,
            name="transformer")(fl, fr, pos_enc, train)  # [B*H, W, W]

        phi = self.param("phi", nn.initializers.constant(1.0), (1,))
        if self.ot:
            attn_ot = sinkhorn_ot(raw_attn, phi[0])
        else:
            bq, wq, _ = raw_attn.shape
            sim = jnp.concatenate(
                [raw_attn, jnp.broadcast_to(phi[0], (bq, wq, 1))], -1)
            sim = jnp.concatenate(
                [sim, jnp.broadcast_to(phi[0], (bq, 1, wq + 1))], -2)
            attn_ot = jax.nn.softmax(sim, axis=-1)

        attn_m = attn_ot[:, :-1, :-1]  # drop dustbins

        # 3-px window regression (regression_head.py:39-73)
        pos_l = jnp.arange(ws, dtype=jnp.float32)[:, None]
        pos_r = jnp.arange(ws, dtype=jnp.float32)[None, :]
        pos_shift = jnp.maximum(pos_l - pos_r, 0.0)  # [W, W']
        high = jnp.argmax(attn_m, axis=-1)  # [B', W]
        rng3 = jnp.stack([high - 1, high, high + 1], -1) + 1  # pad offset
        attn_pad = jnp.pad(attn_m, ((0, 0), (0, 0), (1, 1)))
        a3 = jnp.take_along_axis(attn_pad, rng3, axis=-1)  # [B', W, 3]
        norm = a3.sum(-1, keepdims=True)
        norm = jnp.where(norm < 0.1, 1.0, norm)
        a3 = a3 / norm
        pos_pad = jnp.pad(jnp.broadcast_to(pos_shift, attn_m.shape[1:]),
                          ((0, 0), (1, 1)))
        p3 = jnp.take_along_axis(
            jnp.broadcast_to(pos_pad, attn_pad.shape), rng3, axis=-1)
        disp_low = (a3 * p3).sum(-1).reshape(b, hs, ws)
        occ_low = (1.0 - norm[..., 0]).reshape(b, hs, ws)

        # upsample + context adjustment (regression_head.py:105-140)
        disp_up = ops.resize_nearest(disp_low * scale, (h, w), (1, 2))
        occ_up = ops.resize_nearest(occ_low, (h, w), (1, 2))
        eps = 1e-6
        mean_d = disp_up.mean()
        std_d = disp_up.std() + eps
        disp_n = (disp_up - mean_d) / std_d
        occ_n = (occ_up - 0.5) / 0.5
        disp_adj, occ_final = ContextAdjustmentLayer(
            self.cal_num_blocks, self.cal_feat_dim, self.cal_expansion,
            dtype=self.dtype, name="cal")(disp_n, occ_n, left)
        disp_final = disp_adj * std_d + mean_d

        if train:
            return {"disp_pred": disp_final, "occ_pred": occ_final,
                    "disp_pred_low_res": disp_low * scale}
        return disp_final
