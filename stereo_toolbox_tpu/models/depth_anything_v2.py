"""DepthAnythingV2 — DINOv2 ViT encoder + DPT depth head (flax).

The shared monocular foundation model consumed by the ‡-tier stereo models
(MonSter, DEFOMStereo, FoundationStereo, StereoAnywhere). The reference
vendors ~18k LoC of DINOv2/DPT torch code
(models/depth_anything_v2/dinov2.py, dpt.py, util/blocks.py); this is a
compact TPU-native reimplementation of the exercised subset:

  * DINOv2 ViT (patch 14, cls token, bicubic pos-embed interpolation,
    pre-norm blocks with LayerScale) with `get_intermediate_layers`
    (dinov2.py:44-330);
  * DPT head: per-tap projection + resize, scratch 3×3 convs, four
    residual fusion blocks, output convs (dpt.py:38-163,
    util/blocks.py:29-150);
  * `DepthAnythingV2.__call__` → relative inverse depth ``[B, H, W]``
    (dpt.py:309-345), optionally with decoder features.

The reference runs ImageNet-pretrained frozen weights; this environment has
no network access, so the trunk initializes randomly — architecture parity
holds, accuracy parity requires importing pretrained weights later (the
param tree is shaped to make that a straightforward mapping).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6,
                 taps=(2, 5, 8, 11), out_channels=(48, 96, 192, 384)),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12,
                 taps=(2, 5, 8, 11), out_channels=(96, 192, 384, 768)),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16,
                 taps=(4, 11, 17, 23), out_channels=(256, 512, 1024, 1024)),
}
PATCH = 14


def _vit_attention_fn(query, key, value, bias=None, mask=None, **kwargs):
    """Attention core for the ViT blocks. At the token counts the stereo
    models drive this ViT at (e.g. 8k tokens for MonSter-vitl at 1088×1920),
    XLA's materialized [B, H, N, N] softmax attention is HBM-bound — ~8.5 GB
    of logits traffic per layer. On TPU, route through the Pallas flash
    kernel (online softmax, padded to the 512 block with segment-id
    masking); small sequences and other backends keep flax's reference
    attention. Numerics: identical math, f32 online softmax — differences
    are at reassociation level."""
    b, n, h, d = query.shape
    if (jax.default_backend() != "tpu" or n < 1024 or d != 64
            or bias is not None or mask is not None):
        return nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask, **kwargs)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    pad = (-n) % 1024
    n2 = n + pad

    def prep(x):
        x = jnp.moveaxis(x, -2, -3)  # [B, H, N, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    seg = jnp.pad(jnp.zeros((b, n), jnp.int32), ((0, 0), (0, pad)),
                  constant_values=1)
    # default blocks are ~7× slower here; q2048/k1024 measured best on v5e
    bq = min(2048, n2)
    bk = min(1024, n2)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = flash_attention(prep(query), prep(key), prep(value),
                          segment_ids=SegmentIds(seg, seg),
                          sm_scale=float(d) ** -0.5, block_sizes=bs)
    return jnp.moveaxis(out[:, :, :n], -3, -2)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1", nn.initializers.constant(1.0), (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(1.0), (self.dim,))
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            attention_fn=_vit_attention_fn,
            dtype=self.dtype)(h, h)
        x = x + h * ls1
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default is exact
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h * ls2


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float):
    """[n_out, n_in] row-stochastic matrix replicating torch
    ``F.interpolate(mode='bicubic', align_corners=False,
    scale_factor=scale)``: src = (i+0.5)/scale − 0.5, cubic convolution
    kernel with A = −0.75, edge-clamped taps. Computed with numpy at trace
    time (sizes are static), so the pos-embed resize is bit-faithful to
    DINOv2's interpolate_pos_encoding (dinov2.py:179-210) including its
    +0.1 interpolate_offset."""
    import numpy as _np
    a = -0.75

    def k(t):
        t = _np.abs(t)
        return _np.where(
            t <= 1, (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1,
            _np.where(t < 2, a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a,
                      0.0))

    m = _np.zeros((n_out, n_in), _np.float64)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        x0 = _np.floor(src)
        for j in range(-1, 3):
            idx = int(_np.clip(x0 + j, 0, n_in - 1))
            m[i, idx] += k(src - (x0 + j))
    return m.astype(_np.float32)


class DINOv2(nn.Module):
    """Patch-14 ViT returning intermediate (patch_tokens, cls) pairs."""
    encoder: str = "vitl"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, taps: Sequence[int]):
        cfg = VIT_CONFIGS[self.encoder]
        dim = cfg["embed_dim"]
        b, h, w, _ = x.shape
        ph, pw = h // PATCH, w // PATCH

        x = nn.Conv(dim, (PATCH, PATCH), strides=(PATCH, PATCH),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, ph * pw, dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        # pos embed stored at the canonical 37×37 (518/14) grid + cls slot
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02), (1, 37 * 37 + 1, dim))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (37, 37):
            # DINOv2 resizes with torch bicubic at scale (g+0.1)/37
            # (dinov2.py:189-205); replicate its exact kernel/coords
            grid = pos_patch.reshape(1, 37, 37, dim).astype(jnp.float32)
            mh = jnp.asarray(_torch_bicubic_matrix(37, ph, (ph + 0.1) / 37))
            mw = jnp.asarray(_torch_bicubic_matrix(37, pw, (pw + 0.1) / 37))
            grid = jnp.einsum("oh,bhwc->bowc", mh, grid)
            grid = jnp.einsum("ow,bhwc->bhoc", mw, grid)
            pos_patch = grid.reshape(1, ph * pw, dim).astype(pos.dtype)
        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls + pos_cls, (b, 1, dim))
        x = jnp.concatenate([cls_tok, x], axis=1)

        outputs = []
        tapset = set(taps)
        for i in range(cfg["depth"]):
            x = ViTBlock(dim, cfg["num_heads"], dtype=self.dtype,
                         name=f"block{i}")(x)
            if i in tapset:
                n = nn.LayerNorm(dtype=self.dtype, name=f"tapnorm{i}")(x)
                outputs.append((n[:, 1:], n[:, 0]))
        return outputs


class ResidualConvUnit(nn.Module):
    """util/blocks.py:29-80."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """util/blocks.py:83-150: optional skip + residual units + resize +
    1×1 out conv."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip=None, size=None):
        from stereo_toolbox_tpu.ops.upsample import interpolate
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype)(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype)(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = interpolate(x, size, (1, 2), align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)


class DPTHead(nn.Module):
    """dpt.py:38-163."""
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    out_align_corners: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tap_features, ph: int, pw: int,
                 return_path1: bool = False):
        dt = self.dtype
        from stereo_toolbox_tpu.ops.upsample import interpolate
        outs = []
        resizes = ("up4", "up2", "id", "down2")
        for i, (tokens, _cls) in enumerate(tap_features):
            b, n, c = tokens.shape
            x = tokens.reshape(b, ph, pw, c)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=dt,
                        name=f"project{i}")(x)
            mode = resizes[i]
            if mode == "up4":
                x = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     dtype=dt, name=f"resize{i}")(x)
            elif mode == "up2":
                x = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     dtype=dt, name=f"resize{i}")(x)
            elif mode == "down2":
                # torch-parity symmetric padding=1 (flax SAME pads (0,1)
                # for stride 2, shifting the grid by a pixel)
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=dt,
                            name=f"resize{i}")(x)
            outs.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=dt, name=f"layer{i + 1}_rn")(o)
              for i, o in enumerate(outs)]
        l1, l2, l3, l4 = rn
        # Decoder-style fusion chain (dpt.py:279-287 DPTHead_decoder): each
        # path stays at its OWN scale (identity resize inside the block) and
        # the upsample to the next level is external with align_corners=True.
        # Because the block's 1×1 out-conv commutes with bilinear resize,
        # the standard head's path_k (dpt.py:145-148) equals
        # resize(decoder path_k) — so one chain yields both the MonSter-style
        # decoder features and the depth output, bitwise.
        p4 = FeatureFusionBlock(self.features, dtype=dt, name="refine4")(
            l4, size=l4.shape[1:3])
        up4 = interpolate(p4, l3.shape[1:3], (1, 2), align_corners=True)
        p3 = FeatureFusionBlock(self.features, dtype=dt, name="refine3")(
            up4, l3, size=l3.shape[1:3])
        up3 = interpolate(p3, l2.shape[1:3], (1, 2), align_corners=True)
        p2 = FeatureFusionBlock(self.features, dtype=dt, name="refine2")(
            up3, l2, size=l2.shape[1:3])
        up2 = interpolate(p2, l1.shape[1:3], (1, 2), align_corners=True)
        p1 = FeatureFusionBlock(self.features, dtype=dt, name="refine1")(
            up2, l1, size=l1.shape[1:3])
        # standard head's path_1 (2× layer_1 scale, dpt.py:148)
        p1_std = interpolate(p1, (l1.shape[1] * 2, l1.shape[2] * 2), (1, 2),
                             align_corners=True)

        out = nn.Conv(self.features // 2, (3, 3), padding="SAME", dtype=dt,
                      name="output_conv1")(p1_std)
        # StereoAnywhere's vendored head resizes with align_corners=False
        # (StereoAnywhere/depth_anything_v2/dpt.py:148); every other copy
        # in the reference tree uses True
        out = interpolate(out, (ph * PATCH, pw * PATCH), (1, 2),
                          align_corners=self.out_align_corners)
        h = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            name="output_conv2a")(out))
        depth = nn.relu(nn.Conv(1, (1, 1), dtype=dt,
                                name="output_conv2b")(h))
        if return_path1:
            # "out" = output_conv1(path_1) at patch resolution — the
            # features//2-channel side feature FoundationStereo consumes
            # (FoundationStereo/depth_anything/dpt.py:132-141)
            return depth[..., 0], {"path_1": p1_std, "out": out,
                                   "paths": [p4, p3, p2, p1]}
        return depth[..., 0]


class DepthAnythingV2(nn.Module):
    """Monocular relative-depth model; also exported as a model itself
    (reference models/__init__.py:11)."""
    encoder: str = "vits"
    features: int | None = None  # None → per-encoder default (64/128/256)
    # StereoAnywhere's vendored copy resizes the pre-head feature with
    # align_corners=False (its dpt.py:148); all other copies use True
    out_align_corners: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_features: bool = False):
        del train  # ViT+DPT use LayerNorm only — no train-time state
        cfg = VIT_CONFIGS[self.encoder]
        features = self.features or {"vits": 64, "vitb": 128,
                                     "vitl": 256}[self.encoder]
        ph, pw = x.shape[1] // PATCH, x.shape[2] // PATCH
        taps = DINOv2(self.encoder, dtype=self.dtype, name="pretrained")(
            x, cfg["taps"])
        head = DPTHead(features, cfg["out_channels"],
                       out_align_corners=self.out_align_corners,
                       dtype=self.dtype, name="depth_head")
        if return_features:
            depth, feats = head(taps, ph, pw, return_path1=True)
            feats["taps"] = taps
            return depth, feats
        return head(taps, ph, pw)
