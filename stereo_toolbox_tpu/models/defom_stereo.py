"""DEFOMStereo (CVPR'25) — depth-foundation-model priors in a RAFT loop.

TPU-native re-design of models/DEFOMStereo/defom_stereo.py, faithful to the
reference parameterization (checkpoint-importable, tests/test_torch_import):
  * DefomEncoder (extractor.py:348-389): frozen DAv2 ViT + TWO DPT heads —
    the frozen `depth_head` produces left-view inverse depth (its path chain
    runs at patch-grid sizes, then output_conv1 → resize to the 1/4 grid →
    output_conv2, dpt.py:118-153), and the TRAINABLE `depth_feat` head
    (DPTFeat, dpt.py:156-259) resizes the layer_rn maps to 1/4-based sizes
    and returns [rn1, rn2, rn3] (left) plus per-view path_1 features. The
    vendored FeatureFusionBlock never auto-upsamples (blocks.py:138
    `modifier = None`);
  * idepth is normalized per image to ``idepth/max * idepth_scale * W/4 +
    0.01`` and used as the initial disparity;
  * fnet adds `convd(path_1 features)` before its 1×1 output conv
    (extractor.py:212-241); cnet adds `conv08/16/32(d_features[k])` before
    each output head (extractor.py:319-345, drop_path = identity in eval);
  * two-phase recurrence (defom_stereo.py:141-182): `scale_iters` iterations
    with a scale update block — level-0 lookup at ``x0 - s·disp`` for
    s ∈ scale_list with radius 2 (corr.py:150-158), update
    ``disp ← relu6(exp(0.25·x))·disp`` (update.py:190-195) — then additive
    updates with the delta clipped to the corr search range
    (defom_stereo.py:160-166). Both phases are `nn.scan`s; the reference's
    eval protocol upsamples only the final iteration;
  * S/L variants by `dinov2_encoder` ∈ {'vits', 'vitl'}.

Contract: train → list of full-res maps; eval → final map. The DAv2 trunk is
randomly initialized here (no network access) and frozen via stop_gradient —
the importer loads real weights (utils/torch_import.py convert_defom).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.depth_anything_v2 import (PATCH, VIT_CONFIGS,
                                                         DINOv2,
                                                         FeatureFusionBlock)
from stereo_toolbox_tpu.models.raft_stereo import (IMAGENET_MEAN,
                                                   IMAGENET_STD,
                                                   BasicMultiUpdateBlock,
                                                   RAFTResBlock)
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         build_corr_pyramid, corr_lookup_1d)

_DAV2_FEATURES = {"vits": 64, "vitb": 128, "vitl": 256}


def get_danv2_io_size(h: int, w: int, factor: int = 4,
                      max_size: int = 2688):
    """DAv2 input (14-multiple, ≈3.5× the 1/4 grid) and output (1/4 grid)
    sizes — reference utils/utils.py:9-34 `get_danv2_io_size`."""
    oh, ow = h // factor, w // factor
    ih = -(-int(3.5 * oh) // PATCH) * PATCH
    iw = -(-int(3.5 * ow) // PATCH) * PATCH
    cap = max_size // PATCH * PATCH
    ih, iw = min(ih, cap), min(iw, cap)
    return ih, iw, oh, ow


class DEFOMHead(nn.Module):
    """DEFOM's vendored DPTHead / DPTFeat pair (DEFOMStereo
    depth_anything_v2/dpt.py:38-259). Identical projects/resizes/layer_rn/
    refinenet parameterization; `with_output` selects the depth variant."""
    features: int
    out_channels: Sequence[int]
    with_output: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, taps, ph: int, pw: int, out_size):
        dt = self.dtype
        from stereo_toolbox_tpu.ops.upsample import interpolate
        outs = []
        resizes = ("up4", "up2", "id", "down2")
        for i, (tokens, _cls) in enumerate(taps):
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
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=dt,
                            name=f"resize{i}")(x)
            outs.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                      dtype=dt, name=f"layer{i + 1}_rn")(o)
              for i, o in enumerate(outs)]
        l1, l2, l3, l4 = rn
        oh, ow = out_size
        if not self.with_output:
            # DPTFeat resizes the rn maps onto the 1/4-based pyramid before
            # the fusion chain (dpt.py:247-252)
            l1 = interpolate(l1, (oh, ow), (1, 2), align_corners=True)
            l2 = interpolate(l2, (oh // 2, ow // 2), (1, 2),
                             align_corners=True)
            l3 = interpolate(l3, (oh // 4, ow // 4), (1, 2),
                             align_corners=True)
            l4 = interpolate(l4, (oh // 8, ow // 8), (1, 2),
                             align_corners=True)

        p4 = FeatureFusionBlock(self.features, dtype=dt, name="refine4")(
            l4, size=l3.shape[1:3])
        p3 = FeatureFusionBlock(self.features, dtype=dt, name="refine3")(
            p4, l3, size=l2.shape[1:3])
        p2 = FeatureFusionBlock(self.features, dtype=dt, name="refine2")(
            p3, l2, size=l1.shape[1:3])
        # vendored block has no default 2× resize (blocks.py:138)
        p1 = FeatureFusionBlock(self.features, dtype=dt, name="refine1")(
            p2, l1, size=l1.shape[1:3])

        if not self.with_output:
            return [l1, l2, l3], p1
        out = nn.Conv(self.features // 2, (3, 3), padding="SAME", dtype=dt,
                      name="output_conv1")(p1)
        out = interpolate(out, (oh, ow), (1, 2), align_corners=True)
        h = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            name="output_conv2a")(out))
        idepth = nn.relu(nn.Conv(1, (1, 1), dtype=dt,
                                 name="output_conv2b")(h))
        return idepth[..., 0]


class DefomEncoder(nn.Module):
    """extractor.py:348-389: DAv2 trunk + depth/feat heads + idepth prior."""
    encoder: str = "vits"
    idepth_scale: float = 0.5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, both, io_sizes):
        ih, iw, oh, ow = io_sizes
        cfg = VIT_CONFIGS[self.encoder]
        features = _DAV2_FEATURES[self.encoder]
        x = ops.interpolate(both, (ih, iw), (1, 2), align_corners=True)
        taps = DINOv2(self.encoder, dtype=self.dtype, name="pretrained")(
            x, cfg["taps"])
        b = both.shape[0] // 2
        ph, pw = ih // PATCH, iw // PATCH
        # the depth head only processes the LEFT half (dpt.py:123)
        taps_left = [(t[:b], c[:b]) for t, c in taps]
        idepth = DEFOMHead(features, cfg["out_channels"], with_output=True,
                           dtype=self.dtype, name="depth_head")(
            taps_left, ph, pw, (oh, ow))
        d_feats, p1 = DEFOMHead(features, cfg["out_channels"],
                                with_output=False, dtype=self.dtype,
                                name="depth_feat")(taps, ph, pw, (oh, ow))
        idepth = jax.lax.stop_gradient(idepth)
        max_id = jax.lax.stop_gradient(
            idepth.reshape(b, -1).max(axis=1))[:, None, None] + 1e-8
        disp = idepth / max_id * self.idepth_scale * ow + 0.01
        d_feats = [jax.lax.stop_gradient(f[:b]) for f in d_feats]
        return d_feats, p1[:b], p1[b:], disp


class _ConvBlock(nn.Module):
    """extractor.py:11-46 `ConvBlock`: conv(bias) + norm1 + relu. The torch
    module registers dead norm2/norm3 params for batch norm (converter
    marks them unused)."""
    features: int
    norm: str = "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        elif self.norm == "instance":
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, epsilon=1e-5,
                             name="norm1")(x)
        return nn.relu(x)


class DefomBasicEncoder(nn.Module):
    """fnet with additive DAv2 path_1 fusion (extractor.py:163-241)."""
    output_dim: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, dfeats):
        x = nn.Conv(64, (7, 7), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                         use_scale=False, epsilon=1e-5, name="norm1")(x)
        x = nn.relu(x)
        n = 0
        for dim, stride in ((64, 1), (96, 2), (128, 2)):
            x = RAFTResBlock(dim, "instance", stride, dtype=self.dtype,
                             name=f"RAFTResBlock_{n}")(x)
            x = RAFTResBlock(dim, "instance", 1, dtype=self.dtype,
                             name=f"RAFTResBlock_{n + 1}")(x)
            n += 2
        x = x + _ConvBlock(128, "instance", dtype=self.dtype,
                           name="convd")(dfeats)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


class DefomMultiEncoder(nn.Module):
    """cnet with per-scale additive DAv2 feature fusion
    (extractor.py:243-345). drop_path is identity at inference."""
    hidden_dims: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, d_feats, train: bool = False):
        dt = self.dtype

        def bn(name):
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, dtype=dt, name=name)

        x = nn.Conv(64, (7, 7), padding="SAME", dtype=dt, name="conv1")(x)
        x = nn.relu(bn("norm1")(x))
        n = 0
        for dim, stride in ((64, 1), (96, 2), (128, 2)):
            x = RAFTResBlock(dim, "batch", stride, dtype=dt,
                             name=f"RAFTResBlock_{n}")(x)
            x = RAFTResBlock(dim, "batch", 1, dtype=dt,
                             name=f"RAFTResBlock_{n + 1}")(x)
            n += 2

        outputs = []
        feat = x + _ConvBlock(128, "batch", dtype=dt, name="conv08")(
            d_feats[0])
        pair = []
        for j in range(2):
            h = RAFTResBlock(128, "batch", 1, dtype=dt,
                             name=f"res08_{j}")(feat)
            pair.append(nn.Conv(self.hidden_dims[2], (3, 3), padding="SAME",
                                dtype=dt, name=f"out08_{j}")(h))
        outputs.append(tuple(pair))

        y = RAFTResBlock(128, "batch", 2, dtype=dt, name="RAFTResBlock_6")(x)
        y = RAFTResBlock(128, "batch", 1, dtype=dt, name="RAFTResBlock_7")(y)
        feat = y + _ConvBlock(128, "batch", dtype=dt, name="conv16")(
            d_feats[1])
        pair = []
        for j in range(2):
            h = RAFTResBlock(128, "batch", 1, dtype=dt,
                             name=f"res16_{j}")(feat)
            pair.append(nn.Conv(self.hidden_dims[1], (3, 3), padding="SAME",
                                dtype=dt, name=f"out16_{j}")(h))
        outputs.append(tuple(pair))

        z = RAFTResBlock(128, "batch", 2, dtype=dt, name="RAFTResBlock_8")(y)
        z = RAFTResBlock(128, "batch", 1, dtype=dt, name="RAFTResBlock_9")(z)
        feat = z + _ConvBlock(128, "batch", dtype=dt, name="conv32")(
            d_feats[2])
        outputs.append(tuple(
            nn.Conv(self.hidden_dims[0], (3, 3), padding="SAME", dtype=dt,
                    name=f"out32_{j}")(feat) for j in range(2)))
        return outputs  # [(h04,c04), (h08,c08), (h16,c16)] fine→coarse


def _maybe_blend(skip_unemitted, emit, disp, mask, factor):
    """Convex upsample, skipped on un-emitted eval iterations (the
    reference upsamples only the final one, defom_stereo.py:168)."""
    def blend(d, m):
        return ops.convex_upsample(d.astype(jnp.float32),
                                   m.astype(jnp.float32), factor)

    if not skip_unemitted:
        return blend(disp, mask)
    b, h, w = disp.shape
    return jax.lax.cond(
        emit, blend,
        lambda d, m: jnp.zeros((b, h * factor, w * factor), jnp.float32),
        disp, mask)


class _DEFOMScaleStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    scale_list: Sequence[float]
    scale_corr_radius: int
    factor: int
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, pyramid, contexts, x0):
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        looks = [corr_lookup_1d(pyramid[:1], x0 - s * disp,
                                self.scale_corr_radius)
                 for s in self.scale_list]
        corr = jnp.concatenate(looks, axis=-1)
        flow = disp[..., None]
        nets, mask, x_disp = BasicMultiUpdateBlock(
            self.hidden_dims, self.n_gru_layers, self.factor,
            flow_channels=1, dtype=self.dtype, name="scale_update_block")(
                nets, contexts, corr, flow)
        scale = jnp.clip(jnp.exp(0.25 * x_disp[..., 0]), 0.0, 6.0)
        disp = scale * disp
        disp_up = _maybe_blend(self.skip_unemitted, emit, disp, mask,
                               self.factor)
        return (nets, disp), disp_up


class _DEFOMStep(nn.Module):
    hidden_dims: Sequence[int]
    n_gru_layers: int
    corr_radius: int
    corr_levels: int
    factor: int
    skip_unemitted: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, emit, pyramid, contexts, x0):
        nets, disp = carry
        disp = jax.lax.stop_gradient(disp)
        corr = corr_lookup_1d(pyramid, x0 - disp, self.corr_radius)
        nets, mask, delta = BasicMultiUpdateBlock(
            self.hidden_dims, self.n_gru_layers, self.factor,
            flow_channels=1, dtype=self.dtype, name="update_block")(
                nets, contexts, corr, disp[..., None])
        lim = 2.0 ** (self.corr_levels - 1) * self.corr_radius
        disp = disp + jnp.clip(delta[..., 0], -lim, lim)
        disp_up = _maybe_blend(self.skip_unemitted, emit, disp, mask,
                               self.factor)
        return (nets, disp), disp_up


class DEFOMStereo(nn.Module):
    dinov2_encoder: str = "vits"
    idepth_scale: float = 0.5
    hidden_dims: Sequence[int] = (128, 128, 128)
    corr_levels: int = 2
    corr_radius: int = 4
    scale_list: Sequence[float] = (0.125, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5,
                                   2.0)
    scale_corr_radius: int = 2
    n_downsample: int = 2
    n_gru_layers: int = 3
    train_iters: int = 18
    valid_iters: int = 32
    scale_iters: int = 8
    imagenet_norm_input: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 iters: int | None = None, scale_iters: int | None = None):
        iters = iters or (self.train_iters if train else self.valid_iters)
        scale_iters = min(self.scale_iters if scale_iters is None
                          else scale_iters, iters)
        factor = 2 ** self.n_downsample
        b, h, w, _ = left.shape
        io_sizes = get_danv2_io_size(h, w, factor)
        h4, w4 = io_sizes[2], io_sizes[3]

        # images stay ImageNet-normalized throughout (defom_stereo.py:116)
        img1, img2 = left, right
        if not self.imagenet_norm_input:
            mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
            std = jnp.asarray(IMAGENET_STD, left.dtype)
            img1 = (left - mean) / std
            img2 = (right - mean) / std

        both = jnp.concatenate([img1, img2], axis=0)
        d_feats, dfeat1, dfeat2, disp = DefomEncoder(
            self.dinov2_encoder, self.idepth_scale, dtype=self.dtype,
            name="defomencoder")(both, io_sizes)

        cnet_out = DefomMultiEncoder(self.hidden_dims, dtype=self.dtype,
                                     name="cnet")(img1, d_feats, train)
        fmaps = DefomBasicEncoder(256, dtype=self.dtype, name="fnet")(
            both, jnp.concatenate([dfeat1, dfeat2], axis=0))
        fmap1 = fmaps[:b].astype(jnp.float32)
        fmap2 = fmaps[b:].astype(jnp.float32)

        nets = tuple(jnp.tanh(hh) for hh, _ in cnet_out)
        contexts = []
        for i, (_, cc) in enumerate(cnet_out):
            cc = nn.relu(cc)
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr_{i}")(cc)
            contexts.append(tuple(jnp.split(z, 3, axis=-1)))
        contexts = tuple(contexts)

        corr = all_pairs_correlation(fmap1, fmap2)
        pyramid = tuple(build_corr_pyramid(corr, self.corr_levels))
        x0 = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4))
        disp = disp.astype(jnp.float32)

        n2 = iters - scale_iters
        if train:
            emit1 = jnp.ones((scale_iters,), bool)
            emit2 = jnp.ones((n2,), bool)
        else:  # eval reads ups2[-1], or ups1[-1] when the refine is empty
            emit1 = (jnp.arange(scale_iters) == scale_iters - 1) if n2 == 0 \
                else jnp.zeros((scale_iters,), bool)
            emit2 = jnp.arange(n2) == n2 - 1
        scale_step = nn.scan(
            _DEFOMScaleStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 3,
            out_axes=0, length=scale_iters,
        )(self.hidden_dims, self.n_gru_layers, self.scale_list,
          self.scale_corr_radius, factor, skip_unemitted=not train,
          dtype=self.dtype, name="scale_phase")
        (nets, disp), ups1 = scale_step((nets, disp), emit1, pyramid,
                                        contexts, x0)

        step = nn.scan(
            _DEFOMStep, variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False}, in_axes=(0,) + (nn.broadcast,) * 3,
            out_axes=0, length=n2,
        )(self.hidden_dims, self.n_gru_layers, self.corr_radius,
          self.corr_levels, factor, skip_unemitted=not train,
          dtype=self.dtype, name="refine_phase")
        (nets, disp), ups2 = step((nets, disp), emit2, pyramid, contexts, x0)

        if train:
            return ([ups1[i] for i in range(ups1.shape[0])]
                    + [ups2[i] for i in range(ups2.shape[0])])
        # iters == scale_iters → the refine scan has length 0
        return ups2[-1] if ups2.shape[0] else ups1[-1]


def DEFOMStereo_S(**kw) -> DEFOMStereo:
    return DEFOMStereo(dinov2_encoder="vits", **kw)


def DEFOMStereo_L(**kw) -> DEFOMStereo:
    return DEFOMStereo(dinov2_encoder="vitl", **kw)
