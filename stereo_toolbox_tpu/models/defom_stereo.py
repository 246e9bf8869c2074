"""DEFOMStereo (CVPR'25) — depth-foundation-model priors in a RAFT loop.

TPU-native re-design of models/DEFOMStereo/defom_stereo.py:
  * DefomEncoder: frozen DepthAnythingV2 run at a 14-multiple resolution
    ≈3.5× the 1/4 grid (utils.py:9-24 `get_danv2_io_size`); its relative
    inverse depth is normalized per image to ``idepth/max * idepth_scale * W/4
    + 0.01`` and used as the initial disparity (extractor.py:348-388);
  * fnet/cnet fuse the DAv2 decoder features into their 1/4-res trunks
    (extractor.py DefomEncoder-conditioned variants);
  * two-phase recurrence (defom_stereo.py:139-166): `scale_iters` iterations
    with a **scale update block** — lookup at ``x0 - s·disp`` for
    s ∈ scale_list with radius 2 (corr.py:144-160), update
    ``disp ← relu6(exp(0.25·x))·disp`` (update.py:190-195) — followed by
    additive updates with the delta clipped to the corr search range
    (defom_stereo.py:160-162). Both phases are `nn.scan`s;
  * S/L variants by `dinov2_encoder` ∈ {'vits', 'vitl'}.

Contract: train → list of full-res maps; eval → final map. The DAv2 trunk is
randomly initialized here (no network access) and frozen via stop_gradient —
see depth_anything_v2.py.
"""

from __future__ import annotations

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
                                                   BasicMultiUpdateBlock,
                                                   MultiBasicEncoder)
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         build_corr_pyramid, corr_lookup_1d)
from stereo_toolbox_tpu.ops.sampling import sample_1d


def _danv2_size(h4: int, w4: int, max_size: int = 2688):
    """14-multiple DAv2 input size ≈ 3.5× the 1/4 grid (utils.py:9-24)."""
    ih = min(-(-int(3.5 * h4) // PATCH) * PATCH, max_size // PATCH * PATCH)
    iw = min(-(-int(3.5 * w4) // PATCH) * PATCH, max_size // PATCH * PATCH)
    return ih, iw


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
        h4, w4 = h // factor, w // factor

        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        if self.imagenet_norm_input:
            img1 = 2.0 * (left * std + mean) - 1.0
            img2 = 2.0 * (right * std + mean) - 1.0
        else:
            img1, img2 = left, right

        # --- frozen DAv2 prior ------------------------------------------
        ih, iw = _danv2_size(h4, w4)
        danv2 = DepthAnythingV2(self.dinov2_encoder, dtype=self.dtype,
                                name="defomencoder")
        both = jnp.concatenate([left, right], axis=0)  # ImageNet-normalized
        both_r = ops.interpolate(both, (ih, iw), (1, 2), align_corners=True)
        idepth_all, feats = danv2(both_r, return_features=True)
        idepth_all = jax.lax.stop_gradient(idepth_all)
        dfeat = jax.lax.stop_gradient(feats["path_1"])

        idepth = ops.interpolate(idepth_all[:b], (h4, w4), (1, 2),
                                 align_corners=True)
        max_id = jax.lax.stop_gradient(
            idepth.reshape(b, -1).max(axis=1))[:, None, None] + 1e-8
        disp = idepth / max_id * self.idepth_scale * w4 + 0.01

        dfeat = ops.interpolate(dfeat, (h4, w4), (1, 2), align_corners=True)
        dfeat1, dfeat2 = dfeat[:b], dfeat[b:]

        # --- encoders with DAv2 fusion ----------------------------------
        fnet = BasicEncoder(256, "instance", dtype=self.dtype, name="fnet")
        ffuse = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        name="fnet_fuse")
        fmap1 = ffuse(jnp.concatenate(
            [fnet(img1), dfeat1.astype(img1.dtype)], -1)).astype(jnp.float32)
        fmap2 = ffuse(jnp.concatenate(
            [fnet(img2), dfeat2.astype(img2.dtype)], -1)).astype(jnp.float32)

        cnet_out = MultiBasicEncoder(self.hidden_dims, self.hidden_dims,
                                     norm="batch", dtype=self.dtype,
                                     name="cnet")(img1)
        cfuse = nn.Conv(self.hidden_dims[0] * 2, (3, 3), padding="SAME",
                        dtype=self.dtype, name="cnet_fuse")
        h0, c0 = cnet_out[0]
        fused = cfuse(jnp.concatenate(
            [h0, c0, dfeat1.astype(h0.dtype)], -1))
        cnet_out = [tuple(jnp.split(fused, 2, axis=-1))] + list(cnet_out[1:])

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
