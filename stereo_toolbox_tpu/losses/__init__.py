"""Loss functions: supervised sequence losses and self-supervised losses.

Parity targets in the reference:
  * sequence (RAFT-weighted) loss — trainer/trainer_torchrun.py:277-284
  * multi-head weighted loss      — PSMNet-style staged heads
  * photometric loss              — loss_functions/photometric_loss.py
  * smoothness loss               — loss_functions/smoothness_loss.py
  * auto mask                     — loss_functions/auto_mask.py
  * split mode                    — loss_functions/split_mode.py

All losses use static-shape `where`-weighted means instead of boolean-mask
indexing (the reference's ``gt[mask]`` is shape-dynamic and un-jittable).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.metrics import masked_mean
from stereo_toolbox_tpu.ops.sampling import warp_right_to_left

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def smooth_l1(pred: jax.Array, target: jax.Array,
              beta: float = 1.0) -> jax.Array:
    """Elementwise smooth-L1 (Huber), PyTorch `F.smooth_l1_loss` semantics."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_smooth_l1(pred: jax.Array, gt: jax.Array,
                     mask: jax.Array) -> jax.Array:
    gt = jnp.where(mask, gt, 0.0)
    pred = jnp.where(mask, pred, 0.0)
    return masked_mean(smooth_l1(pred, gt), mask)


def sequence_loss(disp_preds: Sequence[jax.Array], gt: jax.Array,
                  mask: jax.Array, init_disp: jax.Array | None = None,
                  loss_gamma: float = 0.9) -> jax.Array:
    """RAFT-style exponentially weighted smooth-L1 over prediction sequence.

    Parity: trainer/trainer_torchrun.py:277-284 —
    ``loss = L1(init) + Σ_i γ'^(n-1-i) L1(pred_i)`` with
    ``γ' = loss_gamma^(15/(n-1))``.

    `disp_preds` may be a list of ``[B, H, W]`` maps or a stacked
    ``[n, B, H, W]`` array.
    """
    if isinstance(disp_preds, (list, tuple)):
        preds = list(disp_preds)
    else:
        preds = [disp_preds[i] for i in range(disp_preds.shape[0])]
    n = len(preds)
    loss = 0.0
    if init_disp is not None:
        loss = masked_smooth_l1(init_disp, gt, mask)
    gamma = loss_gamma ** (15.0 / (n - 1)) if n > 1 else 1.0
    for i, p in enumerate(preds):
        loss = loss + (gamma ** (n - i - 1)) * masked_smooth_l1(p, gt, mask)
    return loss


def multi_head_loss(disp_preds: Sequence[jax.Array], gt: jax.Array,
                    mask: jax.Array,
                    weights: Sequence[float]) -> jax.Array:
    """Fixed-weight multi-head smooth-L1 (PSMNet/GwcNet staged heads)."""
    assert len(disp_preds) == len(weights)
    loss = 0.0
    for w, p in zip(weights, disp_preds):
        loss = loss + w * masked_smooth_l1(p, gt, mask)
    return loss


def _avg_pool2d_same(x: jax.Array, window: int) -> jax.Array:
    """Stride-1 window mean over H, W of an ``[B, H, W, C]`` tensor with
    reflect pre-padding (so the output keeps the input shape)."""
    pad = window // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1), padding="VALID")
    return out / (window * window)


def ssim(x: jax.Array, y: jax.Array, window_size: int = 7) -> jax.Array:
    """SSIM distance map ``(1 - SSIM)/2`` clipped to [0, 1].

    Parity: loss_functions/photometric_loss.py:40-77 (reflect padding, plain
    box filter windows, C1=0.01², C2=0.03²).

    Args:
      x, y: ``[B, H, W, C]`` images in [0, 1].
    """
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x = _avg_pool2d_same(x, window_size)
    mu_y = _avg_pool2d_same(y, window_size)
    sigma_x = _avg_pool2d_same(x * x, window_size) - mu_x ** 2
    sigma_y = _avg_pool2d_same(y * y, window_size) - mu_y ** 2
    sigma_xy = _avg_pool2d_same(x * y, window_size) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def photometric_loss(left: jax.Array, right: jax.Array,
                     disp: jax.Array | None = None,
                     ssim_weight: float = 0.85,
                     enable_mask: bool = True) -> jax.Array:
    """Self-supervised reconstruction loss map.

    Parity: loss_functions/photometric_loss.py:80-104 —
    ``0.85*SSIM + 0.15*L1`` of the disparity-warped right image vs the left,
    meaned over channels; out-of-view pixels masked when `enable_mask`.

    Args:
      left, right: ``[B, H, W, C]`` images in [0, 1].
      disp: ``[B, H, W]`` left-view disparity (None → identity comparison).

    Returns:
      ``[B, H, W]`` per-pixel loss.
    """
    if disp is None:
        warped, valid = right, None
    else:
        warped, valid = warp_right_to_left(right, disp, return_mask=True)
    loss = ssim_weight * ssim(left, warped) + (
        1 - ssim_weight) * jnp.abs(left - warped)
    loss = loss.mean(axis=-1)
    if enable_mask and valid is not None:
        loss = loss * valid
    return loss


def smoothness_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware first-order disparity smoothness.

    Parity: loss_functions/smoothness_loss.py:5-43 (mean-normalized disparity,
    ``exp(-|∂img|)`` weights, mean of both directional terms).

    Args:
      disp: ``[B, H, W]``.
      img: ``[B, H, W, C]`` in [0, 1].
    """
    mean_disp = disp.mean(axis=(1, 2), keepdims=True)
    norm = disp / (mean_disp + 1e-7)
    ddx = jnp.abs(norm[:, :, :-1] - norm[:, :, 1:])
    ddy = jnp.abs(norm[:, :-1, :] - norm[:, 1:, :])
    idx = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).mean(axis=-1)
    idy = jnp.abs(img[:, :-1, :] - img[:, 1:, :]).mean(axis=-1)
    return (ddx * jnp.exp(-idx)).mean() + (ddy * jnp.exp(-idy)).mean()


def auto_mask(left: jax.Array, right: jax.Array, disp: jax.Array,
              denorm: bool = False) -> jax.Array:
    """Monodepth2-style automask: reprojection beats identity.

    Parity: loss_functions/auto_mask.py:7-17.

    Returns:
      ``[B, H, W]`` boolean mask.
    """
    if denorm:
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        left = left * std + mean
        right = right * std + mean
    reproj = photometric_loss(left, right, jax.lax.stop_gradient(disp),
                              enable_mask=False)
    identity = photometric_loss(left, right, None, enable_mask=False)
    return reproj < identity


def selfsup_loss(disp: jax.Array, left: jax.Array, right: jax.Array,
                 smooth_weight: float = 0.1,
                 imagenet_norm: bool = True) -> jax.Array:
    """Full self-supervised objective for one disparity prediction:
    auto-masked photometric reconstruction + edge-aware smoothness.

    Composes the reference's loss_functions exactly as SURVEY §3.5
    describes (photometric_loss.py:80-104 + auto_mask.py:7-17 +
    smoothness_loss.py:5-43); the trainer dispatches it when
    ``TrainConfig.loss == 'selfsup'`` so no-GT data (e.g. Holopix50k,
    datasets/holopix50k.py) can be trained on end-to-end.

    Args:
      disp: ``[B, H, W]`` predicted left-view disparity (full res).
      left, right: the dataloader images (ImageNet-normalized when
        ``imagenet_norm`` — de-normalized to [0, 1] internally, the
        reference's `de_norm` path, auto_mask.py:9-12).
    """
    if imagenet_norm:
        mean = jnp.asarray(IMAGENET_MEAN, left.dtype)
        std = jnp.asarray(IMAGENET_STD, left.dtype)
        left = left * std + mean
        right = right * std + mean
    am = auto_mask(left, right, disp)
    photo = photometric_loss(left, right, disp)
    loss = masked_mean(photo, am)
    return loss + smooth_weight * smoothness_loss(disp, left)


def selfsup_sequence_loss(outputs, left: jax.Array, right: jax.Array,
                          smooth_weight: float = 0.1,
                          loss_gamma: float = 0.9,
                          imagenet_norm: bool = True) -> jax.Array:
    """`selfsup_loss` over a model-output sequence with the RAFT
    exponential weighting (same schedule as the supervised
    `sequence_loss`, trainer_torchrun.py:277-284). Accepts a plain list,
    a stacked ``[n, B, H, W]`` array, or the iterative models'
    ``(init_disp, disp_preds)`` tuple."""
    init_disp = None
    if isinstance(outputs, tuple) and len(outputs) == 2:
        init_disp, outputs = outputs
    if isinstance(outputs, (list, tuple)):
        preds = list(outputs)
    else:
        preds = [outputs[i] for i in range(outputs.shape[0])]
    n = len(preds)
    loss = 0.0
    if init_disp is not None:
        loss = selfsup_loss(init_disp, left, right, smooth_weight,
                            imagenet_norm)
    gamma = loss_gamma ** (15.0 / (n - 1)) if n > 1 else 1.0
    for i, p in enumerate(preds):
        loss = loss + (gamma ** (n - i - 1)) * selfsup_loss(
            p, left, right, smooth_weight, imagenet_norm)
    return loss


def split_mode(prob: jax.Array, maxdisp: int | None = None):
    """Isolate the dominant mode of a D-axis probability volume.

    Parity: loss_functions/split_mode.py:9-35 — boundary scan around the
    argmax with the symmetric-radius fallback for asymmetric modes (the same
    logic as `disparity_estimators.modal_mask`).

    Args:
      prob: ``[B, D, H, W]``.

    Returns:
      (mode, mask): ``prob * mask`` and the float mask.
    """
    from stereo_toolbox_tpu.disparity_estimators import modal_mask
    del maxdisp
    mask = modal_mask(prob).astype(prob.dtype)
    return prob * mask, mask
