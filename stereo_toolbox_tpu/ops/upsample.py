"""Resizing and learned upsampling ops.

Includes an `align_corners`-style linear resize (PyTorch `F.interpolate`
semantics, which `jax.image.resize` does not offer), RAFT convex upsampling
(models/RAFTStereo/raft_stereo.py:81-93) and IGEV superpixel context
upsampling (models/IGEVStereo/submodule.py:243-255).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize_axis_linear(x: jax.Array, axis: int, out_size: int,
                        align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners and out_size > 1:
        pos = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / max(out_size - 1, 1))
    else:
        scale = in_size / out_size
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, in_size - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0).astype(x.dtype)
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.clip(lo_i + 1, 0, in_size - 1)
    xl = jnp.take(x, lo_i, axis=axis)
    xh = jnp.take(x, hi_i, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return xl * (1 - w) + xh * w


def interpolate(x: jax.Array, size: tuple[int, ...], axes: tuple[int, ...],
                align_corners: bool = True) -> jax.Array:
    """Separable multi-linear resize over the given axes.

    With ``align_corners=True`` this matches
    ``torch.nn.functional.interpolate(mode='bilinear'/'trilinear',
    align_corners=True)`` as used throughout the reference (e.g.
    models/PSMNet/stackhourglass.py:139-153).
    """
    assert len(size) == len(axes)
    for s, a in zip(size, axes):
        x = _resize_axis_linear(x, a, s, align_corners)
    return x


def resize_nearest(x: jax.Array, size: tuple[int, ...],
                   axes: tuple[int, ...]) -> jax.Array:
    """Nearest-neighbor resize (PyTorch 'nearest' = floor indexing)."""
    for s, a in zip(size, axes):
        in_size = x.shape[a]
        idx = jnp.floor(jnp.arange(s) * (in_size / s)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, in_size - 1)
        x = jnp.take(x, idx, axis=a)
    return x


def upsample_disp_bilinear(disp: jax.Array, factor: int,
                           align_corners: bool = True) -> jax.Array:
    """Upsample a ``[B, h, w]`` disparity map by `factor`, scaling values.

    Parity: `upflow8`-style ``factor * F.interpolate`` pattern
    (models/RAFTStereo/utils/utils.py:82-84).
    """
    b, h, w = disp.shape
    up = interpolate(disp, (h * factor, w * factor), (1, 2),
                     align_corners=align_corners)
    return up * factor


def unfold3x3(x: jax.Array) -> jax.Array:
    """3×3 neighborhoods of a ``[B, H, W]`` map with zero padding.

    Returns ``[B, H, W, 9]``; window index k = 3*dy + dx (row-major, matching
    `F.unfold(x, [3, 3], padding=1)` channel ordering).
    """
    b, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    rows = [xp[:, i:i + h, j:j + w] for i in range(3) for j in range(3)]
    return jnp.stack(rows, axis=-1)


def convex_upsample(disp: jax.Array, mask_logits: jax.Array,
                    factor: int = 4) -> jax.Array:
    """RAFT convex upsampling: per-subpixel softmax blend of 3×3 neighbors.

    Parity: models/RAFTStereo/raft_stereo.py:81-93 (`upsample_flow`): the mask
    holds 9 logits per output subpixel; the coarse disparity is scaled by
    `factor` before blending.

    Args:
      disp: ``[B, h, w]`` coarse disparity.
      mask_logits: ``[B, h, w, 9 * factor * factor]`` (ordering: k-major, then
        subpixel row, then subpixel col — the channels-last analogue of the
        reference's ``view(N, 1, 9, factor, factor, H, W)``).
      factor: upsampling rate.

    Returns:
      ``[B, h * factor, w * factor]``.
    """
    b, h, w = disp.shape
    f = factor
    m = mask_logits.reshape(b, h, w, 9, f, f)
    m = jax.nn.softmax(m, axis=3)
    nb = unfold3x3(disp * f)  # [B, h, w, 9]
    up = jnp.einsum("bhwkij,bhwk->bhwij", m, nb)  # [B, h, w, f, f]
    up = up.transpose(0, 1, 3, 2, 4).reshape(b, h * f, w * f)
    return up


def context_upsample(disp_low: jax.Array, up_weights: jax.Array,
                     factor: int = 4) -> jax.Array:
    """IGEV superpixel upsampling.

    Parity: models/IGEVStereo/submodule.py:243-255: unfold the low-res
    disparity into 3×3 neighborhoods, nearest-upsample them ×factor, and blend
    with full-resolution softmax weights.

    Args:
      disp_low: ``[B, h, w]`` (already scaled to full-resolution units).
      up_weights: ``[B, h * factor, w * factor, 9]`` softmax weights.

    Returns:
      ``[B, h * factor, w * factor]``.
    """
    b, h, w = disp_low.shape
    nb = unfold3x3(disp_low)  # [B, h, w, 9]
    nb = resize_nearest(nb, (h * factor, w * factor), (1, 2))
    return (nb * up_weights).sum(axis=-1)
