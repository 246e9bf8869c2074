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


# The fused head is memory-superior (no D-expanded f32 volume: 4× less
# peak at the eval head) but measured perf-NEUTRAL at 1088×1920 (ACVNet
# 410→415 ms, GwcNet 291→293 — XLA already fuses the naive chain), so the
# default stays the naive chain; flip for memory-constrained resolutions.
FUSED_EVAL_HEAD = __import__("os").environ.get("STTPU_FUSED_HEAD", "0") == "1"


def softargmax_trilinear(cost: jax.Array, max_disp: int, out_h: int,
                         out_w: int) -> jax.Array:
    """``disparity_regression(softmax(interpolate(cost, (max_disp, H, W),
    align_corners=False), 1))`` without materializing the D-expanded
    volume.

    The cost-volume eval heads (PSMNet stackhourglass.py:139-153 and
    family) trilinearly upsample a ``[B, d, h, w]`` cost to full
    ``[B, D, H, W]`` (f32, 1.6 GB at 1088×1920) before softmax +
    soft-argmax. Trilinear is separable, so the D-axis expansion is a
    per-output-plane lerp of two adjacent input planes with static weights
    ``β_r = (r + 0.5)/f - 0.5`` — the softmax max/sum reductions can
    stream over the f phase-variants of the spatially-resized ``[B, d, H,
    W]`` tensor instead (4× less peak memory, ~3× less HBM traffic at
    f = 4). Exact same math up to float reassociation; edge clamping
    reproduces `interpolate`'s half-pixel clamp bitwise (the shifted
    planes replicate the boundary plane).

    Args:
      cost: ``[B, d, h, w]`` raw costs at volume resolution.
      max_disp: D = f·d output disparity planes (f integer).
    Returns:
      ``[B, out_h, out_w]`` disparity.
    """
    b, d, h, w = cost.shape
    f = max_disp // d
    assert f * d == max_disp, (max_disp, d)
    c = interpolate(cost.astype(jnp.float32), (out_h, out_w), (2, 3),
                    align_corners=False)
    cm = jnp.concatenate([c[:, :1], c[:, :-1]], 1)
    cp = jnp.concatenate([c[:, 1:], c[:, -1:]], 1)

    def phase(r):
        beta = (r + 0.5) / f - 0.5
        if beta == 0:
            return c
        other = cm if beta < 0 else cp
        ab = abs(beta)
        return (1.0 - ab) * c + ab * other

    planes = [phase(r) for r in range(f)]
    m = planes[0]
    for p in planes[1:]:
        m = jnp.maximum(m, p)
    m = m.max(axis=1, keepdims=True)
    kf = (f * jnp.arange(d, dtype=jnp.float32))[None, :, None, None]
    s0 = 0.0
    s1 = 0.0
    for r, p in enumerate(planes):
        e = jnp.exp(p - m)
        s0 = s0 + e.sum(axis=1)
        s1 = s1 + ((kf + r) * e).sum(axis=1)
    return s1 / s0


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


def _resize_axis_cubic(x: jax.Array, axis: int, out_size: int,
                       align_corners: bool) -> jax.Array:
    """One axis of torch ``F.interpolate(mode='bicubic')``: 4-tap cubic
    convolution with A = -0.75 (Keys kernel as PyTorch implements it) and
    index clamping at the borders. jax.image.resize uses A = -0.5, which
    does NOT match torch."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners and out_size > 1:
        pos = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / max(out_size - 1, 1))
    else:
        scale = in_size / out_size
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    base = jnp.floor(pos)
    t = (pos - base).astype(jnp.float32)
    a = -0.75

    def w_near(u):  # |u| <= 1
        return ((a + 2.0) * u - (a + 3.0)) * u * u + 1.0

    def w_far(u):  # 1 < |u| < 2
        return (((u - 5.0) * u + 8.0) * u - 4.0) * a

    ws = [w_far(t + 1.0), w_near(t), w_near(1.0 - t), w_far(2.0 - t)]
    out = 0.0
    for k, wk in enumerate(ws):
        idx = jnp.clip(base.astype(jnp.int32) + (k - 1), 0, in_size - 1)
        shape = [1] * x.ndim
        shape[axis] = out_size
        out = out + jnp.take(x, idx, axis=axis) * \
            wk.reshape(shape).astype(x.dtype)
    return out


def interpolate_bicubic(x: jax.Array, size: tuple[int, ...],
                        axes: tuple[int, ...],
                        align_corners: bool = False) -> jax.Array:
    """Separable bicubic resize matching torch ``F.interpolate(mode=
    'bicubic')`` (used by the reference's DepthAnything input transforms,
    e.g. StereoAnywhere/depth_anything_v2/dpt.py:231)."""
    assert len(size) == len(axes)
    for s, ax in zip(size, axes):
        x = _resize_axis_cubic(x, ax, s, align_corners)
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
