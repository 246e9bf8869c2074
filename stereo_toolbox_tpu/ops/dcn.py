"""Modulated deformable convolution (DCNv2) — bilinear gather + matmul.

TPU-native equivalent of the `torchvision.ops.deform_conv2d` C++/CUDA kernel
the reference's StereoAnywhere wraps (models/StereoAnywhere/dcn.py:6-30).
Semantics match torchvision: per output position and kernel tap, the input is
bilinearly sampled at ``base_tap_position + learned_offset``, scaled by a
per-tap modulation mask, and reduced with the regular conv weights. Offsets
are interleaved (y, x) pairs, tap-major, matching torchvision's channel
layout. Out-of-image samples are zero.

The tap loop is statically unrolled (K = kh·kw is tiny) so the gather work
vectorizes over the image and the channel reduction is a single einsum on
the MXU. Parity: tests/test_dcn.py vs an independent NumPy implementation.

Note the reference *defines* its DCN wrapper but never enables it — no
`dcn=True` call site exists in the tree — so this op is capability parity
for user configs that turn it on (nn/dcn.py `DeformableConv2d`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_gather_2d(img: jax.Array, ys: jax.Array,
                       xs: jax.Array) -> jax.Array:
    """Sample ``img [B, H, W, C]`` at real-valued ``(ys, xs) [B, Ho, Wo]``;
    zero outside the image (torchvision deform_conv2d border semantics)."""
    b, h, w, c = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    out = 0.0
    for dy, fy in ((0, (1 - wy)), (1, wy)):
        for dx, fx in ((0, (1 - wx)), (1, wx)):
            yi = y0 + dy
            xi = x0 + dx
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            v = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yc, xc)
            out = out + v * (fy * fx) * valid[..., None]
    return out


def deform_conv2d(x: jax.Array, offset: jax.Array, weight: jax.Array,
                  mask: jax.Array | None = None,
                  bias: jax.Array | None = None,
                  stride=(1, 1), padding=(1, 1),
                  dilation=(1, 1)) -> jax.Array:
    """Modulated deformable 2D convolution.

    Args:
      x: ``[B, H, W, Ci]`` input.
      offset: ``[B, Ho, Wo, 2K]`` per-tap (y, x) offsets, tap-major
        interleaved (torchvision layout).
      weight: ``[kh, kw, Ci, Co]`` regular conv kernel.
      mask: optional ``[B, Ho, Wo, K]`` modulation (DCNv2).
      bias: optional ``[Co]``.
      stride/padding/dilation: per-dim ints or pairs.

    Returns:
      ``[B, Ho, Wo, Co]``.
    """
    def pair(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

    sh, sw = pair(stride)
    ph, pw = pair(padding)
    dh, dw = pair(dilation)
    kh, kw, ci, co = weight.shape
    k = kh * kw
    b, h, w, _ = x.shape
    ho, wo = offset.shape[1], offset.shape[2]
    assert offset.shape[-1] == 2 * k, (offset.shape, k)

    ys0 = jnp.arange(ho, dtype=x.dtype) * sh - ph
    xs0 = jnp.arange(wo, dtype=x.dtype) * sw - pw
    cols = []
    for t in range(k):
        i, j = divmod(t, kw)
        ys = ys0[None, :, None] + i * dh + offset[..., 2 * t]
        xs = xs0[None, None, :] + j * dw + offset[..., 2 * t + 1]
        v = bilinear_gather_2d(x, ys, xs)               # [B, Ho, Wo, Ci]
        if mask is not None:
            v = v * mask[..., t:t + 1]
        cols.append(v)
    col = jnp.stack(cols, axis=-2)                      # [B, Ho, Wo, K, Ci]
    out = jnp.einsum("bhwkc,kco->bhwo", col,
                     weight.reshape(k, ci, co),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
