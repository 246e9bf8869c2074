"""Fast 3D convolution for cost volumes: decomposition into 2D convs.

Profiling on TPU v5e shows XLA's native NDHWC `conv_general_dilated` reaches
only ~9% of the MXU roofline for the cost-volume aggregation shapes
(C=32..64, D=48, 3×3×3). Folding the disparity axis into the batch axis and
expressing the kernel as kd 2D convolutions summed with D-shifts maps onto
XLA's mature 2D conv path:

    out[:, do] = Σ_kd  conv2d(x[:, do*sd + kd - pd], W[kd])

Used by `nn.layers.ConvBNAct` for all 3D convs (flag `conv3d_via_2d`).
Parity with `lax.conv_general_dilated` is covered in tests/test_conv3d.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv3d_via_2d(x: jax.Array, kernel: jax.Array,
                  strides=(1, 1, 1), padding=None) -> jax.Array:
    """3D conv over ``[B, D, H, W, C]`` with kernel ``[kd, kh, kw, Ci, Co]``.

    `padding`: per-dim symmetric pixels (defaults to (k-1)//2, i.e. SAME for
    odd kernels).
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    sd, sh, sw = strides
    if padding is None:
        padding = ((kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2)
    pd, ph, pw = padding

    d_out = (d + 2 * pd - kd) // sd + 1
    x2 = x.reshape(b * d, h, w, ci)

    # One 2D conv computing all kd taps at once: output width kd*Co keeps the
    # MXU columns busy (Co alone is typically 32 — a 25% ceiling on the
    # 128-wide systolic array).
    k2 = jnp.moveaxis(kernel, 0, 3).reshape(kh, kw, ci, kd * co)
    y = lax.conv_general_dilated(
        x2, k2, (sh, sw), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, d, ho, wo, kd, co)

    out = None
    for k in range(kd):
        # out[:, do] += y[:, do*sd + k - pd, ..., k] (zero outside [0, d))
        start = k - pd
        pad_lo = max(-start, 0)
        pad_hi = max((d_out - 1) * sd + start + 1 - d, 0)
        yk = y[:, :, :, :, k]
        yp = jnp.pad(yk, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
        sl = lax.slice_in_dim(yp, start + pad_lo,
                              start + pad_lo + (d_out - 1) * sd + 1,
                              stride=sd, axis=1)
        out = sl if out is None else out + sl
    return out


