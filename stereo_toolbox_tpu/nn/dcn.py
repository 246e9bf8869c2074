"""DeformableConv2d module — learned offsets/modulation + deformable conv.

Parity target: models/StereoAnywhere/dcn.py:6-30 (`DeformableConv2d`): an
offset conv and a modulator conv (both zero-initialized so the layer starts
as a plain convolution), modulation = 2·sigmoid(·), then the
`torchvision.ops.deform_conv2d` kernel — here `ops.dcn.deform_conv2d`.

The reference plumbs this behind a ``dcn`` switch on its StereoAnywhere
BasicConv (submodule.py:44-45) but never enables it in any shipped config;
our blocks expose the same off-by-default switch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.ops.dcn import deform_conv2d


class DeformableConv2d(nn.Module):
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    dilation: Sequence[int] | int = 1
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def pair(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        k = pair(self.kernel_size)
        s = pair(self.strides)
        p = pair(self.padding)
        d = pair(self.dilation)
        taps = k[0] * k[1]
        pad = tuple((pp, pp) for pp in p)

        # zero-init: the layer starts as an ordinary conv (dcn.py:31-44)
        offset = nn.Conv(2 * taps, k, strides=s, padding=pad,
                         kernel_dilation=d, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros_init(),
                         name="offset_conv")(x)
        modulator = 2.0 * jax.nn.sigmoid(
            nn.Conv(taps, k, strides=s, padding=pad, kernel_dilation=d,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros_init(),
                    name="modulator_conv")(x))
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            k + (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dt = self.dtype or x.dtype
        return deform_conv2d(x.astype(dt), offset.astype(dt),
                             kernel.astype(dt), mask=modulator.astype(dt),
                             bias=None if bias is None else bias.astype(dt),
                             stride=s, padding=p, dilation=d)
