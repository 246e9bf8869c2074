"""Shared IGEV-family blocks: leaky conv units, Conv2x fusion, MobileNetV2.

Parity targets: models/IGEVStereo/submodule.py:9-147 (`BasicConv`,
`BasicConv_IN`, `Conv2x`, `Conv2x_IN`) and the timm MobileNetV2 trunk used by
`Feature` (models/IGEVStereo/extractor.py:327-362). The reference loads
ImageNet-pretrained timm weights; this implementation trains the trunk from
scratch (pretrained-weight import is a later parity task).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.ops.upsample import resize_nearest


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class BasicConvBN(nn.Module):
    """conv/deconv (2D/3D by kernel rank of input) + BatchNorm + LeakyReLU
    (submodule.py:9-37). ``dcn`` swaps the 2D conv for a modulated
    deformable conv, mirroring the reference StereoAnywhere BasicConv's
    off-by-default switch (StereoAnywhere/submodule.py:44-47)."""
    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    deconv: bool = False
    norm: bool = True
    relu: bool = True
    dilation: int = 1
    dcn: bool = False
    # 3D-conv lowering ('native' | 'via2d'). On narrow-channel volumes
    # (C ≲ 32) XLA pads the minor channel axis to 128 lanes (4.6× HBM at
    # C=28) and the native conv3d reads that padded layout; the kd-folded
    # 2D lowering halves it (measured 28 → 14 ms per 3³ C=28 conv at
    # 736×1280). Param tree is impl-invariant (nn.layers.Conv3dFlex).
    conv3d_impl: str = "native"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = x.ndim - 2
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size,) * n
        s = self.strides if isinstance(self.strides, (tuple, list)) \
            else (self.strides,) * n
        if self.deconv:
            x = nn.ConvTranspose(self.features, k, strides=s, padding="SAME",
                                 use_bias=False, dtype=self.dtype)(x)
        elif self.dcn and n == 2:
            from stereo_toolbox_tpu.nn.dcn import DeformableConv2d
            x = DeformableConv2d(
                self.features, k, s,
                padding=tuple((kk - 1) // 2 * self.dilation for kk in k),
                dilation=self.dilation, dtype=self.dtype)(x)
        elif n == 3 and self.conv3d_impl != "native" and self.dilation == 1:
            from stereo_toolbox_tpu.nn.layers import Conv3dFlex
            x = Conv3dFlex(self.features, k, s,
                           tuple((kk - 1) // 2 for kk in k),
                           impl=self.conv3d_impl, use_bias=False,
                           kernel_init=nn.initializers.lecun_normal(),
                           dtype=self.dtype, name="Conv_0")(x)
        else:
            d = (self.dilation,) * n
            pad = tuple(((kk - 1) // 2 * dd,) * 2 for kk, dd in zip(k, d))
            x = nn.Conv(self.features, k, strides=s, padding=pad,
                        kernel_dilation=d, use_bias=False,
                        dtype=self.dtype)(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.relu:
            x = _leaky(x)
        return x


class BasicConvIN(nn.Module):
    """conv/deconv + InstanceNorm + LeakyReLU (submodule.py:85-108)."""
    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    deconv: bool = False
    norm: bool = True
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.ndim - 2
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size,) * n
        s = self.strides if isinstance(self.strides, (tuple, list)) \
            else (self.strides,) * n
        if self.deconv:
            x = nn.ConvTranspose(self.features, k, strides=s, padding="SAME",
                                 use_bias=False, dtype=self.dtype)(x)
        else:
            pad = tuple(((kk - 1) // 2,) * 2 for kk in k)
            x = nn.Conv(self.features, k, strides=s, padding=pad,
                        use_bias=False, dtype=self.dtype)(x)
        if self.norm:
            # torch InstanceNorm2d default: no affine params
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.relu:
            x = _leaky(x)
        return x


class Conv2x(nn.Module):
    """Up/down 2× + skip fusion (submodule.py:40-80). `instance_norm` picks
    the _IN variant (submodule.py:111-147)."""
    features: int
    deconv: bool = False
    concat: bool = True
    instance_norm: bool = False
    norm: bool = True
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, rem: jax.Array,
                 train: bool = False) -> jax.Array:
        k = 4 if self.deconv else 3
        if self.instance_norm:
            x = BasicConvIN(self.features, k, 2, deconv=self.deconv,
                            dtype=self.dtype)(x)
        else:
            x = BasicConvBN(self.features, k, 2, deconv=self.deconv,
                            dtype=self.dtype)(x, train)
        if x.shape[1:-1] != rem.shape[1:-1]:
            x = resize_nearest(x, rem.shape[1:-1],
                               tuple(range(1, x.ndim - 1)))
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            out_ch = self.features * 2
        else:
            x = x + rem
            out_ch = self.features
        if self.instance_norm:
            return BasicConvIN(out_ch, 3, 1, norm=self.norm, relu=self.relu,
                               dtype=self.dtype)(x)
        return BasicConvBN(out_ch, 3, 1, norm=self.norm, relu=self.relu,
                           dtype=self.dtype)(x, train)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual unit."""
    features: int
    strides: int = 1
    expand: int = 6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(cin * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(h)
            h = jnp.clip(h, 0, 6)  # ReLU6
        # explicit symmetric padding: timm pads 1 both sides; flax "SAME"
        # would pad (0, 1) for stride 2, shifting the grid by one pixel
        h = nn.Conv(h.shape[-1], (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), feature_group_count=h.shape[-1],
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        h = jnp.clip(h, 0, 6)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        if self.strides == 1 and cin == self.features:
            h = h + x
        return h


class MobileNetV2Trunk(nn.Module):
    """mobilenetv2_100 feature trunk, split at the reference's tap points
    (extractor.py:330-336: taps after blocks 0, 1, 2, 4, 5 → channels
    16/24/32/96/160 at strides 2/4/8/16/32)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jnp.clip(x, 0, 6)

        def stage(x, cfgs):
            for c, s, t in cfgs:
                x = InvertedResidual(c, s, t, dtype=self.dtype)(x, train)
            return x

        x2 = stage(x, [(16, 1, 1)])                                  # /2
        x4 = stage(x2, [(24, 2, 6), (24, 1, 6)])                     # /4
        x8 = stage(x4, [(32, 2, 6), (32, 1, 6), (32, 1, 6)])         # /8
        x16 = stage(x8, [(64, 2, 6), (64, 1, 6), (64, 1, 6),
                         (64, 1, 6),
                         (96, 1, 6), (96, 1, 6), (96, 1, 6)])        # /16
        x32 = stage(x16, [(160, 2, 6), (160, 1, 6), (160, 1, 6)])    # /32
        return x2, x4, x8, x16, x32


class IGEVFeature(nn.Module):
    """MobileNetV2 pyramid + deconv fusion → [x4(48), x8(64), x16(192),
    x32(160)] (extractor.py:327-362)."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        _, x4, x8, x16, x32 = MobileNetV2Trunk(dtype=self.dtype,
                                               name="trunk")(x, train)
        x16 = Conv2x(96, deconv=True, instance_norm=True,
                     dtype=self.dtype, name="deconv32_16")(x32, x16)
        x8 = Conv2x(32, deconv=True, instance_norm=True,
                    dtype=self.dtype, name="deconv16_8")(x16, x8)
        x4 = Conv2x(24, deconv=True, instance_norm=True,
                    dtype=self.dtype, name="deconv8_4")(x8, x4)
        x4 = BasicConvIN(48, 3, 1, dtype=self.dtype, name="conv4")(x4)
        return [x4, x8, x16, x32]
