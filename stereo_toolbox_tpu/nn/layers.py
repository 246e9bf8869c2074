"""Core conv/norm blocks shared by every model (flax.linen, channels-last).

These are the TPU-native analogues of the `convbn`/`convbn_3d`/`BasicBlock`
helpers every reference model re-vendors (e.g. models/PSMNet/submodule.py:10-43,
models/GwcNet/submodule.py:11-21). 2D vs 3D is selected by the kernel rank —
inputs are ``[B, H, W, C]`` or ``[B, D, H, W, C]`` and convolutions run as
NHWC/NDHWC so C rides the TPU lane axis.

BatchNorm semantics mirror torch (momentum 0.1 → flax momentum 0.9,
eps 1e-5). Cross-replica stat sync (SyncBN, trainer_torchrun.py:112-113) comes
for free under pjit: a mean over a sharded batch axis is a global mean.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# Global default for 3D conv lowering: 'native' (XLA NDHWC conv),
# 'via2d' (kd-folded 2D conv, ops/conv3d.py), 'fused' (Pallas conv+BN+ReLU
# eval kernel, ops/pallas/conv3d_fused.py, TPU eval path only), or 'auto'.
# The param tree is IDENTICAL for every impl (Conv_0/kernel [+ BatchNorm_0])
# — the impl is chosen at apply time, so checkpoints are portable across
# settings. 'auto' = fused on the TPU eval path where eligible, else native
# (chosen from end-to-end PSMNet latency on the chip, see BENCH_KERNELS.md).
CONV3D_DEFAULT = __import__("os").environ.get("STTPU_CONV3D", "auto")


def _tuple(k, n: int) -> tuple:
    if isinstance(k, (tuple, list)):
        assert len(k) == n
        return tuple(k)
    return (k,) * n


def avg_pool(x: jax.Array, window, stride=None) -> jax.Array:
    """Floor-mode average pool over the spatial axes (torch AvgPool semantics,
    count_include_pad irrelevant since there is no padding)."""
    n_spatial = x.ndim - 2
    window = _tuple(window, n_spatial)
    stride = _tuple(stride if stride is not None else window, n_spatial)
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "VALID")
    denom = 1.0
    for w in window:
        denom *= w
    return out / denom


def max_pool(x: jax.Array, window, stride=None, padding="VALID") -> jax.Array:
    n_spatial = x.ndim - 2
    window = _tuple(window, n_spatial)
    stride = _tuple(stride if stride is not None else window, n_spatial)
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides,
                                 padding)


class Conv3dFlex(nn.Module):
    """3D convolution whose param tree is byte-identical to ``nn.Conv``
    (``kernel`` [+ ``bias``]) but whose lowering is selected at APPLY time:

      * ``'native'`` — XLA's NDHWC ``conv_general_dilated``
      * ``'via2d'``  — kd-folded 2D conv (ops/conv3d.py), faster for
        narrow-output (Co≤32) cost-volume shapes

    Because the params do not depend on the impl, checkpoints and torch
    imports are portable across impl settings (round-2 regression fix).
    ``__call__(x, raw=True)`` registers and returns ``(kernel, bias)``
    without computing — the fused Pallas eval path uses this.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (1, 1, 1)  # symmetric pixels per spatial dim
    dilation: Sequence[int] = (1, 1, 1)
    use_bias: bool = False
    impl: str = "native"
    # he_normal matches ConvBNAct's historical init; pass lecun_normal when
    # swapping in for a bare nn.Conv so training trajectories are unchanged
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, raw: bool = False):
        k = tuple(self.kernel_size)
        kernel = self.param("kernel", self.kernel_init,
                            k + (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if raw:
            return kernel, bias
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        if self.impl == "via2d" and tuple(self.dilation) == (1, 1, 1):
            from stereo_toolbox_tpu.ops.conv3d import conv3d_via_2d
            y = conv3d_via_2d(x, kernel, tuple(self.strides),
                              tuple(self.padding))
        elif self.impl == "d2d":
            # (kd, 1, 1) disparity-axis conv as a (kd, 1) 2D conv over
            # [B, D, H·W, C] — skips the 3D path's lowering overhead on
            # large volumes (16 vs 19.5 ms at 104×184×320×28; the native
            # path wins below ~2M voxels, callers pick by shape)
            kd, kh, kw = self.kernel_size
            assert (kh, kw) == (1, 1), self.kernel_size
            b, d, h, w, ci = x.shape
            pd = self.padding[0]
            y = jax.lax.conv_general_dilated(
                x.reshape(b, d, h * w, ci), kernel[:, 0],
                (self.strides[0], 1), ((pd, pd), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b, y.shape[1], h, w, self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, tuple(self.strides),
                tuple((p, p) for p in self.padding),
                rhs_dilation=tuple(self.dilation),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if bias is not None:
            y = y + bias
        return y


class BNAffine(nn.Module):
    """Registers BatchNorm-compatible variables (params ``scale``/``bias``,
    batch_stats ``mean``/``var`` — same names, shapes and inits as
    ``nn.BatchNorm``) and returns them raw instead of normalizing.

    Used by the fused eval path to fold eval-mode BN into the Pallas conv
    epilogue while keeping the checkpoint layout identical to the
    ``nn.BatchNorm`` the train path uses under the same ``BatchNorm_0`` scope.
    """
    features: int

    @nn.compact
    def __call__(self):
        shape = (self.features,)
        mean = self.variable("batch_stats", "mean",
                             lambda s: jnp.zeros(s, jnp.float32), shape)
        var = self.variable("batch_stats", "var",
                            lambda s: jnp.ones(s, jnp.float32), shape)
        scale = self.param("scale", nn.initializers.ones_init(), shape,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), shape,
                          jnp.float32)
        return mean.value, var.value, scale, bias


def _fused_eval_ok() -> bool:
    """The Pallas fused kernel only runs on a real TPU backend."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


class ConvBNAct(nn.Module):
    """Conv (2D or 3D by kernel rank) → optional BatchNorm → optional act.

    torch-parity padding: explicit symmetric `padding` pixels per spatial dim
    (`dilation if dilation > 1 else pad` convention is the caller's concern).

    3D convs create params under an explicit ``Conv_0`` scope via `Conv3dFlex`
    so the tree never depends on the lowering choice (`conv3d_impl` /
    ``STTPU_CONV3D``: 'native' | 'via2d' | 'fused' | 'auto').
    """
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int | None = None  # None → (k-1)//2 * dilation
    dilation: Sequence[int] | int = 1
    norm: bool = True
    act: Callable | None = nn.relu
    use_bias: bool | None = None  # default: no bias when normed
    conv3d_impl: str | None = None  # None → CONV3D_DEFAULT
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = x.ndim - 2
        k = _tuple(self.kernel_size, n)
        s = _tuple(self.strides, n)
        d = _tuple(self.dilation, n)
        if self.padding is None:
            p = tuple((kk - 1) // 2 * dd for kk, dd in zip(k, d))
        else:
            p = _tuple(self.padding, n)
        pad = tuple((pp, pp) for pp in p)
        bias = (not self.norm) if self.use_bias is None else self.use_bias

        if n != 3:
            x = nn.Conv(self.features, k, strides=s, padding=pad,
                        kernel_dilation=d, use_bias=bias, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal())(x)
        else:
            impl = self.conv3d_impl or CONV3D_DEFAULT
            fusible = (not train and self.norm and not bias
                       and k == (3, 3, 3) and s == (1, 1, 1)
                       and d == (1, 1, 1) and _fused_eval_ok())
            if impl == "auto":
                # 'native' wins END-TO-END on the chip (tools/bench_e2e.py:
                # native 38ms, via2d 50.7ms, fused-everywhere 72.4ms,
                # fused-at-Co<=32-only 75.3ms for PSMNet 480x640 bf16) even
                # though isolated microbenches rank fused (24.6 TF/s) and
                # via2d (29.5) above native (15.1) at the Co=32 shape
                # (BENCH_KERNELS.md) — in-context the Pallas call's 128-lane
                # channel padding and lost producer fusion cost more than
                # the MXU win. Keep 'fused'/'via2d' selectable per layer.
                impl = "native"
            conv = Conv3dFlex(self.features, k, s, p, d, use_bias=bias,
                              impl="via2d" if impl == "via2d" else "native",
                              dtype=self.dtype, name="Conv_0")
            if impl == "fused" and fusible:
                # Eval-path fusion: conv + BN affine (+ReLU) in one Pallas
                # kernel (ops/pallas/conv3d_fused.py). Same param tree as
                # the unfused path — BNAffine registers nn.BatchNorm's
                # variables under the same BatchNorm_0 scope.
                from stereo_toolbox_tpu.ops.pallas.conv3d_fused import \
                    conv3d_fused
                kernel, _ = conv(x, raw=True)
                mean, var, scale, beta = BNAffine(
                    self.features, name="BatchNorm_0")()
                sc = scale * jax.lax.rsqrt(var + 1e-5)
                dt = self.dtype or x.dtype
                y = conv3d_fused(x.astype(dt), kernel.astype(dt), sc,
                                 beta - mean * sc,
                                 relu=self.act is nn.relu)
                if self.act is not None and self.act is not nn.relu:
                    y = self.act(y)
                return y
            x = conv(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConcatVolumeConvBNAct(nn.Module):
    """First aggregation layer over a concat cost volume, computed WITHOUT
    materializing the volume: the 3×3×3 conv factorizes into 2D convs +
    diagonal assembly (ops.conv3d.conv3d_concat_volume) because the volume's
    left half is d-invariant and its right half a pure diagonal shift.

    Param tree is identical to ``build_concat_volume`` → ``ConvBNAct``
    (``Conv_0/kernel [3,3,3,2C,Co]`` + ``BatchNorm_0``), so checkpoints and
    torch imports (utils/torch_import.convert_psmnet) are unaffected.
    Replaces ~100 GFLOP of Co=32 3D conv with ~3 GFLOP of 2D convs at
    PSMNet's 480×640 eval shape (models/PSMNet/stackhourglass.py:111-123).
    """
    features: int
    max_disp: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left_f: jax.Array, right_f: jax.Array,
                 train: bool = False) -> jax.Array:
        from stereo_toolbox_tpu.ops.conv3d import conv3d_concat_volume
        c = left_f.shape[-1]
        # params live under Conv_0 for layout parity with ConvBNAct
        conv = Conv3dFlex(self.features, (3, 3, 3), dtype=self.dtype,
                          name="Conv_0")
        kernel, _ = conv(jnp.zeros((1, 1, 1, 1, 2 * c), left_f.dtype),
                         raw=True)
        dt = self.dtype or left_f.dtype
        x = conv3d_concat_volume(left_f.astype(dt), right_f.astype(dt),
                                 kernel.astype(dt), self.max_disp)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class BatchStatNorm(nn.Module):
    """BatchNorm that ALWAYS normalizes with the current batch's statistics
    and keeps no running stats — torch BN with ``track_running_stats=False``
    (STTR disables tracking on every BN, models/STTR/sttr.py
    `_disable_batchnorm_tracking`: "acts as InstanceNorm with affine when
    batch size is 1"). Params are ``scale``/``bias`` only."""
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


def torch_transpose_padding(kernel: Sequence[int],
                            strides: Sequence[int]) -> tuple:
    """Per-dim (lo, hi) flax ConvTranspose padding matching torch's
    ``ConvTranspose(k, s, padding=(k-1)//2, output_padding=s+2*((k-1)//2)-k)``
    — the standard "output is exactly s× the input" configuration (e.g.
    PSMNet stackhourglass.py:25-29 uses k=3, s=2, p=1, op=1). torch pads the
    dilated input with ``k-1-p`` low and ``k-1-p+op`` high; flax 'SAME'
    chooses a different offset (verified off-by-one), so parity requires the
    explicit asymmetric pads.
    """
    pads = []
    for k, s in zip(kernel, strides):
        p = (k - 1) // 2
        op = s + 2 * p - k
        lo = k - 1 - p
        pads.append((lo, lo + op))
    return tuple(pads)


class ConvTransposeBN(nn.Module):
    """Stride-2 transpose conv (2D/3D) doubling spatial dims → BatchNorm.

    torch-parity target: ``ConvTranspose3d(k=3, s=2, p=1, output_padding=1)``
    (models/PSMNet/stackhourglass.py:25-29) whose output is exactly 2× the
    input size — realized with `torch_transpose_padding` so imported torch
    checkpoints are numerically exact.
    """
    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 2
    norm: bool = True
    act: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = x.ndim - 2
        k = _tuple(self.kernel_size, n)
        s = _tuple(self.strides, n)
        x = nn.ConvTranspose(self.features, k, strides=s,
                             padding=torch_transpose_padding(k, s),
                             use_bias=not self.norm, dtype=self.dtype,
                             kernel_init=nn.initializers.he_normal())(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicResBlock(nn.Module):
    """Two 3×3 conv-bn with residual add (reference `BasicBlock`,
    models/PSMNet/submodule.py:21-43 — note: NO ReLU after the add)."""
    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = ConvBNAct(self.features, 3, self.strides, dilation=self.dilation,
                        dtype=self.dtype)(x, train)
        out = ConvBNAct(self.features, 3, 1, dilation=self.dilation,
                        act=None, dtype=self.dtype)(out, train)
        if self.downsample:
            x = ConvBNAct(self.features, 1, self.strides, padding=0, act=None,
                          dtype=self.dtype)(x, train)
        return out + x


class FeatureAtt(nn.Module):
    """Feature-gated cost-volume attention (IGEV `FeatureAtt`,
    models/IGEVStereo/submodule.py:228-241): a 2D feature map gates every
    disparity plane of the volume via a sigmoid."""
    cv_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, cv: jax.Array, feat: jax.Array,
                 train: bool = False) -> jax.Array:
        # cv: [B, D, H, W, Cv]; feat: [B, H, W, Cf]
        att = ConvBNAct(feat.shape[-1] // 2, 1, padding=0,
                        act=nn.leaky_relu, dtype=self.dtype)(feat, train)
        att = nn.Conv(self.cv_channels, (1, 1), dtype=self.dtype)(att)
        return jax.nn.sigmoid(att)[:, None] * cv


def dual_view_apply(feat_fn, left, right, train: bool):
    """Run a shared feature trunk on both stereo views.

    Train mode keeps two separate calls — the reference computes
    feature_extraction(left) then (right) sequentially, so each call sees
    per-view BatchNorm batch statistics (e.g. PSMNet
    stackhourglass.py:105-106). Eval mode batches the two views into one
    call: with running BN stats the math is identical per sample, and one
    batch-2 pass beats two batch-1 passes on the MXU (measured ~25-30%
    off the trunk time at Table-3 shapes).
    """
    if train:
        return feat_fn(left, True), feat_fn(right, True)
    b = left.shape[0]
    both = feat_fn(jnp.concatenate([left, right], axis=0), False)
    return (jax.tree_util.tree_map(lambda a: a[:b], both),
            jax.tree_util.tree_map(lambda a: a[b:], both))
