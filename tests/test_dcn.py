"""Deformable conv parity vs an independent NumPy reference.

The op mirrors torchvision.ops.deform_conv2d (DCNv2 with modulation), the
kernel the reference's StereoAnywhere wraps (StereoAnywhere/dcn.py:6-30).
"""

import numpy as np
import jax.numpy as jnp

from stereo_toolbox_tpu.ops.dcn import deform_conv2d


def _np_deform_conv2d(x, offset, weight, mask, bias, stride, padding,
                      dilation):
    """Direct-loop NumPy implementation of modulated deformable conv."""
    b, h, w, ci = x.shape
    kh, kw, _, co = weight.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    ho, wo = offset.shape[1], offset.shape[2]
    out = np.zeros((b, ho, wo, co), np.float64)

    def sample(bi, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        acc = np.zeros(ci, np.float64)
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    acc += x[bi, yi, xi] * fy * fx
        return acc

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for t in range(kh * kw):
                    i, j = divmod(t, kw)
                    y = oy * sh - ph + i * dh + offset[bi, oy, ox, 2 * t]
                    xx = ox * sw - pw + j * dw + offset[bi, oy, ox,
                                                        2 * t + 1]
                    v = sample(bi, y, xx) * mask[bi, oy, ox, t]
                    out[bi, oy, ox] += v @ weight[i, j]
    if bias is not None:
        out += bias
    return out


def test_deform_conv2d_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    weight = (rng.randn(3, 3, 4, 5) * 0.2).astype(np.float32)
    offset = (rng.randn(2, 6, 7, 18) * 1.5).astype(np.float32)
    mask = rng.rand(2, 6, 7, 9).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)

    want = _np_deform_conv2d(x, offset, weight, mask, bias,
                             (1, 1), (1, 1), (1, 1))
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), jnp.asarray(mask),
                        jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_deform_conv2d_stride2():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    weight = (rng.randn(3, 3, 3, 4) * 0.2).astype(np.float32)
    offset = (rng.randn(1, 4, 4, 18) * 1.0).astype(np.float32)
    mask = rng.rand(1, 4, 4, 9).astype(np.float32)

    want = _np_deform_conv2d(x, offset, weight, mask, None,
                             (2, 2), (1, 1), (1, 1))
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), jnp.asarray(mask),
                        stride=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_deform_conv2d_zero_offset_is_plain_conv():
    """Zero offsets + unit mask == an ordinary convolution (the layer's
    init state, StereoAnywhere/dcn.py:31-44)."""
    import jax

    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    weight = (rng.randn(3, 3, 4, 5) * 0.2).astype(np.float32)
    offset = np.zeros((1, 6, 6, 18), np.float32)
    mask = np.ones((1, 6, 6, 9), np.float32)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deformable_conv2d_module():
    """Module starts as a plain conv (zero-init offsets, 2·sigmoid(0)=1
    modulation) and its params are gradient-reachable."""
    import jax
    from stereo_toolbox_tpu.nn.dcn import DeformableConv2d
    from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    mod = DeformableConv2d(6)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    want = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    blk = BasicConvBN(6, dcn=True)
    vb = blk.init(jax.random.PRNGKey(1), x)
    g = jax.grad(lambda p: jnp.sum(
        blk.apply({"params": p, "batch_stats": vb["batch_stats"]}, x,
                  train=True, mutable=["batch_stats"])[0] ** 2))(
        vb["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
