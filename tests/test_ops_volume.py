"""Unit tests for cost-volume ops against loop-based numpy oracles that
independently implement the reference formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_toolbox_tpu import ops


def _np_concat_volume(left, right, maxdisp):
    # Oracle for models/GwcNet/submodule.py:30-41 (NHWC layout).
    B, H, W, C = left.shape
    vol = np.zeros((B, maxdisp, H, W, 2 * C), np.float32)
    for d in range(maxdisp):
        vol[:, d, :, d:, :C] = left[:, :, d:, :]
        vol[:, d, :, d:, C:] = right[:, :, : W - d, :] if d else right
    return vol


def _np_gwc_volume(left, right, maxdisp, groups):
    B, H, W, C = left.shape
    cg = C // groups
    vol = np.zeros((B, maxdisp, H, W, groups), np.float32)
    for d in range(maxdisp):
        prod = left[:, :, d:, :] * (right[:, :, : W - d, :] if d else right)
        prod = prod.reshape(B, H, W - d, groups, cg).mean(-1)
        vol[:, d, :, d:, :] = prod
    return vol


@pytest.fixture
def feats():
    rng = np.random.RandomState(0)
    left = rng.randn(2, 5, 12, 8).astype(np.float32)
    right = rng.randn(2, 5, 12, 8).astype(np.float32)
    return left, right


def test_concat_volume(feats):
    left, right = feats
    got = np.asarray(ops.build_concat_volume(jnp.asarray(left),
                                             jnp.asarray(right), 6))
    np.testing.assert_allclose(got, _np_concat_volume(left, right, 6),
                               rtol=1e-6)


def test_gwc_volume(feats):
    left, right = feats
    got = np.asarray(ops.build_gwc_volume(jnp.asarray(left),
                                          jnp.asarray(right), 6, 4))
    np.testing.assert_allclose(got, _np_gwc_volume(left, right, 6, 4),
                               rtol=1e-5, atol=1e-6)


def test_norm_correlation_volume(feats):
    left, right = feats
    got = np.asarray(ops.build_norm_correlation_volume(
        jnp.asarray(left), jnp.asarray(right), 4))
    assert got.shape == (2, 4, 5, 12, 1)
    # d=0 plane equals per-pixel cosine similarity / C... the reference takes
    # mean over channels of the normalized product = cos_sim / C * C? Check:
    # mean(l_hat * r_hat) over C where l_hat = l/||l||: sum = cos, mean = cos/C.
    l, r = left[0, 0, 0], right[0, 0, 0]
    cos = (l / np.linalg.norm(l)) @ (r / np.linalg.norm(r))
    np.testing.assert_allclose(got[0, 0, 0, 0, 0], cos / left.shape[-1],
                               rtol=1e-4)
    # masked region is zero
    assert np.all(got[:, 3, :, :3] == 0)


def test_correlation_volume(feats):
    left, right = feats
    got = np.asarray(ops.build_correlation_volume(
        jnp.asarray(left), jnp.asarray(right), 4))
    want = (left[0, 2, 5] * right[0, 2, 3]).sum() / np.sqrt(8.0)
    np.testing.assert_allclose(got[0, 2, 2, 5, 0], want, rtol=1e-5)


def test_soft_argmax_peaked():
    # A delta distribution at disparity d must regress exactly d.
    cost = np.full((1, 8, 3, 3), -1e9, np.float32)
    cost[0, 5] = 0.0
    got = np.asarray(ops.soft_argmax(jnp.asarray(cost)))
    np.testing.assert_allclose(got, 5.0, atol=1e-5)


def test_disparity_regression_offset():
    prob = np.zeros((1, 4, 2, 2), np.float32)
    prob[0, 2] = 1.0
    got = np.asarray(ops.disparity_regression(jnp.asarray(prob), offset=10.0))
    np.testing.assert_allclose(got, 12.0)


def test_disparity_variance():
    prob = np.zeros((1, 8, 1, 1), np.float32)
    prob[0, 2, 0, 0] = 0.5
    prob[0, 6, 0, 0] = 0.5
    disp = np.asarray(ops.disparity_regression(jnp.asarray(prob)))
    np.testing.assert_allclose(disp[0, 0, 0], 4.0)
    var = np.asarray(ops.disparity_variance(jnp.asarray(prob),
                                            jnp.asarray(disp)))
    np.testing.assert_allclose(var[0, 0, 0], 4.0)


def test_acvnet_depthwise_matches_grouped_conv3d():
    """ACVNet's 'patch' conv (D folded into batch, 2D grouped conv) equals
    the reference-equivalent 3D grouped conv, for every dilation."""
    import jax
    import flax.linen as nn
    from stereo_toolbox_tpu.models.acvnet import ACVNet

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 4, 10, 12, 6).astype(np.float32))
    kern = jnp.asarray(rng.randn(1, 3, 3, 1, 6).astype(np.float32))
    class _W(nn.Module):
        dtype = None

        @nn.compact
        def __call__(self, x, dilation):
            return ACVNet._depthwise(self, x, dilation, "patch")

    model = _W()
    for dilation in (1, 2, 3):
        conv = nn.Conv(6, (1, 3, 3),
                       padding=((0, 0), (dilation, dilation),
                                (dilation, dilation)),
                       kernel_dilation=(1, dilation, dilation),
                       feature_group_count=6, use_bias=False)
        want = conv.apply({"params": {"kernel": kern}}, x)
        got = model.apply({"params": {"patch": {"kernel": kern}}},
                          x, dilation)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
