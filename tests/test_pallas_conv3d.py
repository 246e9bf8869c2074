"""Pallas conv3d parity vs lax conv (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_toolbox_tpu.ops.pallas.conv3d import conv3d_pallas


@pytest.mark.parametrize("ci,co,tile_h", [(8, 8, 2), (16, 8, 4)])
def test_conv3d_pallas_matches_lax(ci, co, tile_h):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 8, 10, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_pallas(x, k, tile_h=tile_h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_pallas_batch2():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 2, 4, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 8).astype(np.float32) * 0.1)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_pallas(x, k, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# conv3d_fused: conv + BN-affine + residual + ReLU in one kernel
# ---------------------------------------------------------------------------

from stereo_toolbox_tpu.ops.pallas.conv3d_fused import conv3d_fused  # noqa: E402


def _ref_fused(x, k, scale=None, bias=None, residual=None, relu=False):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    if residual is not None:
        y = y + residual
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("ci,co", [(8, 8), (16, 8)])
def test_conv3d_fused_plain(ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 8, 10, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    want = _ref_fused(x, k)
    got = conv3d_fused(x, k, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_fused_affine_relu():
    rng = np.random.RandomState(1)
    ci, co = 8, 8
    x = jnp.asarray(rng.randn(2, 3, 4, 6, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    want = _ref_fused(x, k, scale, bias, relu=True)
    got = conv3d_fused(x, k, scale, bias, relu=True, tile_h=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_fused_residual():
    rng = np.random.RandomState(2)
    ci, co = 8, 8
    x = jnp.asarray(rng.randn(1, 5, 4, 6, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(1, 5, 4, 6, co).astype(np.float32))
    scale = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    want = _ref_fused(x, k, scale, bias, residual=res, relu=True)
    got = conv3d_fused(x, k, scale, bias, residual=res, relu=True,
                      tile_h=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_fused_matches_convbnact_eval():
    """The fused eval path computes the same function as Conv3dFlex+BatchNorm
    (the unfused path) on identical variables."""
    import flax.linen as nn
    from stereo_toolbox_tpu.nn.layers import ConvBNAct

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 6, 8, 8).astype(np.float32))
    mod_native = ConvBNAct(8, 3, conv3d_impl="native")
    v = mod_native.init(jax.random.PRNGKey(0), x, train=False)
    # perturb batch_stats so the affine is non-trivial
    v = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.abs(rng.randn(*a.shape)).astype(a.dtype), v)
    want = mod_native.apply(v, x, train=False)
    got_via2d = ConvBNAct(8, 3, conv3d_impl="via2d").apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got_via2d), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_convbnact_param_tree_impl_invariant():
    """Round-2 regression: the param tree must not depend on the impl choice
    (checkpoint portability across STTPU_CONV3D settings)."""
    from stereo_toolbox_tpu.nn.layers import ConvBNAct

    x = jnp.zeros((1, 4, 6, 8, 8), jnp.float32)
    trees = {}
    for impl in ("native", "via2d"):
        v = ConvBNAct(8, 3, conv3d_impl=impl).init(
            jax.random.PRNGKey(0), x, train=False)
        trees[impl] = jax.tree_util.tree_structure(v)
        paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(v)[0]]
        assert any("Conv_0" in p and "kernel" in p for p in paths), paths
    assert trees["native"] == trees["via2d"]
