"""conv3d_via_2d parity vs lax.conv_general_dilated (NDHWC)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_toolbox_tpu.ops.conv3d import conv3d_via_2d


@pytest.mark.parametrize("kd,kh,kw,strides,pad", [
    (3, 3, 3, (1, 1, 1), None),
    (3, 3, 3, (2, 2, 2), None),
    (1, 3, 3, (1, 1, 1), None),
    (3, 3, 3, (1, 1, 1), (0, 1, 1)),
    (1, 1, 1, (1, 1, 1), (0, 0, 0)),
])
def test_conv3d_via_2d_matches_lax(kd, kh, kw, strides, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(kd, kh, kw, 5, 7).astype(np.float32))
    p = pad if pad is not None else ((kd - 1) // 2, (kh - 1) // 2,
                                     (kw - 1) // 2)
    want = jax.lax.conv_general_dilated(
        x, k, strides, tuple((pp, pp) for pp in p),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_via_2d(x, k, strides, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_via_2d_grad():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 6, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 3, 4).astype(np.float32))

    g1 = jax.grad(lambda kk: conv3d_via_2d(x, kk).sum())(k)
    g2 = jax.grad(lambda kk: jax.lax.conv_general_dilated(
        x, kk, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).sum())(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# conv3d_concat_volume: factorized first conv over the concat cost volume
# ---------------------------------------------------------------------------

import pytest
from stereo_toolbox_tpu.ops.conv3d import conv3d_concat_volume
from stereo_toolbox_tpu import ops as _ops


@pytest.mark.parametrize("d,h,w", [(8, 6, 12), (12, 5, 8), (4, 4, 4)])
def test_conv3d_concat_volume_matches_naive(d, h, w):
    """Exact (fp-reassociation-level) parity with conv3d over the built
    volume, covering D<W, D>W and the w≈d mask-boundary bands."""
    rng = np.random.RandomState(0)
    c, co = 5, 7
    left = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    right = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 3, 2 * c, co) * 0.2).astype(np.float32))

    vol = _ops.build_concat_volume(left, right, d)
    want = jax.lax.conv_general_dilated(
        vol, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_concat_volume(left, right, k, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# conv_transpose_2x_subpixel: phase-decomposed 2x transposed conv
# ---------------------------------------------------------------------------

from stereo_toolbox_tpu.ops.conv3d import conv_transpose_2x_subpixel


@pytest.mark.parametrize("n,shape", [(2, (2, 5, 7, 6)), (3, (2, 4, 5, 7, 6))])
def test_conv_transpose_2x_subpixel_matches_flax(n, shape):
    import flax.linen as nn
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    m = nn.ConvTranspose(3, (4,) * n, strides=(2,) * n, padding="SAME")
    v = m.init(rng, x)
    want = m.apply(v, x)
    got = conv_transpose_2x_subpixel(x, v["params"]["kernel"],
                                     v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# pointwise_conv_gwc_concat: factorized corr_stem_0 (FoundationStereo)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d,w", [(8, 12), (16, 10)])
def test_pointwise_conv_gwc_concat_matches_naive(d, w):
    rng = np.random.RandomState(0)
    h, g, c, co = 5, 4, 6, 9
    gwc = jnp.asarray(rng.randn(2, d, h, w, g).astype(np.float32))
    lp = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    rp = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(1, 1, 1, g + 2 * c, co) * 0.2)
                    .astype(np.float32))
    b = jnp.asarray(rng.randn(co).astype(np.float32))

    vol = jnp.concatenate(
        [gwc, _ops.build_concat_volume(lp, rp, d, mask_left=False)], -1)
    want = jax.lax.conv_general_dilated(
        vol, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = _ops.pointwise_conv_gwc_concat(gwc, lp, rp, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Conv3dFlex 'd2d' lowering: (kd,1,1) disparity conv over [B, D, H*W, C]
# ---------------------------------------------------------------------------


def test_conv3dflex_d2d_matches_native():
    from stereo_toolbox_tpu.nn.layers import Conv3dFlex
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 9, 4, 6, 5), jnp.float32)
    kw = dict(features=7, kernel_size=(5, 1, 1), padding=(2, 0, 0),
              use_bias=True)
    m_n = Conv3dFlex(impl="native", **kw)
    m_d = Conv3dFlex(impl="d2d", **kw)
    v = m_n.init(rng, x)
    np.testing.assert_allclose(np.asarray(m_d.apply(v, x)),
                               np.asarray(m_n.apply(v, x)),
                               rtol=1e-5, atol=1e-5)
