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
