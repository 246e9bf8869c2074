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
