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
