"""Pallas volume-kernel parity vs the XLA reference ops (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.ops.pallas.volume import (build_concat_volume_pallas,
                                                  build_gwc_volume_pallas)


def _feats(b=2, h=8, w=16, c=16, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)))


def test_gwc_pallas_matches_xla():
    left, right = _feats()
    want = np.asarray(ops.build_gwc_volume(left, right, 6, 4))
    got = np.asarray(build_gwc_volume_pallas(left, right, 6, 4, block_h=4,
                                             interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gwc_pallas_odd_block():
    left, right = _feats(b=1, h=6, w=8, c=8)
    want = np.asarray(ops.build_gwc_volume(left, right, 4, 2))
    got = np.asarray(build_gwc_volume_pallas(left, right, 4, 2, block_h=8,
                                             interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_concat_pallas_matches_xla():
    left, right = _feats(c=8)
    want = np.asarray(ops.build_concat_volume(left, right, 5))
    got = np.asarray(build_concat_volume_pallas(left, right, 5, block_h=2,
                                                interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gwc_pallas_w_tiled():
    """W ≥ 2 tiles: exercises the prev-tile shifted window and the w<d
    zero masking at tile 0 (the 1088×1920 configuration, round-4)."""
    left, right = _feats(b=1, h=2, w=256, c=8, seed=3)
    want = np.asarray(ops.build_gwc_volume(left, right, 48, 4))
    got = np.asarray(build_gwc_volume_pallas(left, right, 48, 4,
                                             interpret=True))
    assert got.shape == (1, 48, 2, 256, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sample_gather_pallas_matches_xla():
    """One-hot-MXU sample gather (CFNet cascade role) == the XLA gather,
    including zero-fill left of the image and prev-tile reads."""
    from stereo_toolbox_tpu.ops.pallas.sample_gather import (
        gather_right_by_samples_pallas, gwc_volume_from_samples_pallas)
    rng = np.random.RandomState(4)
    b, h, w, c = 1, 3, 256, 16
    right = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    left = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    samples = jnp.asarray(
        rng.randint(0, 97, (b, 5, h, w)).astype(np.float32))

    want = np.asarray(ops.gather_right_by_samples(right, samples))
    got = np.asarray(gather_right_by_samples_pallas(right, samples, 96,
                                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    want_g = np.asarray(ops.gwc_volume_from_samples(left, right, samples, 4))
    got_g = np.asarray(gwc_volume_from_samples_pallas(left, right, samples,
                                                      4, 96, interpret=True))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-4, atol=1e-4)
