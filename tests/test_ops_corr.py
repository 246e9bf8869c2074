"""Tests for all-pairs correlation, pyramids, and windowed lookup."""

import numpy as np
import jax.numpy as jnp

from stereo_toolbox_tpu.ops import corr as corr_ops


def test_all_pairs_correlation():
    rng = np.random.RandomState(3)
    f1 = rng.randn(2, 4, 6, 16).astype(np.float32)
    f2 = rng.randn(2, 4, 7, 16).astype(np.float32)
    got = np.asarray(corr_ops.all_pairs_correlation(jnp.asarray(f1),
                                                    jnp.asarray(f2)))
    want = np.einsum("bhic,bhjc->bhij", f1, f2) / np.sqrt(16.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_corr_pyramid_shapes_and_values():
    corr = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 1, 1, 16))
    pyr = corr_ops.build_corr_pyramid(corr, 3)
    assert [p.shape[-1] for p in pyr] == [16, 8, 4]
    np.testing.assert_allclose(np.asarray(pyr[1])[0, 0, 0],
                               [0.5, 2.5, 4.5, 6.5, 8.5, 10.5, 12.5, 14.5])


def test_corr_lookup_center():
    # Single-level pyramid: lookup at integer x returns the ±r window.
    w2 = 16
    corr = jnp.asarray(
        np.arange(w2, dtype=np.float32).reshape(1, 1, 1, w2))
    x = jnp.asarray(np.array([[[7.0]]], np.float32))
    out = np.asarray(corr_ops.corr_lookup_1d([corr], x, radius=2))
    np.testing.assert_allclose(out[0, 0, 0], [5, 6, 7, 8, 9], rtol=1e-6)


def test_corr_lookup_multilevel_scaling():
    w2 = 16
    base = np.arange(w2, dtype=np.float32).reshape(1, 1, 1, w2)
    pyr = corr_ops.build_corr_pyramid(jnp.asarray(base), 2)
    x = jnp.asarray(np.array([[[8.0]]], np.float32))
    out = np.asarray(corr_ops.corr_lookup_1d(pyr, x, radius=1))
    # level 0 at x=8: [7, 8, 9]; level 1 at x=4: pooled values [6.5, 8.5, 10.5]
    np.testing.assert_allclose(out[0, 0, 0], [7, 8, 9, 6.5, 8.5, 10.5],
                               rtol=1e-6)


def test_volume_pyramid_and_lookup():
    rng = np.random.RandomState(4)
    vol = rng.randn(1, 2, 3, 8, 4).astype(np.float32)  # [B,H,W,D,C]
    pyr = corr_ops.build_volume_pyramid(jnp.asarray(vol), 2)
    assert pyr[0].shape == (1, 2, 3, 8, 4)
    assert pyr[1].shape == (1, 2, 3, 4, 4)
    np.testing.assert_allclose(
        np.asarray(pyr[1]),
        vol.reshape(1, 2, 3, 4, 2, 4).mean(axis=4), rtol=1e-6)

    x = jnp.asarray(np.full((1, 2, 3), 4.0, np.float32))
    out = np.asarray(corr_ops.volume_lookup_1d(pyr, x, radius=1))
    # L levels * (2r+1) * C channels
    assert out.shape == (1, 2, 3, 2 * 3 * 4)
    # Level 0 is channel-major, dx-minor (reference flatten order,
    # geometry.py:48-49): dx=0 of channel c sits at index c*3 + 1
    np.testing.assert_allclose(out[0, 1, 2, 1:12:3], vol[0, 1, 2, 4],
                               rtol=1e-6)


def test_alt_corr_matches_reg():
    """Memory-light lookup (the alt_cuda_corr role, reference
    corr.py:159-188) is numerically identical to the precomputed-pyramid
    path, including H-chunk padding remainders."""
    rng = np.random.RandomState(7)
    f1 = jnp.asarray(rng.randn(2, 11, 12, 16).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 11, 12, 16).astype(np.float32))
    x = jnp.asarray((rng.rand(2, 11, 12) * 14 - 1).astype(np.float32))

    corr = corr_ops.all_pairs_correlation(f1, f2)
    pyr = corr_ops.build_corr_pyramid(corr, 3)
    want = corr_ops.corr_lookup_1d(pyr, x, radius=2)
    got = corr_ops.corr_lookup_1d_alt(f1, f2, x, radius=2, num_levels=3,
                                      h_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_raft_alt_corr_impl_matches_reg():
    """RAFTStereo(corr_impl='alt') produces the same disparity as 'reg'
    with identical variables (reference raft_stereo.py:135-144 switch)."""
    import jax
    from stereo_toolbox_tpu.models import RAFTStereo

    rng = np.random.RandomState(8)
    left = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 32, 64, 3).astype(np.float32))
    reg = RAFTStereo(valid_iters=2)
    v = reg.init(jax.random.PRNGKey(0), left, right, train=False)
    want = reg.apply(v, left, right, train=False)
    got = RAFTStereo(valid_iters=2, corr_impl="alt").apply(
        v, left, right, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_banded_corr_matches_full_pyramid():
    """Banded relative volumes + lookup == full all-pairs pyramid lookup
    for in-band disparities (the exactness domain in ops/corr.py)."""
    rng = np.random.RandomState(11)
    b, h, w, c = 2, 3, 37, 16   # odd width exercises truncated pooling
    d_max, radius, margin, levels = 12, 4, 4, 3
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    # disparities spanning the whole exact domain incl. negatives
    disp = jnp.asarray(
        rng.uniform(-margin, d_max + margin, (b, h, w)).astype(np.float32))
    x0 = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))
    x = x0 - disp

    for normalize in (True, False):
        full = corr_ops.corr_lookup_1d(
            corr_ops.build_corr_pyramid(
                corr_ops.all_pairs_correlation(f1, f2, normalize=normalize),
                levels),
            x, radius)
        offs = corr_ops.band_offsets(levels, d_max, radius, margin)
        bands = corr_ops.build_corr_band_pyramid(
            f1, f2, levels, d_max, radius, margin, normalize=normalize)
        assert [bd.shape[-1] for bd in bands] == \
            [hi - lo + 1 for lo, hi in offs]
        got = corr_ops.corr_lookup_1d_banded(bands, x, offs, radius)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-4, atol=1e-4)


def test_banded_full_width_matches_reg_for_any_disp():
    """band_d_max(None, width) coverage == the 'reg' path for every
    disparity >= -margin, including ones far past the image width (both
    paths read exact zeros left of the image)."""
    rng = np.random.RandomState(7)
    b, h, w, c = 1, 2, 24, 8
    radius, margin, levels = 4, 2, 3
    d_max = corr_ops.band_d_max(None, w)
    assert d_max == w
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # disparities from the rectification slack to way past the image width
    disp = jnp.asarray(
        rng.uniform(-margin, 2 * w, (b, h, w)).astype(np.float32))
    x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w)) - disp
    full = corr_ops.corr_lookup_1d(
        corr_ops.build_corr_pyramid(
            corr_ops.all_pairs_correlation(f1, f2), levels), x, radius)
    offs = corr_ops.band_offsets(levels, d_max, radius, margin)
    bands = corr_ops.build_corr_band_pyramid(f1, f2, levels, d_max, radius,
                                             margin)
    got = corr_ops.corr_lookup_1d_banded(bands, x, offs, radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_banded_corr_out_of_band_is_zero():
    """Out-of-domain disparities read zeros (documented clamp semantics)."""
    b, h, w, c = 1, 2, 40, 8
    f1 = jnp.ones((b, h, w, c), jnp.float32)
    f2 = jnp.ones((b, h, w, c), jnp.float32)
    offs = corr_ops.band_offsets(1, 8, 4, 0)
    bands = corr_ops.build_corr_band_pyramid(f1, f2, 1, 8, 4, 0,
                                             normalize=False)
    # disp far beyond d_max → window entirely below the band → zeros
    x = jnp.full((b, h, w), -30.0) + jnp.arange(w, dtype=jnp.float32)
    out = np.asarray(corr_ops.corr_lookup_1d_banded(bands, x, offs, 4))
    assert np.all(out[:, :, 32:] == 0.0)


def test_volume_lookup_chunked_matches_dense():
    """low_memory role (FoundationStereo foundation_stereo.py:229-233):
    H-chunked GEV lookup equals the dense path (to reassociation)."""
    rng = np.random.RandomState(5)
    vol = jnp.asarray(rng.randn(2, 11, 6, 16, 3).astype(np.float32))
    pyr = corr_ops.build_volume_pyramid(vol, 2)
    x = jnp.asarray(rng.uniform(-1, 17, (2, 11, 6)).astype(np.float32))
    dense = corr_ops.volume_lookup_1d(pyr, x, radius=3)
    chunked = corr_ops.volume_lookup_1d_chunked(pyr, x, radius=3, h_chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_sttr_chunked_attention_matches_unchunked():
    """RelativeMHA row-chunking (the STTR OOM-resolution path) is
    numerically identical to the one-shot attention."""
    import jax
    from stereo_toolbox_tpu.models.sttr import RelativeMHA

    rng = np.random.RandomState(2)
    bp, w, c = 10, 12, 16
    q = jnp.asarray(rng.randn(bp, w, c).astype(np.float32))
    pos = jnp.asarray(rng.randn(w, w, c).astype(np.float32))

    full = RelativeMHA(num_heads=4)
    vs = full.init(jax.random.PRNGKey(0), q, q, q, pos)
    want = full.apply(vs, q, q, q, pos, return_raw=True)
    # budgets of a few rows' logits → forces lax.map with a ragged tail
    chunked = RelativeMHA(num_heads=4, attn_budget=4 * w * w * 4 * 3,
                          attn_chunk_budget=4 * w * w * 4 * 3)
    got = chunked.apply(vs, q, q, q, pos, return_raw=True)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-5, atol=1e-5)
