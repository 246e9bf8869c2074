"""Tests for bilinear sampling / warping vs torch.grid_sample (CPU)."""

import jax
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stereo_toolbox_tpu.ops import sampling


def _torch_grid_sample(img_nhwc, coords_xy):
    """Reference semantics: pixel coords -> align_corners=True grid_sample
    (models/RAFTStereo/utils/utils.py:59-74)."""
    img = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    H, W = img.shape[-2:]
    c = torch.from_numpy(coords_xy).clone()
    c[..., 0] = 2 * c[..., 0] / (W - 1) - 1
    c[..., 1] = 2 * c[..., 1] / (H - 1) - 1
    out = F.grid_sample(img, c, align_corners=True, padding_mode="zeros")
    return out.permute(0, 2, 3, 1).numpy()


def test_bilinear_sampler_matches_grid_sample():
    rng = np.random.RandomState(1)
    img = rng.randn(2, 6, 9, 4).astype(np.float32)
    coords = np.stack([
        rng.uniform(-2, 10, (2, 5, 7)),  # x, deliberately out of range too
        rng.uniform(-2, 7, (2, 5, 7)),   # y
    ], axis=-1).astype(np.float32)
    got = np.asarray(sampling.bilinear_sampler(jnp.asarray(img),
                                               jnp.asarray(coords)))
    want = _torch_grid_sample(img, coords)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_sampler_mask():
    img = np.ones((1, 4, 4, 1), np.float32)
    coords = np.array([[[[0.0, 0.0], [1.5, 1.5], [3.0, 3.0], [4.0, 2.0]]]],
                      np.float32)
    _, mask = sampling.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords),
                                        return_mask=True)
    # Strictly-inside test: corners and OOB are 0.
    np.testing.assert_allclose(np.asarray(mask)[0, 0], [0.0, 1.0, 0.0, 0.0])


def test_sample_1d_linear():
    vals = jnp.asarray(np.arange(8, dtype=np.float32)[None])  # [1, 8]
    x = jnp.asarray(np.array([[0.0, 2.5, 6.9, 7.0, -0.5, 7.5]], np.float32))
    got = np.asarray(sampling.sample_1d(vals, x))
    np.testing.assert_allclose(got[0, :4], [0.0, 2.5, 6.9, 7.0], rtol=1e-5)
    # Outside [0, N-1]: zero-padded linear blend.
    np.testing.assert_allclose(got[0, 4], 0.0 * 0.5 + 0.5 * 0.0 + 0.5 * 0)
    np.testing.assert_allclose(got[0, 5], 0.5 * 7.0)


def test_warp_integer_disparity():
    rng = np.random.RandomState(2)
    right = rng.rand(1, 4, 8, 3).astype(np.float32)
    disp = np.full((1, 4, 8), 2.0, np.float32)
    warped, mask = sampling.warp_right_to_left(
        jnp.asarray(right), jnp.asarray(disp), return_mask=True)
    warped = np.asarray(warped)
    np.testing.assert_allclose(warped[:, :, 2:], right[:, :, :-2], rtol=1e-6)
    # w < 2 maps to x < 0 -> zero
    np.testing.assert_allclose(warped[:, :, :2], 0.0, atol=1e-6)


def test_coords_grid():
    g = np.asarray(sampling.coords_grid(1, 3, 4))
    assert g.shape == (1, 3, 4, 2)
    np.testing.assert_allclose(g[0, 2, 3], [3.0, 2.0])  # (x, y)


def test_sample_1d_dense_matches_gather():
    """The gather-free hat-kernel path (TPU fast path) must be numerically
    identical to the take_along_axis path, including out-of-range zeros and
    gradients."""
    rng = np.random.RandomState(7)
    v = jnp.asarray(rng.randn(2, 5, 7, 33).astype(np.float32))
    x = jnp.asarray(rng.uniform(-3, 36, (2, 5, 7, 9)).astype(np.float32))
    a = sampling.sample_1d(v, x, method="gather")
    b = sampling.sample_1d(v, x, method="dense")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # exact edges: -1, -0.5, 0, N-1, N-0.5, N
    xe = jnp.asarray(
        np.array([[-1.0, -0.5, 0.0, 32.0, 32.5, 33.0]], np.float32))
    ve = jnp.asarray(rng.randn(1, 33).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sampling.sample_1d(ve, xe, method="dense")),
        np.asarray(sampling.sample_1d(ve, xe, method="gather")), atol=1e-6)

    gv_a = jax.grad(lambda v: sampling.sample_1d(v, x, "gather").sum())(v)
    gv_b = jax.grad(lambda v: sampling.sample_1d(v, x, "dense").sum())(v)
    np.testing.assert_allclose(np.asarray(gv_a), np.asarray(gv_b), atol=1e-6)
    gx_a = jax.grad(lambda x: sampling.sample_1d(v, x, "gather").sum())(x)
    gx_b = jax.grad(lambda x: sampling.sample_1d(v, x, "dense").sum())(x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b), atol=1e-6)
