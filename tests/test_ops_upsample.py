"""Tests for resize / convex upsample / context upsample vs torch oracles."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stereo_toolbox_tpu.ops import upsample


def test_interpolate_bilinear_align_corners():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(upsample.interpolate(jnp.asarray(x), (10, 21), (1, 2),
                                          align_corners=True))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (10, 21),
                         mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_interpolate_trilinear_align_corners():
    rng = np.random.RandomState(6)
    x = rng.randn(1, 4, 5, 6, 2).astype(np.float32)  # [B, D, H, W, C]
    got = np.asarray(upsample.interpolate(jnp.asarray(x), (8, 10, 12),
                                          (1, 2, 3), align_corners=True))
    want = F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                         (8, 10, 12), mode="trilinear", align_corners=True)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 4, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def _torch_convex_upsample(disp, mask, factor):
    """Oracle for models/RAFTStereo/raft_stereo.py:81-93."""
    N, H, W = disp.shape
    flow = torch.from_numpy(disp)[:, None]
    m = torch.from_numpy(mask).view(N, 1, 9, factor, factor, H, W)
    m = torch.softmax(m, dim=2)
    up = F.unfold(factor * flow, [3, 3], padding=1)
    up = up.view(N, 1, 9, 1, 1, H, W)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(N, factor * H, factor * W).numpy()


def test_convex_upsample_matches_raft():
    rng = np.random.RandomState(7)
    factor = 4
    disp = rng.rand(2, 3, 5).astype(np.float32) * 10
    mask_nchw = rng.randn(2, 9 * factor * factor, 3, 5).astype(np.float32)
    want = _torch_convex_upsample(disp, mask_nchw, factor)
    # channels-last mask with the same (9, f, f) channel ordering
    mask_nhwc = np.transpose(mask_nchw, (0, 2, 3, 1))
    got = np.asarray(upsample.convex_upsample(
        jnp.asarray(disp), jnp.asarray(mask_nhwc), factor))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_context_upsample(disp_low, weights):
    """Oracle for models/IGEVStereo/submodule.py:243-255."""
    d = torch.from_numpy(disp_low)[:, None]
    w = torch.from_numpy(weights)
    b, c, h, wd = d.shape
    unfold = F.unfold(d, 3, 1, 1).reshape(b, -1, h, wd)
    unfold = F.interpolate(unfold, (h * 4, wd * 4), mode="nearest")
    return (unfold.reshape(b, 9, h * 4, wd * 4) * w).sum(1).numpy()


def test_context_upsample_matches_igev():
    rng = np.random.RandomState(8)
    disp = rng.rand(1, 3, 4).astype(np.float32) * 5
    w_nchw = np.abs(rng.randn(1, 9, 12, 16)).astype(np.float32)
    w_nchw /= w_nchw.sum(1, keepdims=True)
    want = _torch_context_upsample(disp, w_nchw)
    got = np.asarray(upsample.context_upsample(
        jnp.asarray(disp), jnp.asarray(np.transpose(w_nchw, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_disp_bilinear_scales_values():
    disp = jnp.asarray(np.ones((1, 4, 4), np.float32))
    up = np.asarray(upsample.upsample_disp_bilinear(disp, 4))
    assert up.shape == (1, 16, 16)
    np.testing.assert_allclose(up, 4.0, rtol=1e-6)


def test_softargmax_trilinear_matches_naive_chain():
    """Fused upsample→softmax→soft-argmax == the materialized chain
    (the eval head of every cost-volume family)."""
    import jax
    import jax.numpy as jnp
    from stereo_toolbox_tpu import ops

    rng = np.random.RandomState(3)
    cost = jnp.asarray(rng.randn(2, 12, 9, 13).astype(np.float32) * 3)
    D, H, W = 48, 36, 52
    naive_c = ops.interpolate(cost, (D, H, W), (1, 2, 3),
                              align_corners=False)
    prob = jax.nn.softmax(naive_c, axis=1)
    naive = ops.disparity_regression(prob, D)
    fused = ops.softargmax_trilinear(cost, D, H, W)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-5, atol=1e-4)


def test_bicubic_matches_torch():
    """interpolate_bicubic == torch F.interpolate(mode='bicubic',
    align_corners=False), incl. the A=-0.75 kernel and border clamping."""
    from stereo_toolbox_tpu import ops

    rng = np.random.RandomState(9)
    x = rng.randn(2, 3, 20, 31).astype(np.float32)
    for hw in [(37, 53), (10, 16), (20, 31)]:
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), hw, mode="bicubic",
            align_corners=False).numpy()
        got = ops.interpolate_bicubic(
            jnp.asarray(x.transpose(0, 2, 3, 1)), hw, (1, 2))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want,
            rtol=1e-4, atol=1e-4)
