"""Tests for losses, metrics, and disparity estimators (torch/numpy oracles)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stereo_toolbox_tpu import losses, metrics
from stereo_toolbox_tpu import disparity_estimators as de


# ---------------------------------------------------------------- losses

def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(9)
    a = rng.randn(100).astype(np.float32) * 3
    b = rng.randn(100).astype(np.float32)
    got = np.asarray(losses.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    want = F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b),
                            reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sequence_loss_matches_reference_formula():
    """Oracle for trainer/trainer_torchrun.py:277-284."""
    rng = np.random.RandomState(10)
    n = 4
    gt = rng.rand(2, 6, 8).astype(np.float32) * 50
    mask = gt > 10
    preds = [gt + rng.randn(2, 6, 8).astype(np.float32) for _ in range(n)]
    init = gt + rng.randn(2, 6, 8).astype(np.float32)

    gamma = 0.9 ** (15 / (n - 1))
    t_gt, t_mask = torch.from_numpy(gt), torch.from_numpy(mask)
    want = F.smooth_l1_loss(torch.from_numpy(init)[t_mask], t_gt[t_mask])
    for i, p in enumerate(preds):
        want = want + gamma ** (n - i - 1) * F.smooth_l1_loss(
            torch.from_numpy(p)[t_mask], t_gt[t_mask])

    got = losses.sequence_loss([jnp.asarray(p) for p in preds],
                               jnp.asarray(gt), jnp.asarray(mask),
                               init_disp=jnp.asarray(init))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_ssim_matches_reference_formula():
    rng = np.random.RandomState(11)
    x = rng.rand(1, 12, 14, 3).astype(np.float32)
    y = np.clip(x + rng.randn(1, 12, 14, 3).astype(np.float32) * 0.05, 0, 1)

    # Torch oracle of loss_functions/photometric_loss.py:40-77
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    pad = 3
    txp = F.pad(tx, (pad,) * 4, mode="reflect")
    typ = F.pad(ty, (pad,) * 4, mode="reflect")
    mu_x = F.avg_pool2d(txp, 7, stride=1)
    mu_y = F.avg_pool2d(typ, 7, stride=1)
    sx = F.avg_pool2d(txp * txp, 7, 1) - mu_x ** 2
    sy = F.avg_pool2d(typ * typ, 7, 1) - mu_y ** 2
    sxy = F.avg_pool2d(txp * typ, 7, 1) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sx + sy + c2)
    want = torch.clamp((1 - n / d) / 2, 0, 1).permute(0, 2, 3, 1).numpy()

    got = np.asarray(losses.ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_photometric_zero_for_perfect_warp():
    rng = np.random.RandomState(12)
    # A constant image warps onto itself regardless of disparity.
    img = np.ones((1, 10, 12, 3), np.float32) * 0.5
    disp = np.full((1, 10, 12), 1.5, np.float32)
    loss = np.asarray(losses.photometric_loss(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(disp)))
    assert loss.shape == (1, 10, 12)
    # Columns within the SSIM window (7//2 = 3) of the warped-out left band
    # (x < ceil(1.5) = 2) legitimately see nonzero loss; beyond that, zero.
    np.testing.assert_allclose(loss[:, :, 6:], 0.0, atol=1e-5)


def test_smoothness_penalizes_rough_disp():
    img = np.ones((1, 8, 8, 3), np.float32) * 0.5
    flat = np.ones((1, 8, 8), np.float32)
    rough = np.ones((1, 8, 8), np.float32)
    rough[:, ::2] = 3.0
    l_flat = float(losses.smoothness_loss(jnp.asarray(flat), jnp.asarray(img)))
    l_rough = float(losses.smoothness_loss(jnp.asarray(rough),
                                           jnp.asarray(img)))
    assert l_flat < 1e-6 < l_rough


def test_auto_mask_keeps_good_pixels():
    rng = np.random.RandomState(13)
    right = rng.rand(1, 8, 32, 3).astype(np.float32)
    # Left = right shifted by disparity 3 (true correspondence).
    left = np.zeros_like(right)
    left[:, :, 3:] = right[:, :, :-3]
    disp = np.full((1, 8, 32), 3.0, np.float32)
    m = np.asarray(losses.auto_mask(jnp.asarray(left), jnp.asarray(right),
                                    jnp.asarray(disp)))
    assert m[:, :, 5:].mean() > 0.9


# ---------------------------------------------------------------- metrics

def test_epe_and_outliers():
    gt = np.zeros((1, 4, 4), np.float32)
    gt[0, :2] = 10.0   # valid rows
    gt[0, 2:] = 0.0    # invalid (<= 0)
    pred = gt + 2.0
    mask = np.asarray(metrics.valid_mask(jnp.asarray(gt)))
    assert mask.sum() == 8
    res = metrics.epe_and_outliers(jnp.asarray(pred), jnp.asarray(gt),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(float(res["epe"][0]), 2.0)
    np.testing.assert_allclose(float(res["out_1px"][0]), 1.0)
    np.testing.assert_allclose(float(res["out_3px"][0]), 0.0)


def test_valid_mask_nan_and_range():
    gt = np.array([[[np.nan, 5.0, 191.5, 190.0, -1.0]]], np.float32)
    m = np.asarray(metrics.valid_mask(jnp.asarray(gt), 192))
    np.testing.assert_array_equal(m[0, 0], [False, True, False, True, False])


def test_occ_noc_split():
    mask = np.array([[[True, True, True, False]]])
    noc = np.array([[[1.0, 0.0, np.nan, 1.0]]], np.float32)
    all_m, noc_m, occ_m = metrics.occ_noc_split(jnp.asarray(mask),
                                                jnp.asarray(noc))
    np.testing.assert_array_equal(np.asarray(noc_m)[0, 0],
                                  [True, False, False, False])
    np.testing.assert_array_equal(np.asarray(occ_m)[0, 0],
                                  [False, True, True, False])


# ------------------------------------------------------- estimators

def _torch_unimodal(x):
    """Oracle re-implementing the reference unimodal estimator formula."""
    x = torch.from_numpy(x)
    maxdisp = x.shape[1]
    disp = torch.arange(maxdisp, dtype=x.dtype).reshape(1, maxdisp, 1, 1)
    index = torch.argmax(x, 1, keepdim=True)
    mask = disp.repeat(x.size(0), 1, x.size(2), x.size(3))
    mask2 = torch.arange(maxdisp + 1, dtype=x.dtype).reshape(
        1, maxdisp + 1, 1, 1).repeat(x.size(0), 1, x.size(2), x.size(3))
    ones = torch.ones(x.size(0), 1, x.size(2), x.size(3), dtype=x.dtype)
    x_diff_r = torch.diff(x, dim=1, prepend=ones, append=ones)
    x_diff_l = torch.diff(x, dim=1, prepend=ones)
    index_r = torch.gt(x_diff_r * torch.gt(mask2, index), 0).int()
    index_r = torch.argmax(index_r, 1, keepdim=True) - 1
    index_l = torch.lt(x_diff_l * torch.le(mask, index), 0).int()
    index_l = (maxdisp - 1) - torch.argmax(torch.flip(index_l, [1]), 1,
                                           keepdim=True)
    m = torch.ge(mask, index_l) * torch.le(mask, index_r)
    x = x * m
    x = x / torch.sum(x, 1, keepdim=True)
    return torch.sum(x * disp, 1).numpy()


def _rand_prob(rng, shape):
    x = rng.rand(*shape).astype(np.float32)
    return x / x.sum(1, keepdims=True)


def test_unimodal_matches_reference_formula():
    rng = np.random.RandomState(14)
    prob = _rand_prob(rng, (2, 16, 3, 4))
    got = np.asarray(de.unimodal_disparity_estimator(jnp.asarray(prob)))
    want = _torch_unimodal(prob)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_softargmax_argmax():
    prob = np.zeros((1, 8, 2, 2), np.float32)
    prob[0, 3] = 1.0
    np.testing.assert_allclose(
        np.asarray(de.softargmax_disparity_estimator(jnp.asarray(prob))), 3.0)
    np.testing.assert_allclose(
        np.asarray(de.argmax_disparity_estimator(jnp.asarray(prob))), 3.0)


def test_dominant_modal_picks_heavier_mode():
    # Two clean modes; mass favors the one at d=4 even though argmax of the
    # blurred volume may see the spike at d=12 first.
    prob = np.zeros((1, 20, 1, 1), np.float32)
    prob[0, 3] = 0.2
    prob[0, 4] = 0.3
    prob[0, 5] = 0.2
    prob[0, 12] = 0.3
    out = float(np.asarray(
        de.dominant_modal_disparity_estimator(jnp.asarray(prob)))[0, 0, 0])
    assert 3.5 < out < 4.5


def test_split_mode_masks_single_mode():
    prob = np.zeros((1, 16, 1, 1), np.float32)
    prob[0, 2] = 0.1
    prob[0, 3] = 0.4
    prob[0, 4] = 0.1
    prob[0, 10] = 0.4
    mode, mask = losses.split_mode(jnp.asarray(prob))
    mask = np.asarray(mask)[0, :, 0, 0]
    assert mask[3] == 1 and mask[10] == 0
