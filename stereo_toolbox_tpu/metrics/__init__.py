"""Disparity evaluation metrics.

Protocol parity with the reference evaluation suites:
  * valid pixels: ``(gt > 0) & (gt < maxdisp - 1)``
    (evaluation/sceneflow_test.py:29, trainer/trainer_torchrun.py:272)
  * EPE = mean |pred - gt| over valid pixels, per image
  * outlier rate(τ) = fraction of valid pixels with |pred - gt| > τ
  * metrics are averaged **per image**, not pooled over pixels
    (evaluation/sceneflow_test.py:39-47)
  * occ = valid ∧ ¬noc (evaluation/generalization_eval.py:34-36)

All functions use `where`-weighted means so shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_MAX_DISP = 192


def valid_mask(gt_disp: jax.Array, max_disp: int = DEFAULT_MAX_DISP) -> jax.Array:
    """Boolean validity mask; NaN GT (absent) is invalid."""
    finite = jnp.isfinite(gt_disp)
    gt = jnp.where(finite, gt_disp, 0.0)
    return finite & (gt > 0) & (gt < max_disp - 1)


def masked_mean(x: jax.Array, mask: jax.Array,
                axis=None) -> jax.Array:
    """Mean of x over mask; 0 where the mask is empty."""
    m = mask.astype(x.dtype)
    num = (x * m).sum(axis=axis)
    den = m.sum(axis=axis)
    return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)


def end_point_error(pred: jax.Array, gt: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Per-image EPE: ``[B, H, W]`` inputs → ``[B]``."""
    gt = jnp.where(mask, gt, 0.0)
    err = jnp.abs(pred - gt)
    return masked_mean(err, mask, axis=(1, 2))


def outlier_rate(pred: jax.Array, gt: jax.Array, mask: jax.Array,
                 threshold: float) -> jax.Array:
    """Per-image fraction (in [0,1]) of valid pixels with error > threshold."""
    gt = jnp.where(mask, gt, 0.0)
    err = jnp.abs(pred - gt)
    out = (err > threshold) & mask
    return masked_mean(out.astype(pred.dtype), mask, axis=(1, 2))


def epe_and_outliers(pred: jax.Array, gt: jax.Array, mask: jax.Array,
                     thresholds=(1.0, 2.0, 3.0)) -> dict:
    """Per-image EPE and outlier rates; also returns per-image valid count.

    Returns dict of ``[B]`` arrays: ``{'epe', 'valid', 'out_1px', ...}``.
    Images with zero valid pixels report 0 and should be excluded by the
    caller via ``valid > 0`` (the reference skips them,
    evaluation/sceneflow_test.py:30-31).
    """
    res = {
        "epe": end_point_error(pred, gt, mask),
        "valid": mask.sum(axis=(1, 2)),
    }
    for t in thresholds:
        res[f"out_{int(t)}px"] = outlier_rate(pred, gt, mask, t)
    return res


def occ_noc_split(mask: jax.Array, noc_mask: jax.Array):
    """(all, noc, occ) masks; occ = all ∧ ¬noc.

    Parity: evaluation/generalization_eval.py:34-36. NaN noc (absent file)
    is treated as all-visible.
    """
    noc = jnp.isfinite(noc_mask) & (noc_mask > 0.5)
    noc = noc & mask
    occ = mask & jnp.logical_not(noc)
    return mask, noc, occ
