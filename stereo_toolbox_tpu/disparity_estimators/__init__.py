"""Disparity estimators: map a D-axis probability volume to disparity.

Parity targets (reference):
  * softargmax / argmax — disparity_estimators/__init__.py:7-15
  * unimodal            — disparity_estimators/unimodal_disparity_estimator.py
  * dominant-modal (ADL, CVPR'24)
                        — disparity_estimators/dominant_modal_disparity_estimator.py

Conventions: probability volumes are ``[B, D, H, W]`` (already normalized over
D); outputs are ``[B, H, W]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softargmax_disparity_estimator(prob: jax.Array,
                                   maxdisp: int | None = None) -> jax.Array:
    """Expectation of disparity under `prob`."""
    d = maxdisp if maxdisp is not None else prob.shape[1]
    values = jnp.arange(d, dtype=prob.dtype)
    return jnp.einsum("bdhw,d->bhw", prob, values)


def argmax_disparity_estimator(prob: jax.Array,
                               maxdisp: int | None = None) -> jax.Array:
    del maxdisp
    return jnp.argmax(prob, axis=1).astype(prob.dtype)


def mode_bounds(prob: jax.Array):
    """Left/right boundaries of the mode containing the argmax.

    Parity with the reference boundary scan
    (disparity_estimators/unimodal_disparity_estimator.py:10-20, identically
    re-vendored in dominant_modal/split_mode): with virtual values of 1 beyond
    both ends,

      index_l = largest k <= argmax with p[k] < p[k-1]   (default 0)
      index_r = (first k > argmax with p[k] > p[k-1]) - 1 (default D-1)

    Args:
      prob: ``[B, D, H, W]``.

    Returns:
      (index, index_l, index_r), each ``[B, 1, H, W]`` int32.
    """
    d = prob.shape[1]
    idx = jnp.argmax(prob, axis=1, keepdims=True).astype(jnp.int32)
    pos = jnp.arange(d, dtype=jnp.int32)[None, :, None, None]
    diff = jnp.diff(prob, axis=1)  # diff[k] = p[k+1] - p[k], k in 0..D-2

    # Falling at k (p[k] < p[k-1]); k=0 "falls" from the virtual 1 whenever
    # p[0] < 1, which is always true for probabilities.
    falling = jnp.concatenate(
        [(prob[:, :1] < 1.0), diff < 0], axis=1)
    sel_l = falling & (pos <= idx)
    index_l = jnp.max(jnp.where(sel_l, pos, 0), axis=1, keepdims=True)

    # First rise strictly after the peak: p[k+1] > p[k] with k >= idx; the
    # virtual rise at the right edge gives the default D-1.
    rises_next = jnp.concatenate(
        [diff > 0, jnp.zeros_like(prob[:, :1], bool)], axis=1)
    sel_r = rises_next & (pos >= idx)
    index_r = jnp.min(jnp.where(sel_r, pos, d - 1), axis=1, keepdims=True)
    return idx, index_l, index_r


def modal_mask(prob: jax.Array) -> jax.Array:
    """Mask of the dominant mode with the reference's symmetric fallback.

    Parity: disparity_estimators/dominant_modal_disparity_estimator.py:5-30:
    when the mode is too asymmetric (|2*idx - l - r| >= 3) use a symmetric
    window of radius min(r - idx, idx - l) instead.

    Returns:
      ``[B, D, H, W]`` boolean mask.
    """
    d = prob.shape[1]
    idx, index_l, index_r = mode_bounds(prob)
    pos = jnp.arange(d, dtype=jnp.int32)[None, :, None, None]
    mask1 = (pos >= index_l) & (pos <= index_r)
    r = jnp.minimum(index_r - idx, idx - index_l)
    mask2 = (pos >= idx - r) & (pos <= idx + r)
    valid = jnp.abs(2 * idx - index_r - index_l) < 3
    return jnp.where(valid, mask1, mask2)


def unimodal_disparity_estimator(prob: jax.Array,
                                 maxdisp: int | None = None,
                                 eps: float = 1e-12) -> jax.Array:
    """Soft-argmax restricted to the single mode containing the argmax.

    Parity: disparity_estimators/unimodal_disparity_estimator.py:4-25 (uses
    the asymmetric bounds without the symmetric fallback, then renormalizes).
    """
    d = maxdisp if maxdisp is not None else prob.shape[1]
    idx, index_l, index_r = mode_bounds(prob)
    pos = jnp.arange(d, dtype=jnp.int32)[None, :, None, None]
    mask = ((pos >= index_l) & (pos <= index_r)).astype(prob.dtype)
    p = prob * mask
    p = p / (p.sum(axis=1, keepdims=True) + eps)
    return softargmax_disparity_estimator(p, d)


def _box_blur_d(prob: jax.Array, k: int = 5) -> jax.Array:
    """k-tap box filter along the D axis with zero 'same' padding (parity with
    the reference's depthwise conv1d)."""
    pad = k // 2
    p = jnp.pad(prob, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    out = sum(p[:, i:i + prob.shape[1]] for i in range(k))
    return out / k


def dominant_modal_disparity_estimator(prob: jax.Array,
                                       maxdisp: int | None = None,
                                       eps: float = 1e-12) -> jax.Array:
    """ADL (CVPR'24) dominant-modal estimator.

    Parity: disparity_estimators/dominant_modal_disparity_estimator.py:33-55:
    blur the volume, find the top mode and the runner-up mode, keep whichever
    carries more probability mass, soft-argmax over it.
    """
    d = maxdisp if maxdisp is not None else prob.shape[1]
    blur = _box_blur_d(prob)
    mask = modal_mask(blur)
    y = prob * mask
    z = prob - y
    blur2 = blur * jnp.logical_not(mask)
    z = z * modal_mask(blur2)
    dominant = (y.sum(axis=1, keepdims=True) >= z.sum(axis=1, keepdims=True))
    p = jnp.where(dominant, y, z)
    p = p / (p.sum(axis=1, keepdims=True) + eps)
    return softargmax_disparity_estimator(p, d)
