"""Pallas per-pixel disparity-sample gather as a one-hot MXU matmul.

CFNet's cascade builds cost volumes at per-pixel *sampled* disparities
(reference models/CFNet/cfnet.py:473-499 via `SpatialTransformer`,
submodule.py:303-348): ``out[b,s,h,w] = right[b,h,w - samples[b,s,h,w]]``.
XLA lowers that to a serial TPU gather — measured 240 ms for the 1/2-res
stage at 1088×1920, ~75× off memory speed-of-light and the single biggest
term in CFNet's forward.

This kernel replaces the gather with structured dense math: W is tiled, the
shifted source window lives in VMEM (current + previous tile — valid while
``max_shift ≤ tile``), and the per-(sample, pixel) selection becomes a
``[S·Wt, 2Wt]`` one-hot matrix built from iota compares, contracted against
the window on the MXU. The group-wise correlation (multiply by left +
group-mean, submodule.py:162-168) is fused in-kernel so the big gathered
tensor never touches HBM.

Semantics parity: `ops.volume.gather_right_by_samples` /
`gwc_volume_from_samples` (zero outside the image, integer samples) —
verified in tests/test_pallas_volume.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_and_pad(w: int, max_shift: int):
    """(wt, padded_w): Mosaic requires the W block to be a multiple of 128
    (or the whole axis), so pad W up to a multiple of 128 and tile by the
    smallest 128-multiple ≥ max_shift."""
    wt = 128
    while wt < max_shift:
        wt += 128
    w2 = -(-w // wt) * wt
    return wt, w2


def _onehot(samples_ref, tile_idx, s, wt):
    """[S·Wt, 2Wt] selection matrix: row r=(s, wl) has a 1 at window column
    j = Wt + wl - d (reads the previous tile for d > wl), masked where the
    global source w - d is out of the image on the left. Built in 3D and
    merged over the leading (sublane) dims — Mosaic rejects lane-splitting
    reshapes but allows this one."""
    d = samples_ref[0, 0].astype(jnp.int32)[:, :, None]      # [S, Wt, 1]
    wl = jax.lax.broadcasted_iota(jnp.int32, (s, wt, 2 * wt), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (s, wt, 2 * wt), 2)
    target = wt + wl - d
    valid = (tile_idx * wt + wl - d) >= 0
    return ((j == target) & valid).reshape(s * wt, 2 * wt)


def _gather_kernel(r_ref, rp_ref, s_ref, out_ref, *, s: int, wt: int):
    k = pl.program_id(2)
    rr = jnp.concatenate([rp_ref[0, 0], r_ref[0, 0]], axis=0)  # [2Wt, C]
    oh = _onehot(s_ref, k, s, wt).astype(rr.dtype)  # exact select: no cast
    g = jnp.dot(oh, rr, preferred_element_type=jnp.float32)
    out_ref[0, :, 0] = g.reshape(s, wt, -1).astype(out_ref.dtype)


def _gwc_kernel(l_ref, r_ref, rp_ref, s_ref, out_ref, *, s: int, wt: int,
                groups: int):
    k = pl.program_id(2)
    rr = jnp.concatenate([rp_ref[0, 0], r_ref[0, 0]], axis=0)  # [2Wt, C]
    c = rr.shape[-1]
    oh = _onehot(s_ref, k, s, wt).astype(rr.dtype)  # exact select: no cast
    g = jnp.dot(oh, rr, preferred_element_type=jnp.float32)  # [S·Wt, C]
    lt = l_ref[0, 0].astype(jnp.float32)                # [Wt, C]
    lt = jnp.tile(lt, (s, 1))                           # [S·Wt, C]
    # group mean as a block-diagonal matmul (no lane-splitting reshape)
    cg = c // groups
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = jnp.where(rows // cg == cols, 1.0 / cg, 0.0).astype(jnp.float32)
    out = jnp.dot(g * lt, m, preferred_element_type=jnp.float32)
    out_ref[0, :, 0] = out.reshape(s, wt, groups).astype(out_ref.dtype)


def _specs(b, h, s, wt, c, with_left):
    r_spec = pl.BlockSpec((1, 1, wt, c), lambda i, j, k: (i, j, k, 0),
                          memory_space=pltpu.VMEM)
    rp_spec = pl.BlockSpec(
        (1, 1, wt, c), lambda i, j, k: (i, j, jnp.maximum(k - 1, 0), 0),
        memory_space=pltpu.VMEM)
    # samples pre-transposed to [B, H, S, W] so the block's last two dims
    # are (S, Wt) — Mosaic-tileable
    s_spec = pl.BlockSpec((1, 1, s, wt), lambda i, j, k: (i, j, 0, k),
                          memory_space=pltpu.VMEM)
    specs = [r_spec, rp_spec, s_spec]
    if with_left:
        specs = [r_spec] + specs
    return specs


def _pad_w(a, w2, axis):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, w2 - a.shape[axis])
    return jnp.pad(a, pad) if w2 != a.shape[axis] else a


def gather_right_by_samples_pallas(right: jax.Array, samples: jax.Array,
                                   max_shift: int,
                                   interpret: bool = False) -> jax.Array:
    """``[B, S, H, W, C]`` = right gathered at integer disparity samples.

    Requires ``0 ≤ samples ≤ max_shift`` wherever the source is in-image
    (guaranteed by CFNet's clamped search ranges, cfnet.py:437-447). The
    wrapper enforces the contract by clamping — a contract-violating
    sample reads the value at the clamped shift instead of silently
    reading the wrong one-hot tile.
    """
    samples = jnp.clip(samples, 0, max_shift)
    b, h, w, c = right.shape
    s = samples.shape[1]
    wt, w2 = _tile_and_pad(w, max_shift)
    rightp = _pad_w(right, w2, 2)
    sp = _pad_w(jnp.moveaxis(samples, 1, 2), w2, 3)  # [B, H, S, W2]
    kernel = functools.partial(_gather_kernel, s=s, wt=wt)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, w2 // wt),
        in_specs=_specs(b, h, s, wt, c, False),
        out_specs=pl.BlockSpec((1, s, 1, wt, c),
                               lambda i, j, k: (i, 0, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h, w2, c), right.dtype),
        interpret=interpret,
    )(rightp, rightp, sp)
    return out[:, :, :, :w]


def gwc_volume_from_samples_pallas(left: jax.Array, right: jax.Array,
                                   samples: jax.Array, num_groups: int,
                                   max_shift: int,
                                   interpret: bool = False) -> jax.Array:
    """``[B, S, H, W, G]`` group-wise correlation at sampled disparities,
    with the gathered features reduced in-VMEM (never written to HBM).
    Samples are clamped to ``[0, max_shift]`` (the kernel's contract)."""
    samples = jnp.clip(samples, 0, max_shift)
    b, h, w, c = right.shape
    s = samples.shape[1]
    wt, w2 = _tile_and_pad(w, max_shift)
    leftp = _pad_w(left, w2, 2)
    rightp = _pad_w(right, w2, 2)
    sp = _pad_w(jnp.moveaxis(samples, 1, 2), w2, 3)  # [B, H, S, W2]
    kernel = functools.partial(_gwc_kernel, s=s, wt=wt, groups=num_groups)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, w2 // wt),
        in_specs=_specs(b, h, s, wt, c, True),
        out_specs=pl.BlockSpec((1, s, 1, wt, num_groups),
                               lambda i, j, k: (i, 0, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h, w2, num_groups),
                                       left.dtype),
        interpret=interpret,
    )(leftp, rightp, rightp, sp)
    return out[:, :, :, :w]
