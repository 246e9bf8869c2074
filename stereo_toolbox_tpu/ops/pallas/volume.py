"""Pallas cost-volume build kernels.

The XLA path (`ops.build_gwc_volume` etc.) materializes D shifted copies of
the right feature map — D reads of each input plus D writes. These kernels
tile over (batch, H-rows), keep both feature rows resident in VMEM, and emit
the whole disparity axis in one pass: each input byte crosses HBM once.

Group-wise reduction is formulated as a matmul with a block-diagonal
averaging matrix so it rides the MXU instead of a lane-splitting reshape
(kernel-design notes: SURVEY §7 "Cost-volume build bandwidth").

Semantics parity: identical to ops/volume.py (reference
models/GwcNet/submodule.py:30-63) — verified in tests/test_pallas_volume.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(c: int, groups: int, dtype) -> jax.Array:
    """[C, G] block-diagonal matrix averaging each group's channels."""
    cg = c // groups
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return jnp.where(rows // cg == cols, 1.0 / cg, 0.0).astype(dtype)


def _pick_w_tile(w: int, max_disp: int, cap: int = 512) -> int:
    """Smallest divisor of W that is ≥ max(128, max_disp) (whole W if none).

    Table-3 quarter-res widths are 160/320/480 → tile 160 everywhere.
    """
    floor = max(128, max_disp)
    for wt in range(floor, min(w, cap) + 1):
        if w % wt == 0:
            return wt
    return w


def _gwc_kernel(l_ref, r_ref, rp_ref, out_ref, *, max_disp: int,
                groups: int, w_tile: int):
    # l_ref, r_ref, rp_ref: [1, bh, Wt, C]; out_ref: [1, D, bh, Wt, G]
    # rp_ref holds the PREVIOUS W-tile of the right features (clamped to
    # tile 0 for the first tile, where its values are masked off anyway),
    # so every shifted read r[w - d], d < Wt, resolves inside VMEM.
    bh, wt, c = l_ref.shape[1], l_ref.shape[2], l_ref.shape[3]
    j = pl.program_id(2)
    l = l_ref[0]
    rr = jnp.concatenate([rp_ref[0], r_ref[0]], axis=1)  # [bh, 2Wt, C]
    m = _group_matrix(c, groups, jnp.float32)
    # global w of each lane in this tile
    w_glob = j * wt + jax.lax.broadcasted_iota(jnp.int32, (bh, wt, 1), 1)
    for d in range(max_disp):
        shifted = rr[:, wt - d: 2 * wt - d, :]
        valid = (w_glob >= d).astype(l.dtype)
        prod = (l * shifted * valid).reshape(bh * wt, c)
        out = jnp.dot(prod, m, preferred_element_type=jnp.float32)
        out_ref[0, d] = out.reshape(bh, wt, groups).astype(out_ref.dtype)


def build_gwc_volume_pallas(left: jax.Array, right: jax.Array,
                            max_disp: int, groups: int,
                            block_h: int = 1,
                            interpret: bool = False) -> jax.Array:
    """Group-wise correlation volume ``[B, D, H, W, G]`` via one fused pass.

    W-tiled (round-3 verdict item 1): VMEM per block is
    ``3·Wt·C + D·Wt·G`` elements regardless of image width, so the kernel
    no longer falls back to XLA at 1088×1920. Matches `ops.build_gwc_volume`
    exactly (same zero-fill for w < d).
    """
    b, h, w, c = left.shape
    while h % block_h:
        block_h //= 2
    wt = _pick_w_tile(w, max_disp)
    if wt < max_disp:  # shifted window would cross two previous tiles
        wt = w
    grid = (b, h // block_h, w // wt)
    kernel = functools.partial(_gwc_kernel, max_disp=max_disp,
                               groups=groups, w_tile=wt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, wt, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, wt, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_h, wt, c),
                lambda i, j, k: (i, j, jnp.maximum(k - 1, 0), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, max_disp, block_h, wt, groups),
                               lambda i, j, k: (i, 0, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, max_disp, h, w, groups),
                                       left.dtype),
        interpret=interpret,
    )(left, right, right)


def _concat_kernel(l_ref, r_ref, out_ref, *, max_disp: int):
    # l_ref, r_ref: [1, bh, W, C]; out_ref: [1, D, bh, W, 2C]
    bh, w, c = l_ref.shape[1], l_ref.shape[2], l_ref.shape[3]
    l = l_ref[0]
    r = r_ref[0]
    for d in range(max_disp):
        if d == 0:
            out_ref[0, d] = jnp.concatenate([l, r], axis=-1)
        else:
            zeros = jnp.zeros((bh, d, c), l.dtype)
            l_mask = jnp.concatenate([zeros, l[:, d:, :]], axis=1)
            r_shift = jnp.concatenate([zeros, r[:, : w - d, :]], axis=1)
            out_ref[0, d] = jnp.concatenate([l_mask, r_shift], axis=-1)


def build_concat_volume_pallas(left: jax.Array, right: jax.Array,
                               max_disp: int, block_h: int = 1,
                               interpret: bool = False) -> jax.Array:
    """Concat cost volume ``[B, D, H, W, 2C]`` via one fused pass.

    Matches `ops.build_concat_volume` (both halves zero for w < d, parity
    with models/PSMNet/stackhourglass.py:111-120).
    """
    b, h, w, c = left.shape
    while h % block_h:
        block_h //= 2
    grid = (b, h // block_h)
    kernel = functools.partial(_concat_kernel, max_disp=max_disp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, max_disp, block_h, w, 2 * c),
                               lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, max_disp, h, w, 2 * c),
                                       left.dtype),
        interpret=interpret,
    )(left, right)
