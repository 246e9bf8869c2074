"""Pallas 3×3×3 convolution for cost volumes.

XLA's NDHWC conv reaches only ~15 TFLOP/s on the aggregation shapes
(tools/bench_kernels.py) — far under even the thin-output-channel MXU
ceiling (Co = 32 occupies 32/128 systolic columns → 25% ≈ 49 TFLOP/s).
This kernel tiles the volume over (B, D, H-rows), DMAs a (3, TH+2, W+2, Ci)
halo slab into VMEM once, and runs 9 MXU matmuls of
``[TH·W, 3·Ci] @ [3·Ci, Co]`` (the kw taps concatenated into the contraction
so each matmul is wide), accumulating in fp32.

Inputs are zero-padded by 1 in D/H/W by the wrapper (one fused XLA pad), so
the kernel body has no boundary control flow at all.

Stride-1, SAME, 3×3×3 only; eval-path usage (training keeps the XLA conv so
BN batch stats stay exact). Parity tests: tests/test_pallas_conv3d.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, k2_ref, out_ref, scratch, sems, *, tile_h: int, w: int,
            ci: int, co: int, wt: int):
    b = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)

    copies = []
    for kd in range(3):
        c = pltpu.make_async_copy(
            xp_hbm.at[b, d + kd, pl.ds(h * tile_h, tile_h + 2)],
            scratch.at[kd],
            sems.at[kd],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    acc = jnp.zeros((tile_h, w, co), jnp.float32)
    for kd in range(3):
        for kh in range(3):
            rows = scratch[kd, kh:kh + tile_h]          # [TH, W+2, Ci]
            for kw in range(3):
                tap = rows[:, kw:kw + w]                # [TH, W, Ci]
                acc = acc + jax.lax.dot_general(
                    tap, k2_ref[kd, kh, kw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def conv3d_pallas(x: jax.Array, kernel: jax.Array, tile_h: int = 8,
                  interpret: bool = False) -> jax.Array:
    """3×3×3 SAME stride-1 conv over ``[B, D, H, W, C]`` (channels-last).

    Matches ``lax.conv_general_dilated(..., 'SAME', NDHWC)``.
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), "conv3d_pallas is specialized to 3x3x3"
    while h % tile_h:
        tile_h //= 2

    # pad W so the DMA'd slab width is sublane-aligned (16 for bf16) and
    # channels to a 128-lane multiple (the manual HBM DMA requires it; the
    # zero rows are free on the 128-deep MXU contraction)
    wt = -(-(w + 2) // 16) * 16
    cp = -(-ci // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wt - w - 1),
                     (0, cp - ci)))
    k2 = jnp.pad(kernel, ((0, 0),) * 3 + ((0, cp - ci), (0, 0)))

    fn = functools.partial(_kernel, tile_h=tile_h, w=w, ci=cp, co=co, wt=wt)
    flops = 2 * 27 * ci * co * d * h * w * b
    return pl.pallas_call(
        fn,
        grid=(b, d, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded x stays in HBM
            pl.BlockSpec((3, 3, 3, cp, co),
                         lambda bb, dd, hh: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h, w, co),
                               lambda bb, dd, hh: (bb, dd, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, wt, cp), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, k2)
