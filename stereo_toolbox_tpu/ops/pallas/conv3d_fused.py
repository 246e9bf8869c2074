"""Fused Pallas 3×3×3 conv + affine(BN) + residual + ReLU for cost volumes.

This is the eval-path workhorse for the 3D-conv aggregation stacks
(PSMNet stackhourglass.py:122-136, GwcNet gwcnet.py:124-154, and the other
cost-volume models): at eval time BatchNorm is an affine transform, so the
whole `convbn_3d → (+skip) → ReLU` block collapses into one kernel launch.

Why a custom kernel: XLA's native NDHWC conv runs these shapes at ~15 TF/s
because Cout = 32 occupies only 32 of the MXU's 128 columns. This kernel
folds the kd tap axis into the matmul's N dimension — each input plane z
contributes to output planes z-1, z and z+1, so one matmul per (kh) tap of
``[TH·W, 3·Ci] @ [3·Ci, 3·Co]`` (kw folded into K, kd into N) drives the MXU
at 96-wide K and 96-wide N (75% × 75% occupancy ceiling vs 25% native).

Mechanics: grid = (B, H-tiles, D+2 input planes), plane index innermost. A
rolling 3-slot fp32 VMEM accumulator holds the partially-built output planes;
plane d is complete after step z = d+2, at which point the affine/residual/
ReLU epilogue runs and the plane is emitted. Input slabs (TH+2 halo rows)
are DMA'd HBM→VMEM with double buffering.

Stride-1, SAME, 3×3×3 only (the stack's stride-2 and transpose convs use the
XLA paths — they are either rare or already fast, see tools/bench_kernels.py).
Parity: tests/test_pallas_conv3d.py::test_conv3d_fused_*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, k2_ref, scale_ref, bias_ref, res_ref, out_ref,
            acc, slab, sems, *, tile_h: int, w: int, wp: int,
            ci: int, co: int, cp: int, d_out: int, relu: bool,
            has_res: bool):
    b = pl.program_id(0)
    h = pl.program_id(1)
    zp = pl.program_id(2)
    n_zp = pl.num_programs(2)

    # -- double-buffered slab DMA (slot = zp % 2) ------------------------
    def dma(z, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[b, z, pl.ds(h * tile_h, tile_h + 2)],
            slab.at[slot], sems.at[slot])

    @pl.when(zp == 0)
    def _():
        dma(0, 0).start()

    @pl.when(zp + 1 < n_zp)
    def _():
        dma(zp + 1, (zp + 1) % 2).start()

    dma(zp, zp % 2).wait()
    cur = slab[zp % 2]                       # [TH+2, WP, Cp]

    # -- one matmul per kw tap: [TH*W, 3Cp] @ [3Cp, 3Co] ------------------
    # kh is folded into K by concatenating batch-dim (H) shifted slices —
    # unlike kw (sublane) shifts, these share vector offsets, which mosaic's
    # lane-concat requires. The slices keep the full 128-lane padded channel
    # tile: the concat is then tile-aligned (free VREG placement, no masked
    # relayouts) and the weight rows for the zero lanes are zero — trading
    # extra MXU K-passes for the lane-extract VPU relayouts that otherwise
    # dominate at Ci=32.
    packed = jnp.concatenate(
        [cur[kh:kh + tile_h] for kh in range(3)],
        axis=-1)                             # [TH, WP, 3Cp]
    y = jnp.zeros((tile_h * w, 3 * co), jnp.float32)
    for kw in range(3):
        lhs = packed[:, kw:kw + w].reshape(tile_h * w, 3 * cp)
        y = y + jax.lax.dot_general(
            lhs, k2_ref[kw],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # -- scatter the kd taps into the rolling accumulator ----------------
    # input plane zi = zp-1 contributes to output d = zp - kd (kd tap k uses
    # input plane d+k-1). Plane d's first contribution arrives at step
    # zp = d via kd=0, so slot d%3 is zeroed at the top of step zp=d.
    @pl.when(zp < d_out)
    def _():
        acc[zp % 3] = jnp.zeros_like(acc[0])

    for kd in range(3):
        d = zp - kd

        @pl.when(jnp.logical_and(d >= 0, d < d_out))
        def _(kd=kd, d=d):
            slot = d % 3
            acc[slot] += y[:, kd * co:(kd + 1) * co]

    # -- emit plane d = zp-2 with the fused epilogue ---------------------
    @pl.when(zp >= 2)
    def _():
        slot = (zp - 2) % 3
        v = acc[slot] * scale_ref[0] + bias_ref[0]
        v = v.reshape(tile_h, w, co)
        if has_res:
            v = v + res_ref[0, 0].astype(jnp.float32)
        if relu:
            v = jnp.maximum(v, 0.0)
        out_ref[0, 0] = v.astype(out_ref.dtype)


def conv3d_fused(x: jax.Array, kernel: jax.Array,
                 scale: jax.Array | None = None,
                 bias: jax.Array | None = None,
                 residual: jax.Array | None = None,
                 relu: bool = False,
                 tile_h: int = 24,
                 interpret: bool = False) -> jax.Array:
    """``relu(conv3d(x, kernel) * scale + bias + residual)`` in one kernel.

    x: ``[B, D, H, W, Ci]`` (any float dtype); kernel ``[3, 3, 3, Ci, Co]``;
    scale/bias ``[Co]`` (defaults 1/0 — pass the eval-mode BN affine);
    residual: optional ``[B, D, H, W, Co]`` added before the ReLU.
    Matches ``lax.conv_general_dilated(..., SAME, NDHWC)`` + epilogue.
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), "specialized to 3x3x3"
    while h % tile_h:
        tile_h -= 8 if tile_h > 8 else 1
    if scale is None:
        scale = jnp.ones((co,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)

    # W padded: +2 halo, rounded so the slab's sublane dim is 8-aligned;
    # channels padded to a full 128-lane tile (HBM→VMEM DMA slices must be
    # 128-aligned on the minor dim).
    wp = -(-(w + 2) // 8) * 8
    cp = -(-ci // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wp - w - 1), (0, cp - ci)))

    # [kd, kh, kw, Ci, Co] → [kw, (kh, Cp), (kd, Co)] with zero rows for the
    # channel-padding lanes (K carries the padded 128-lane tiles verbatim).
    kp = jnp.pad(kernel, ((0, 0),) * 3 + ((0, cp - ci), (0, 0)))
    k2 = jnp.transpose(kp, (2, 1, 3, 0, 4)).reshape(3, 3 * cp, 3 * co)

    has_res = residual is not None
    res = residual if has_res else jnp.zeros((1, 1, 1, 1, co), x.dtype)
    rb, rd, rh, rw = ((b, d, h, w) if has_res else (1, 1, 1, 1))

    fn = functools.partial(_kernel, tile_h=tile_h, w=w, wp=wp, ci=ci, co=co,
                           cp=cp, d_out=d, relu=relu, has_res=has_res)

    def res_map(bb, hh, zz):
        if has_res:
            return (bb, jnp.maximum(zz - 2, 0), hh, 0, 0)
        return (0, 0, 0, 0, 0)

    flops = 2 * 27 * ci * co * d * h * w * b
    return pl.pallas_call(
        fn,
        grid=(b, h // tile_h, d + 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # xp in HBM
            pl.BlockSpec((3, 3 * cp, 3 * co), lambda bb, hh, zz: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bb, hh, zz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bb, hh, zz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h if has_res else 1, w if has_res else 1,
                          co), res_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, w, co),
            lambda bb, hh, zz: (bb, jnp.maximum(zz - 2, 0), hh, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h * w, co), jnp.float32),   # rolling acc
            pltpu.VMEM((2, tile_h + 2, wp, cp), x.dtype),   # slab dbl-buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + res.size) * x.dtype.itemsize
            + b * d * h * w * co * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, k2, scale.reshape(1, co).astype(jnp.float32),
      bias.reshape(1, co).astype(jnp.float32), res)
