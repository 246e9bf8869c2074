"""Micro-benchmarks of kernel strategies on the real chip:
native NDHWC 3D conv vs conv3d_via_2d; XLA volume build vs Pallas."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.ops.conv3d import conv3d_via_2d
from stereo_toolbox_tpu.ops.pallas.volume import (build_concat_volume_pallas,
                                                  build_gwc_volume_pallas)
from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16
D, H, W = 48, 120, 160


def t(name, fn, *args, flops=None):
    try:
        dt = bench_fn(jax.jit(fn), args)
    except Exception as e:  # e.g. scoped-vmem OOM for oversized tiles
        print(f"{name:38s}   FAILED: {str(e).splitlines()[0][:90]}",
              flush=True)
        return
    extra = ""
    if flops:
        extra = f" ({flops / dt / 1e12:6.1f} TFLOP/s)"
    print(f"{name:38s} {dt*1e3:8.2f} ms{extra}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    # create inputs via one jitted call — eager op-by-op dispatch through
    # the tunneled backend is pathologically slow (see utils/timing.py)
    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def randn(k, shape, dtype):
        return jax.random.normal(k, shape, dtype)

    for ci, co in ((64, 32), (32, 32)):
        x = randn(key, (1, D, H, W, ci), DTYPE)
        k = randn(key, (3, 3, 3, ci, co), DTYPE)
        fl = 2 * 27 * ci * co * D * H * W
        t(f"conv3d native {ci}->{co}",
          lambda a, b: jax.lax.conv_general_dilated(
              a, b, (1, 1, 1), "SAME",
              dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
              preferred_element_type=jnp.float32), x, k, flops=fl)
        t(f"conv3d via2d  {ci}->{co}", conv3d_via_2d, x, k, flops=fl)
        from stereo_toolbox_tpu.ops.pallas.conv3d_fused import conv3d_fused
        for th in (12, 24, 40, 60):
            t(f"conv3d fused-pallas {ci}->{co} th={th}",
              lambda a, b, th=th: conv3d_fused(a, b, relu=True, tile_h=th),
              x, k, flops=fl)

    x = randn(key, (1, D, H, W, 32), DTYPE)
    k = randn(key, (3, 3, 3, 32, 64), DTYPE)
    fl = 2 * 27 * 32 * 64 * (D // 2) * (H // 2) * (W // 2)
    t("conv3d native 32->64 s2",
      lambda a, b: jax.lax.conv_general_dilated(
          a, b, (2, 2, 2), "SAME",
          dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
          preferred_element_type=jnp.float32), x, k, flops=fl)
    t("conv3d via2d  32->64 s2",
      lambda a, b: conv3d_via_2d(a, b, (2, 2, 2)), x, k, flops=fl)

    # factorized first conv over the concat volume (PSMNet dres0.0) vs the
    # naive build+conv3d it replaces
    from stereo_toolbox_tpu.ops.conv3d import conv3d_concat_volume
    l32 = randn(key, (1, H, W, 32), DTYPE)
    r32 = randn(jax.random.PRNGKey(7), (1, H, W, 32), DTYPE)
    k64 = randn(key, (3, 3, 3, 64, 32), DTYPE)
    fl = 2 * 27 * 64 * 32 * D * H * W
    t("concat-vol conv naive (build+conv3d)",
      lambda a, b, kk: jax.lax.conv_general_dilated(
          ops.build_concat_volume(a, b, D), kk, (1, 1, 1), "SAME",
          dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
          preferred_element_type=jnp.float32), l32, r32, k64, flops=fl)
    t("concat-vol conv factorized",
      lambda a, b, kk: conv3d_concat_volume(a, b, kk, D), l32, r32, k64,
      flops=fl)

    # volume builds: 320ch gwc (GwcNet) and 32ch concat (PSMNet)
    f320 = randn(key, (1, H, W, 320), DTYPE)
    t("gwc volume XLA (320c, 40g)",
      lambda a, b: ops.build_gwc_volume(a, b, D, 40), f320, f320)
    t("gwc volume Pallas (320c, 40g)",
      lambda a, b: build_gwc_volume_pallas(a, b, D, 40, block_h=1),
      f320, f320)

    f32 = randn(key, (1, H, W, 32), DTYPE)
    t("concat volume XLA (32c)",
      lambda a, b: ops.build_concat_volume(a, b, D), f32, f32)
    t("concat volume Pallas (32c)",
      lambda a, b: build_concat_volume_pallas(a, b, D, block_h=1),
      f32, f32)


if __name__ == "__main__":
    main()
