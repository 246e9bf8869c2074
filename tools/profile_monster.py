"""Component timing for MonSter (vitl) at 1088x1920 — the 0.95x Table-3
cell (round 4). Attribution targets: the frozen vitl ViT, the mix-phase
warps (bilinear gathers), the combined geo lookups, and REMP."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stereo_toolbox_tpu.models.depth_anything_v2 import DepthAnythingV2
from stereo_toolbox_tpu.models.monster import REMP, monster_disp_warp
from stereo_toolbox_tpu.models.igev_stereo import combined_geo_lookup
from stereo_toolbox_tpu.ops.corr import (band_offsets,
                                         build_corr_band_pyramid,
                                         build_volume_pyramid)
from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16
H, W = 1088, 1920
H4, W4 = H // 4, W // 4


def t(name, fn, *args, mul=1):
    fn = jax.jit(fn)
    dt = bench_fn(fn, args)
    print(f"{name:40s} {dt*1e3:9.2f} ms (x{mul} = {dt*mul*1e3:8.1f})",
          flush=True)
    return dt * mul


def main():
    key = jax.random.PRNGKey(0)
    total = 0.0

    # vitl DAv2 on both views at 952x1680 (the 14/16 resize)
    rh = round(H * 14 / 16 / 14) * 14
    rw = round(W * 14 / 16 / 14) * 14
    both = jax.random.normal(key, (2, rh, rw, 3), jnp.float32)
    dav2 = DepthAnythingV2("vitl", dtype=DTYPE)
    dv = jax.jit(lambda k, x: dav2.init(k, x, return_features=True),
                 )(key, both)
    total += t("DAv2 vitl (both views)",
               lambda v, x: dav2.apply(v, x, return_features=True)[0],
               dv, both)

    # mix-phase warp: 96-ch features, 2 per iteration x 7 iterations
    feat = jax.random.normal(key, (1, H4, W4, 96), jnp.float32)
    disp = jnp.abs(jax.random.normal(key, (1, H4, W4), jnp.float32)) * 20
    total += t("monster_disp_warp (96ch)", monster_disp_warp, feat, disp,
               mul=14)

    # combined geo lookup: 2 per plain iter (25) + 4 per mix iter (7)
    gev = jax.random.normal(key, (1, H4, W4, 48, 8), jnp.float32)
    geo_pyr = tuple(build_volume_pyramid(gev, 2))
    ml = jax.random.normal(key, (1, H4, W4, 96), jnp.float32)
    offs = band_offsets(2, 48, 4, 8)
    bands = build_corr_band_pyramid(ml, ml, 2, 48, 4, 8, normalize=False)
    x0 = jnp.broadcast_to(jnp.arange(W4, dtype=jnp.float32)[None, None, :],
                          (1, H4, W4))
    total += t("combined geo lookup (banded)",
               lambda g, c, d, x: combined_geo_lookup(g, c, d, x, 4, offs),
               geo_pyr, bands, disp, x0, mul=25 + 28)

    # REMP at full res
    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    dfull = jnp.abs(jax.random.normal(key, (1, H, W), jnp.float32)) * 40
    remp = REMP(dtype=DTYPE)
    rv = jax.jit(remp.init, static_argnames="train")(key, dfull, dfull, img,
                                                     img, train=False)
    total += t("REMP (full res)",
               lambda v, a, b, l, r: remp.apply(v, a, b, l, r, False),
               rv, dfull, dfull, img, img)

    print(f"{'--- component sum':40s} {total*1e3:9.1f} ms "
          f"(full fwd: 1975 ms)")


if __name__ == "__main__":
    main()
