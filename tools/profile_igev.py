"""Component-level timing of IGEVStereo at Table-3 resolutions on the real
chip. Splits the 32-iteration eval forward into its pieces so the sub-1.0x
1088x1920 cell (SPEED.md, round-3 verdict weak #1) can be attributed:
features/stems, volume+GEV aggregation, all-pairs corr, and the per-iteration
scan step (lookup / update block / superpixel upsample).

Usage:  python tools/profile_igev.py [H W]   (default 1088 1920)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.models.igev_stereo import (
    IGEVStereo, GEVHourglass, IGEVUpdateBlock, combined_geo_lookup)
from stereo_toolbox_tpu.nn.igev_blocks import IGEVFeature
from stereo_toolbox_tpu.ops.corr import (all_pairs_correlation,
                                         build_corr_pyramid,
                                         build_volume_pyramid)
from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" \
    else jnp.float32
H = int(sys.argv[1]) if len(sys.argv) > 2 else 1088
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
H4, W4 = H // 4, W // 4
D4 = 48
ITERS = 32


def t(name, fn, *args, mul=1):
    fn = jax.jit(fn)
    dt = bench_fn(fn, args)
    print(f"{name:38s} {dt*1e3:9.2f} ms  (x{mul} = {dt*mul*1e3:8.1f} ms)",
          flush=True)
    return dt * mul


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    total = 0.0

    feat = IGEVFeature(dtype=DTYPE)
    fvars = jax.jit(feat.init, static_argnames="train")(key, img, train=False)
    total += t("IGEVFeature (x2 images)",
               lambda v, x: (feat.apply(v, x, False)[0],
                             feat.apply(v, x, False)[0]), fvars, img)

    ml = jax.random.normal(key, (1, H4, W4, 96), jnp.float32)
    total += t("gwc volume (G=8, D=48)",
               lambda a, b: ops.build_gwc_volume(
                   a.astype(DTYPE), b.astype(DTYPE), D4, 8), ml, ml)

    features = [jax.random.normal(key, (1, H // s, W // s, c), DTYPE)
                for s, c in ((4, 96), (8, 64), (16, 192), (32, 160))]
    # (x8/x16 channels after deconv fusion per nn/igev_blocks.py:212-218)
    vol = jax.random.normal(key, (1, D4, H4, W4, 8), DTYPE)
    hg = GEVHourglass(8, dtype=DTYPE)
    hvars = jax.jit(hg.init, static_argnames="train")(
        key, vol, features, train=False)
    total += t("GEV hourglass (cost_agg)",
               lambda v, x, f: hg.apply(v, x, f, False), hvars, vol, features)

    total += t("all-pairs corr + pyramids",
               lambda a, b: tuple(build_corr_pyramid(
                   all_pairs_correlation(a, b, normalize=False), 2)), ml, ml)

    # ---- per-iteration pieces ----
    corr = jax.random.normal(key, (1, H4, W4, W4), jnp.float32)
    corr_pyr = tuple(build_corr_pyramid(corr, 2))
    gev = jax.random.normal(key, (1, H4, W4, D4, 8), jnp.float32)
    geo_pyr = tuple(build_volume_pyramid(gev, 2))
    disp = jnp.abs(jax.random.normal(key, (1, H4, W4), jnp.float32)) * 20
    x0 = jnp.broadcast_to(jnp.arange(W4, dtype=jnp.float32)[None, None, :],
                          (1, H4, W4))
    total += t("combined geo+corr lookup",
               lambda g, c, d, x: combined_geo_lookup(g, c, d, x, 4),
               geo_pyr, corr_pyr, disp, x0, mul=ITERS)

    nets = tuple(jax.random.normal(key, (1, H // s, W // s, 128), DTYPE)
                 for s in (4, 8, 16))
    ctxs = tuple(tuple(jax.random.normal(key, (1, H // s, W // s, 128),
                                         DTYPE) for _ in range(3))
                 for s in (4, 8, 16))
    # geo channels: 2 levels x (8-ch GEV x 9 taps + 9 corr taps) = 162
    geo = jax.random.normal(key, (1, H4, W4, 162), jnp.float32)
    ub = IGEVUpdateBlock(dtype=DTYPE)
    uvars = ub.init(key, nets, ctxs, geo, disp[..., None])
    total += t("update block (GRUs+heads)",
               lambda v, n, c, g, d: ub.apply(v, n, c, g, d),
               uvars, nets, ctxs, geo, disp[..., None], mul=ITERS)

    # in-loop superpixel upsample (Conv2x + ConvTranspose + blend)
    import flax.linen as nn
    from stereo_toolbox_tpu.nn.igev_blocks import Conv2x

    class UpsampleOnly(nn.Module):
        dtype: jnp.dtype | None = None

        @nn.compact
        def __call__(self, mask_feat, stem_2x, disp):
            xspx = Conv2x(32, deconv=True, dtype=self.dtype,
                          name="spx_2_gru")(mask_feat, stem_2x)
            spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx_gru")(xspx)
            spx = jax.nn.softmax(spx.astype(jnp.float32), axis=-1)
            return ops.context_upsample(disp.astype(jnp.float32) * 4.0, spx)

    mask_feat = jax.random.normal(key, (1, H4, W4, 32), DTYPE)
    stem_2x = jax.random.normal(key, (1, H // 2, W // 2, 32), DTYPE)
    up = UpsampleOnly(dtype=DTYPE)
    upvars = up.init(key, mask_feat, stem_2x, disp)
    total += t("superpixel upsample (in-loop)",
               lambda v, m, s, d: up.apply(v, m, s, d),
               upvars, mask_feat, stem_2x, disp, mul=ITERS)

    print(f"{'--- component sum':38s} {total*1e3:9.1f} ms")

    model = IGEVStereo(dtype=DTYPE)
    mvars = jax.jit(model.init, static_argnames="train")(
        key, img, img, train=False)
    t("full IGEVStereo fwd (32 it)",
      lambda v, a, b: model.apply(v, a, b, train=False), mvars, img, img)


if __name__ == "__main__":
    main()
