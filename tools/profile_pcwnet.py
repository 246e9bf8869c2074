"""Stage timing of PCWNet_GC — the family 0.77x vs the 4090 at 1088×1920.

Times the eval forward's stages with one set of initialized weights so the
deficit can be attributed (feature trunk ×2 views, 4 multi-scale volumes,
HourglassUp3 fusion, 3 Mish hourglasses, classify+regress, and the
full-resolution warp/correlation/RefineNetV3 refinement).

Usage: python tools/profile_pcwnet.py [HxW]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1088x1920"
    H, W = (int(v) for v in res.split("x"))
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    import flax.linen as nn
    from stereo_toolbox_tpu import ops
    from stereo_toolbox_tpu.models.pcwnet import (HourglassUp3, PCWFeature,
                                                  RefineNetV3,
                                                  signed_correlation_volume)
    from stereo_toolbox_tpu.models.cfnet import HourglassMish
    from stereo_toolbox_tpu.nn.layers import ConvBNAct
    from stereo_toolbox_tpu.nn.layers import mish

    def t(name, fn, *args):
        fn = jax.jit(fn)
        fn(*args)
        print(f"{name:44s} {bench_fn(fn, args)*1e3:9.2f} ms", flush=True)

    feat = PCWFeature(12, dtype=DTYPE)
    both = jnp.concatenate([left, left], 0)
    fv = jax.jit(feat.init, static_argnames="train")(key, both, train=False)
    t("PCWFeature (both views, batch2)",
      lambda v, x: feat.apply(v, x, False), fv, both)

    h4, w4, D = H // 4, W // 4, 48
    f320 = jax.random.normal(key, (1, h4, w4, 320), DTYPE)
    t("gwc volume s1 (G=40, D=48)",
      lambda a, b: ops.build_gwc_volume(a, b, D, 40), f320, f320)
    f2 = jax.random.normal(key, (1, h4 // 2, w4 // 2, 320), DTYPE)
    t("gwc volume s2", lambda a, b: ops.build_gwc_volume(a, b, D // 2, 40),
      f2, f2)

    vol = jax.random.normal(key, (1, D, h4, w4, 52), DTYPE)
    ca = ConvBNAct(32, 3, act=mish, dtype=DTYPE)
    cv = jax.jit(ca.init, static_argnames="train")(key, vol, train=False)
    t("ConvBNAct 52->32 3^3 @1/4", lambda v, x: ca.apply(v, x, False),
      cv, vol)

    v32 = jax.random.normal(key, (1, D, h4, w4, 32), DTYPE)
    v2 = jax.random.normal(key, (1, D // 2, h4 // 2, w4 // 2, 52), DTYPE)
    v3 = jax.random.normal(key, (1, D // 4, h4 // 4, w4 // 4, 52), DTYPE)
    v4 = jax.random.normal(key, (1, D // 8, h4 // 8, w4 // 8, 52), DTYPE)
    hg = HourglassUp3(32, dtype=DTYPE)
    hv = jax.jit(hg.init, static_argnames="train")(key, v32, v2, v3, v4,
                                                   train=False)
    t("HourglassUp3", lambda v, x, a, b, c: hg.apply(v, x, a, b, c, False),
      hv, v32, v2, v3, v4)

    hm = HourglassMish(32, dtype=DTYPE)
    hmv = jax.jit(hm.init, static_argnames="train")(key, v32, train=False)
    t("HourglassMish (x3 in model)", lambda v, x: hm.apply(v, x, False),
      hmv, v32)

    def classify_regress(p, x):
        h = ConvBNAct(32, 3, act=mish, dtype=DTYPE)
        hv2 = h.init(key, x, False)
        out = h.apply(hv2, x, False)
        c = nn.Conv(1, (3, 3, 3), use_bias=False, dtype=DTYPE)
        cv2 = c.init(key, out)
        cost = c.apply(cv2, out)[..., 0]
        cf = ops.interpolate(cost.astype(jnp.float32), (192, H, W),
                             (1, 2, 3), align_corners=True)
        return ops.disparity_regression(jax.nn.softmax(cf, 1), 192)
    t("classify+regress (full-res interp)",
      lambda x: classify_regress(None, x), v32)

    rf = jax.random.normal(key, (1, H, W, 32), DTYPE)
    t("signed corr (radius 24) @full",
      lambda a, b: signed_correlation_volume(a, b, 24), rf, rf)

    rin = jax.random.normal(key, (1, H, W, 147), DTYPE)
    disp = jnp.abs(jax.random.normal(key, (1, H, W), jnp.float32)) * 50
    rn = RefineNetV3(dtype=DTYPE)
    rv = jax.jit(rn.init, static_argnames="train")(key, rin, disp,
                                                   train=False)
    t("RefineNetV3 @full res", lambda v, x, d: rn.apply(v, x, d, False),
      rv, rin, disp)


if __name__ == "__main__":
    main()
