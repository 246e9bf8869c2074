"""Component-level timing of CFNet / ACVNet / PCWNet at 1088x1920 — the
three cost-volume families below the 4090 baseline in SPEED.md (round-4).

Usage: python tools/profile_cfnet.py [cfnet|acvnet|pcwnet]
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
from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16
H, W = 1088, 1920


def t(name, fn, *args):
    fn = jax.jit(fn)
    dt = bench_fn(fn, args)
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cfnet"
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    if which == "cfnet":
        from stereo_toolbox_tpu.models.cfnet import (CFNet, CFFeature,
                                                     HourglassUp,
                                                     HourglassMish)
        feat = CFFeature(dtype=DTYPE)
        fv = jax.jit(feat.init, static_argnames="train")(key, img,
                                                         train=False)
        t("CFFeature (x2)", lambda v, x: (feat.apply(v, x, False),
                                          feat.apply(v, x, False)), fv, img)

        # fused pyramid volume at 1/4 with D=48: gwc(40gr on 320ch)+concat
        f4 = jax.random.normal(key, (1, H // 4, W // 4, 320), DTYPE)
        c4 = jax.random.normal(key, (1, H // 4, W // 4, 12), DTYPE)
        t("gwc vol 1/4 (G=40,D=48)",
          lambda a: ops.build_gwc_volume(a, a, 48, 40), f4)
        t("concat vol 1/4 (D=48)",
          lambda a: ops.build_concat_volume(a, a, 48), c4)

        vol = jax.random.normal(key, (1, 48, H // 4, W // 4, 52), DTYPE)
        f5 = jax.random.normal(key, (1, H // 8, W // 8, 44), DTYPE)
        f6 = jax.random.normal(key, (1, H // 16, W // 16, 44), DTYPE)
        # combine path uses volumes at 1/8 and 1/16 too
        hg = HourglassUp(32, dtype=DTYPE)
        vol32 = jax.random.normal(key, (1, 48, H // 4, W // 4, 32), DTYPE)
        vol8 = jax.random.normal(key, (1, 24, H // 8, W // 8, 52), DTYPE)
        vol16 = jax.random.normal(key, (1, 12, H // 16, W // 16, 52), DTYPE)
        try:
            hv = jax.jit(hg.init, static_argnames="train")(
                key, vol32, vol8, vol16, train=False)
            t("HourglassUp (combine1)",
              lambda v, a, b, c: hg.apply(v, a, b, c, False),
              hv, vol32, vol8, vol16)
        except Exception as e:
            print("HourglassUp skipped:", str(e)[:80])

        s = jax.random.randint(key, (1, 12, H // 4, W // 4), 0, 40
                               ).astype(jnp.float32)
        fs = jax.random.normal(key, (1, H // 4, W // 4, 320), DTYPE)
        t("gwc_volume_from_samples s3 (S=12)",
          lambda a, ss: ops.gwc_volume_from_samples(a, a, ss, 40,
                                                    max_shift=48), fs, s)
        fc = jax.random.normal(key, (1, H // 4, W // 4, 12), DTYPE)
        t("concat_volume_from_samples s3",
          lambda a, ss: ops.concat_volume_from_samples(a, a, ss,
                                                       max_shift=48), fc, s)
        s2 = jax.random.randint(key, (1, 16, H // 2, W // 2), 0, 80
                                ).astype(jnp.float32)
        fs2 = jax.random.normal(key, (1, H // 2, W // 2, 160), DTYPE)
        t("gwc_volume_from_samples s2 (S=16, 1/2res)",
          lambda a, ss: ops.gwc_volume_from_samples(a, a, ss, 40,
                                                    max_shift=96), fs2, s2)
        fc2 = jax.random.normal(key, (1, H // 2, W // 2, 12), DTYPE)
        t("concat_volume_from_samples s2",
          lambda a, ss: ops.concat_volume_from_samples(a, a, ss,
                                                       max_shift=96),
          fc2, s2)

        model = CFNet(max_disp=192, dtype=DTYPE)
        mv = jax.jit(model.init, static_argnames="train")(key, img, img,
                                                          train=False)
        t("full CFNet fwd", lambda v, a, b: model.apply(v, a, b,
                                                        train=False),
          mv, img, img)
    elif which == "acvnet":
        from stereo_toolbox_tpu.models.acvnet import (ACVNet, HourglassAttn,
                                                      _DWParams)
        import flax.linen as nn

        class _DW(nn.Module):
            dtype = DTYPE

            @nn.compact
            def __call__(self, x, dilation):
                return ACVNet._depthwise(self, x, dilation, "patch")

        vol = jax.random.normal(key, (1, 48, H // 4, W // 4, 40), DTYPE)
        dw = _DW()
        dv = dw.init(key, vol, 1)
        t("patch depthwise (D=48, C=40)",
          lambda v, x: dw.apply(v, x, 1), dv, vol)
        from stereo_toolbox_tpu.nn.layers import ConvBNAct
        cb = ConvBNAct(32, 3, dtype=DTYPE)
        cv = jax.jit(cb.init, static_argnames="train")(key, vol, train=False)
        t("ConvBNAct 40->32 3x3x3 (D=48)",
          lambda v, x: cb.apply(v, x, False), cv, vol)
        vol32 = jax.random.normal(key, (1, 48, H // 4, W // 4, 32), DTYPE)
        hga = HourglassAttn(32, dtype=DTYPE)
        hv = jax.jit(hga.init, static_argnames="train")(key, vol32,
                                                        train=False)
        t("HourglassAttn", lambda v, x: hga.apply(v, x, False), hv, vol32)
        model = ACVNet(max_disp=192, dtype=DTYPE)
        mv = jax.jit(model.init, static_argnames="train")(key, img, img,
                                                          train=False)
        t("full ACVNet fwd", lambda v, a, b: model.apply(v, a, b,
                                                         train=False),
          mv, img, img)
    else:
        from stereo_toolbox_tpu.models.pcwnet import PCWNet_GC
        model = PCWNet_GC(max_disp=192, dtype=DTYPE)
        mv = jax.jit(model.init, static_argnames="train")(key, img, img,
                                                          train=False)
        t("full PCWNet fwd", lambda v, a, b: model.apply(v, a, b,
                                                         train=False),
          mv, img, img)


if __name__ == "__main__":
    main()
