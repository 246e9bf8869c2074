"""Component timing of the faithful FoundationStereo (round 5) — the
rebuild is 3-4× heavier than the round-3 approximation it replaced
(max_disp 416, 28-ch volume, EdgeNeXt+DAv2 trunk), so its Table-3 cells
need their own attribution.

Usage: python tools/profile_foundation.py [HxW] [vits|vitl]
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
    res = sys.argv[1] if len(sys.argv) > 1 else "736x1280"
    vit = sys.argv[2] if len(sys.argv) > 2 else "vits"
    H, W = (int(v) for v in res.split("x"))
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    def t(name, fn, *args):
        fn = jax.jit(fn)
        dt = bench_fn(fn, args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)

    from stereo_toolbox_tpu.models.foundation_stereo import (
        ContextNetDino, FSFeature, FSHourglass, FoundationStereo)

    feat = FSFeature(vit, dtype=DTYPE)
    both = jnp.concatenate([img, img], 0)
    fv = jax.jit(feat.init)(key, both, both)
    t("FSFeature (both views incl. dino)",
      lambda v, x: feat.apply(v, x, x), fv, both)

    h4, w4 = H // 4, W // 4
    d4 = 104
    vd = 28
    from stereo_toolbox_tpu import ops
    f4 = jax.random.normal(key, (1, h4, w4, 128), DTYPE)
    t("cosine gwc volume (G=8, D=104)",
      lambda a, b: ops.build_gwc_volume_cosine(a, b, d4, 8), f4, f4)

    vol = jax.random.normal(key, (1, d4, h4, w4, vd), DTYPE)
    feats = [jax.random.normal(key, (1, h4 // (2 ** i), w4 // (2 ** i),
                                     c), DTYPE)
             for i, c in enumerate((128, 192, 320, 304))]
    hg = FSHourglass(vd, 416, dtype=DTYPE)
    hv = jax.jit(hg.init, static_argnames="train")(key, vol, feats,
                                                   train=False)
    t("FSHourglass (D=104, C=28)",
      lambda v, x, f: hg.apply(v, x, f, False), hv, vol, feats)

    cn = ContextNetDino(dtype=DTYPE)
    vf = jax.random.normal(key, (1, h4, w4, 32 if vit == "vits" else 128),
                           DTYPE)
    cv = jax.jit(cn.init, static_argnames="train")(key, img, vf,
                                                   train=False)
    t("ContextNetDino", lambda v, x, f: cn.apply(v, x, f, False),
      cv, img, vf)

    for iters in (1, 8):
        model = FoundationStereo(vit_size=vit, dtype=DTYPE)
        mv = jax.jit(model.init, static_argnames="train")(
            key, img, img, train=False)
        t(f"full fwd, iters={iters}",
          lambda v, a, b, it=iters, m=model: m.apply(
              v, a, b, train=False, iters=it), mv, img, img)
        del mv


if __name__ == "__main__":
    main()
