"""Fine-grained component timing of ACVNet — the one family below the 4090
baseline at every resolution in round-4's SPEED.md (0.84-0.91x).

Times every stage of the forward separately so the deficit vs GwcNet_GC
(which wins all three cells with the same trunk + 3 hourglasses) can be
attributed to specific ops of the attention branch
(reference models/ACVNet/acv.py:109-112,180-196).

Usage: python tools/profile_acvnet.py [HxW] [stage-filter-substring]
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


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1088x1920"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    H, W = (int(v) for v in res.split("x"))
    h4, w4 = H // 4, W // 4
    D = 48
    key = jax.random.PRNGKey(0)

    def t(name, fn, *args):
        if filt and filt not in name:
            return
        fn = jax.jit(fn)
        dt = bench_fn(fn, args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)

    import flax.linen as nn
    from stereo_toolbox_tpu.models.acvnet import (ACVNet, HourglassAttn,
                                                  BlockAttention3D)
    from stereo_toolbox_tpu.models.gwcnet import GwcFeature
    from stereo_toolbox_tpu.nn.layers import ConvBNAct

    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    feat = GwcFeature(concat_feature=False, dtype=DTYPE)
    fv = jax.jit(feat.init, static_argnames="train")(key, img, train=False)
    t("GwcFeature x2", lambda v, x: (feat.apply(v, x, False)["gwc_feature"],
                                     feat.apply(v, x, False)["gwc_feature"]),
      fv, img)

    f4 = jax.random.normal(key, (1, h4, w4, 320), DTYPE)
    t("gwc volume (G=40)",
      lambda a, b: ops.build_gwc_volume(a, b, D, 40), f4, f4)

    vol = jax.random.normal(key, (1, D, h4, w4, 40), DTYPE)

    class _DW(nn.Module):
        dilation: int = 1
        channels: int = 40
        dtype: jnp.dtype | None = DTYPE

        @nn.compact
        def __call__(self, x):
            return ACVNet._depthwise(self, x, self.dilation, "patch")

    for cc, dil, name in [(40, 1, "patch dw d1 C40"), (8, 1, "p1 dw d1 C8"),
                          (16, 2, "p2 dw d2 C16"), (16, 3, "p3 dw d3 C16")]:
        dw = _DW(dilation=dil, channels=cc)
        sub = vol[..., :cc]
        dv = jax.jit(dw.init)(key, sub)
        dw_f = dw
        t(name, lambda v, x, m=dw_f: m.apply(v, x), dv, sub)

    ca0 = ConvBNAct(32, 3, conv3d_impl="via2d", dtype=DTYPE)
    cv0 = jax.jit(ca0.init, static_argnames="train")(key, vol, train=False)
    t("ca0 40->32 via2d", lambda v, x: ca0.apply(v, x, False), cv0, vol)
    vol32 = jax.random.normal(key, (1, D, h4, w4, 32), DTYPE)
    ca1 = ConvBNAct(32, 3, act=None, conv3d_impl="via2d", dtype=DTYPE)
    cv1 = jax.jit(ca1.init, static_argnames="train")(key, vol32, train=False)
    t("ca1 32->32 via2d", lambda v, x: ca1.apply(v, x, False), cv1, vol32)
    ca0n = ConvBNAct(32, 3, dtype=DTYPE)
    cv0n = jax.jit(ca0n.init, static_argnames="train")(key, vol, train=False)
    t("ca0 40->32 native/auto", lambda v, x: ca0n.apply(v, x, False),
      cv0n, vol)
    ca1n = ConvBNAct(32, 3, act=None, dtype=DTYPE)
    cv1n = jax.jit(ca1n.init, static_argnames="train")(key, vol32,
                                                       train=False)
    t("ca1 32->32 native/auto", lambda v, x: ca1n.apply(v, x, False),
      cv1n, vol32)

    hga = HourglassAttn(32, dtype=DTYPE)
    hv = jax.jit(hga.init, static_argnames="train")(key, vol32, train=False)
    t("HourglassAttn(32)", lambda v, x: hga.apply(v, x, False), hv, vol32)

    c4 = jax.random.normal(key, (1, D // 4, h4 // 4, w4 // 4, 128), DTYPE)
    ba = BlockAttention3D(num_heads=16, dtype=DTYPE)
    bv = jax.jit(ba.init)(key, c4)
    t("BlockAttention3D (c4)", lambda v, x: ba.apply(v, x), bv, c4)

    cls = nn.Conv(1, (3, 3, 3), use_bias=False, dtype=DTYPE)
    clv = jax.jit(cls.init)(key, vol32)
    t("classif 32->1", lambda v, x: cls.apply(v, x), clv, vol32)

    cl = jax.random.normal(key, (1, h4, w4, 32), DTYPE)
    t("concat volume (2x32)",
      lambda a, b: ops.build_concat_volume(a, b, D, mask_left=False), cl, cl)

    att = jax.random.normal(key, (1, D, h4, w4, 1), DTYPE)
    vol64 = jax.random.normal(key, (1, D, h4, w4, 64), DTYPE)
    t("softmax(att) * concat_vol",
      lambda a, v: jax.nn.softmax(a, axis=1) * v, att, vol64)

    m0 = ConvBNAct(32, 3, dtype=DTYPE)
    mv0 = jax.jit(m0.init, static_argnames="train")(key, vol64, train=False)
    t("main conv 64->32", lambda v, x: m0.apply(v, x, False), mv0, vol64)
    t("main conv 32->32", lambda v, x: ca1n.apply(v, x, False), cv1n, vol32)

    def regress(c):
        c = ops.interpolate(c[..., 0], (192, H, W), (1, 2, 3),
                            align_corners=False)
        prob = jax.nn.softmax(c.astype(jnp.float32), axis=1)
        return ops.disparity_regression(prob, 192)
    c_low = jax.random.normal(key, (1, D, h4, w4, 1), DTYPE)
    t("regress (interp+softmax+soft-argmax)", regress, c_low)

    model = ACVNet(max_disp=192, dtype=DTYPE)
    mv = jax.jit(model.init, static_argnames="train")(key, img, img,
                                                      train=False)
    t("full ACVNet fwd",
      lambda v, a, b: model.apply(v, a, b, train=False), mv, img, img)

    from stereo_toolbox_tpu.models.gwcnet import GwcNet
    gm = GwcNet(max_disp=192, use_concat_volume=True, dtype=DTYPE)
    gv = jax.jit(gm.init, static_argnames="train")(key, img, img, train=False)
    t("full GwcNet_GC fwd",
      lambda v, a, b: gm.apply(v, a, b, train=False), gv, img, img)


if __name__ == "__main__":
    main()
