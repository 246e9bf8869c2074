"""Component-level timing of PSMNet on the real chip: feature extraction,
volume build, 3D aggregation, upsample+regression. Guides kernel work."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.models.psmnet import PSMNet, SPPFeature, Hourglass3D
from stereo_toolbox_tpu.nn.layers import ConvBNAct
from stereo_toolbox_tpu import ops
from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" \
    else jnp.float32
H, W = 480, 640
D4 = 48


def t(name, fn, *args):
    fn = jax.jit(fn)
    dt = bench_fn(fn, args)
    print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, H, W, 3), jnp.float32)

    feat_mod = SPPFeature(dtype=DTYPE)
    fvars = jax.jit(feat_mod.init, static_argnames="train")(key, img,
                                                            train=False)
    t("SPP features (x2 images)",
      lambda v, x: (feat_mod.apply(v, x, False),
                    feat_mod.apply(v, x, False)), fvars, img)

    f = jax.random.normal(key, (1, H // 4, W // 4, 32), DTYPE)
    t("concat volume build", lambda a, b: ops.build_concat_volume(a, b, D4),
      f, f)

    vol = jax.random.normal(key, (1, D4, H // 4, W // 4, 32), DTYPE)
    hg = Hourglass3D(32, dtype=DTYPE)
    hvars = jax.jit(hg.init, static_argnames="train")(key, vol, None, None,
                                                      train=False)
    t("one 3D hourglass", lambda v, x: hg.apply(v, x, None, None, False),
      hvars, vol)

    vol64 = jax.random.normal(key, (1, D4, H // 4, W // 4, 64), DTYPE)
    cb = ConvBNAct(32, 3, dtype=DTYPE)
    cvars = jax.jit(cb.init, static_argnames="train")(key, vol64, train=False)
    t("single 3x3x3 conv 64->32", lambda v, x: cb.apply(v, x, False),
      cvars, vol64)

    cost = jax.random.normal(key, (1, D4, H // 4, W // 4, 1), jnp.float32)
    t("upsample+softargmax", lambda c: ops.disparity_regression(
        jax.nn.softmax(ops.interpolate(c[..., 0], (192, H, W), (1, 2, 3),
                                       align_corners=False), axis=1), 192),
      cost)

    model = PSMNet(max_disp=192, dtype=DTYPE)
    mvars = jax.jit(model.init, static_argnames="train")(
        key, img, img, train=False)
    t("full PSMNet fwd", lambda v, a, b: model.apply(v, a, b, train=False),
      mvars, img, img)


if __name__ == "__main__":
    main()
