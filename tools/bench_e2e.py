"""End-to-end model eval-latency comparison across conv3d impls on the chip.

Measures full PSMNet (480x640, batch 1) eval forward under each STTPU_CONV3D
lowering with the repo's slope-timing (utils/timing.bench_fn — the tunneled
backend's block_until_ready is broken, see that module's docstring), and
verifies the impls agree numerically on identical variables via on-device
scalar reductions (bulk readback is pathologically slow here).

This is the end-to-end evidence the round-2 advisor asked for before any
default flip (ADVICE.md round 2).

Usage: python tools/bench_e2e.py [--impls native,via2d,fused] [--f32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="native,via2d,fused")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--hw", default="480x640")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import stereo_toolbox_tpu.nn.layers as L
    from stereo_toolbox_tpu.models import PSMNet
    from stereo_toolbox_tpu.utils.timing import bench_fn

    h, w = map(int, args.hw.split("x"))
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    right = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3),
                              jnp.float32)

    # one shared variable set (param tree is impl-invariant)
    L.CONV3D_DEFAULT = "native"
    model = PSMNet(max_disp=192, dtype=dtype)
    variables = jax.jit(model.init, static_argnames="train")(
        key, left, right, train=False)

    @jax.jit
    def stats(a, b):
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        return jnp.max(d), jnp.mean(d)

    outs = {}
    for impl in args.impls.split(","):
        L.CONV3D_DEFAULT = impl
        fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
        dt = bench_fn(fwd, (variables, left, right))
        outs[impl] = fwd(variables, left, right)
        print(f"{impl:8s} {dt * 1e3:8.2f} ms   vs4090={0.0396 / dt:.3f}x",
              flush=True)

    ref_impl = next(iter(outs))
    for impl, o in outs.items():
        if impl == ref_impl:
            continue
        mx, mn = stats(o, outs[ref_impl])
        print(f"{impl} vs {ref_impl}: max|d|={float(mx):.4f} "
              f"mean|d|={float(mn):.5f}")


if __name__ == "__main__":
    main()
