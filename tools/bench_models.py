"""Per-model eval-forward latency on the real TPU chip vs RTX 4090 baseline.

Reference numbers: README.md:185-200 (speed_and_memory_test, Table 3).
Usage: python tools/bench_models.py [model ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (model, resolution) -> reference RTX 4090 seconds (BASELINE.md Table 3)
BASELINE_S = {
    ("PSMNet", (480, 640)): 0.0396,
    ("PSMNet", (736, 1280)): 0.1230,
    ("GwcNet_G", (480, 640)): 0.0525,
    ("GwcNet_GC", (480, 640)): 0.0566,
    ("ACVNet", (480, 640)): 0.0711,
    ("CFNet", (480, 640)): 0.0689,
    ("RAFTStereo", (480, 640)): 0.1462,
    ("RAFTStereo", (736, 1280)): 0.3624,
    ("IGEVStereo", (480, 640)): 0.2363,
    ("IGEVStereo", (736, 1280)): 0.4309,
    ("SelectiveRAFT", (480, 640)): 0.1392,
    ("SelectiveIGEV", (480, 640)): 0.2350,
}


def bench(name: str, hw=(480, 640), iters: int = 30, dtype_str: str = "bf16"):
    import jax
    import jax.numpy as jnp
    from stereo_toolbox_tpu.models import create_model

    dtype = jnp.bfloat16 if dtype_str == "bf16" else jnp.float32
    try:
        model = create_model(name, max_disp=192, dtype=dtype)
    except TypeError:  # iterative models have no max_disp field
        model = create_model(name, dtype=dtype)
    h, w = hw
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    right = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init, static_argnames="train")(
        key, left, right, train=False)
    print(f"{name} init {time.time() - t0:.1f}s", flush=True)

    @jax.jit
    def fwd(variables, left, right):
        return model.apply(variables, left, right, train=False)

    t0 = time.time()
    out = jax.block_until_ready(fwd(variables, left, right))
    print(f"{name} compile+first {time.time() - t0:.1f}s "
          f"out {out.shape}", flush=True)
    # Chained on-device loop: block_until_ready is unreliable on the
    # tunneled backend (see utils/timing.py).
    from stereo_toolbox_tpu.utils.timing import bench_fn_device_loop
    dt = bench_fn_device_loop(
        jax.jit(lambda l: model.apply(variables, l, right, train=False)),
        (left,), n1=4, n2=max(iters // 2, 8))
    base = BASELINE_S.get((name, hw))
    vs = f" vs_4090 {base / dt:5.2f}x" if base else ""
    print(f"{name} {h}x{w}: {dt * 1000:8.2f} ms{vs}", flush=True)
    return dt


if __name__ == "__main__":
    names = sys.argv[1:] or ["RAFTStereo", "IGEVStereo"]
    hw = (480, 640)
    if names and "x" in names[-1]:
        h, w = names[-1].split("x")
        hw = (int(h), int(w))
        names = names[:-1]
    for n in names:
        bench(n, hw)
