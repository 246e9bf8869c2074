"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: PSMNet 480×640 batch-1 eval-forward latency on one TPU chip,
compared against the reference's RTX 4090 number (0.0396 s,
reference README.md:187 / BASELINE.md Table 3). vs_baseline > 1 means faster
than the reference GPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PSMNET_480x640_S = 0.0396


def main():
    import jax
    # Persistent compilation cache: the model compiles once per machine; the
    # driver's end-of-round run then skips the multi-minute remote compile.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from stereo_toolbox_tpu.models import PSMNet

    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" \
        else jnp.float32
    model = PSMNet(max_disp=192, dtype=dtype)
    h, w = 480, 640
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    right = jax.random.normal(key, (1, h, w, 3), jnp.float32)

    variables = jax.jit(model.init, static_argnames="train")(
        key, left, right, train=False)

    @jax.jit
    def fwd(variables, left, right):
        return model.apply(variables, left, right, train=False)

    from stereo_toolbox_tpu.utils.timing import bench_fn
    dt = bench_fn(fwd, (variables, left, right))

    print(json.dumps({
        "metric": "psmnet_480x640_fwd_latency",
        "value": round(dt, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_PSMNET_480x640_S / dt, 3),
    }))


if __name__ == "__main__":
    main()
