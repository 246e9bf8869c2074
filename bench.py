"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: PSMNet 480×640 batch-1 eval-forward latency on one TPU chip vs the
reference's RTX 4090 number (0.0396 s, reference README.md:187 / BASELINE.md
Table 3). vs_baseline > 1 means faster than the reference GPU. The `extra`
field carries the same comparison for the iterative north-star configs
(RAFTStereo 0.1967 s, IGEVStereo 0.2363 s — reference README.md:191,194) at
their eval iteration counts (32, raft_stereo.py:39-40).

Timing uses utils/timing.bench_fn (two-point slope with on-device scalar
sync — block_until_ready is unreliable on the tunneled backend). The
persistent compilation cache keeps the driver's end-of-round run fast;
always run `python bench.py` locally after changing a default compute path
so the cache is warm (round-2 post-mortem: a cold cache timed the driver
run out).

Regression gate (round-4 verdict #4): after printing the JSON line, the
latest BENCH_r*.json in the repo root is compared model-by-model; any
tracked latency more than 3% slower than that record makes the script
print REGRESSION lines to stderr and exit 2 (the JSON is still emitted
first, so recording keeps working). Disable with BENCH_GATE=0.

Env: BENCH_MODELS=psmnet,raft_stereo,igev_stereo (subset selection),
BENCH_BF16=0 for float32, BENCH_GATE=0 to skip the regression gate.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINES_480x640_S = {
    "psmnet": 0.0396,
    "raft_stereo": 0.1967,
    "igev_stereo": 0.2363,
}


def previous_round_latencies() -> dict:
    """{model: latency_s} from the highest-numbered BENCH_r*.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in glob.glob(os.path.join(here, "BENCH_r[0-9]*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return {}
    try:
        rec = json.load(open(best[1]))
    except Exception:
        return {}
    out = {}
    head = rec.get("metric", "")
    if head.endswith("_480x640_fwd_latency") and "value" in rec:
        out[head[: -len("_480x640_fwd_latency")]] = rec["value"]
    for k, v in (rec.get("extra") or {}).items():
        if isinstance(v, dict) and "latency_s" in v:
            out[k] = v["latency_s"]
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from stereo_toolbox_tpu import models as zoo
    from stereo_toolbox_tpu.utils.timing import bench_fn

    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" \
        else jnp.float32
    which = os.environ.get("BENCH_MODELS",
                           "psmnet,raft_stereo,igev_stereo").split(",")

    h, w = 480, 640
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    right = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3),
                              jnp.float32)

    def build(name):
        if name == "psmnet":
            return zoo.PSMNet(max_disp=192, dtype=dtype)
        if name == "raft_stereo":
            return zoo.RAFTStereo(dtype=dtype)
        if name == "igev_stereo":
            return zoo.IGEVStereo(dtype=dtype)
        raise KeyError(name)

    results = {}
    for name in which:
        model = build(name)
        variables = jax.jit(model.init, static_argnames="train")(
            key, left, right, train=False)
        fwd = jax.jit(lambda v, l, r, m=model: m.apply(v, l, r, train=False))
        dt = bench_fn(fwd, (variables, left, right))
        results[name] = {
            "latency_s": round(dt, 5),
            "vs_baseline": round(BASELINES_480x640_S[name] / dt, 3),
        }
        print(f"# {name}: {dt * 1e3:.2f} ms "
              f"({results[name]['vs_baseline']}x vs 4090)", file=sys.stderr)

    head = results.get("psmnet") or next(iter(results.values()))
    head_name = "psmnet" if "psmnet" in results else which[0]
    print(json.dumps({
        "metric": f"{head_name}_480x640_fwd_latency",
        "value": head["latency_s"],
        "unit": "s",
        "vs_baseline": head["vs_baseline"],
        "extra": {k: v for k, v in results.items() if k != head_name},
    }))

    if os.environ.get("BENCH_GATE", "1") == "1":
        prev = previous_round_latencies()
        bad = [f"REGRESSION {k}: {v['latency_s']:.5f}s vs previous round "
               f"{prev[k]:.5f}s ({v['latency_s'] / prev[k] - 1:+.1%})"
               for k, v in results.items()
               if k in prev and v["latency_s"] > prev[k] * 1.03]
        if bad:
            print(*bad, sep="\n", file=sys.stderr)
            sys.exit(2)


if __name__ == "__main__":
    main()
