"""Collective-overhead artifact for SCALING.md (round-5 verdict item 7).

Real N-chip hardware is unavailable (single tunneled v5e), so this bounds
the data-parallel collective cost two honest ways on the 8-virtual-device
CPU mesh the driver's dryrun uses:

1. HLO census — lower the sharded train step and enumerate every
   collective op XLA inserted (all-reduce / reduce-scatter / all-gather /
   collective-permute) with its byte volume. The gradient all-reduce
   volume is a property of the PROGRAM, identical on real chips.
2. Analytic ICI bound — ring all-reduce moves 2·(N−1)/N · bytes per
   chip; at v5e's ~45 GB/s per ICI direction (1D ring over the data
   axis) that yields the per-step collective seconds, compared against
   the measured single-chip step compute time to bound the collective
   fraction / scaling efficiency on real hardware.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/collective_overhead.py [n_devices]
"""

import os
import re
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "f64": 8, "s8": 1, "u8": 1}


def tensor_bytes(sig: str) -> int:
    """'f32[128,3,3]{...}' → byte count (sums tuple elements)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", sig):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(n_devices: int = 8):
    import jax.numpy as jnp
    from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
    from stereo_toolbox_tpu.datasets.loader import DataLoader
    from stereo_toolbox_tpu.models import PSMNet
    from stereo_toolbox_tpu.parallel import make_mesh, shard_batch
    from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                            make_train_step)

    config = TrainConfig(lr=1e-3, max_disp=48, loss="multihead")
    model = PSMNet(max_disp=48)
    ds = SyntheticStereoDataset(num_samples=n_devices, height=96, width=128,
                                max_disp=24, training=True,
                                crop_size=(96, 128), seed=0)
    loader = DataLoader(ds, batch_size=n_devices, num_workers=0, seed=0)
    batch = next(iter(loader))
    mesh = make_mesh(data=n_devices)
    state = init_train_state(model, config, batch, total_steps=10)
    step = make_train_step(model, config, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    lowered = step.lower(state, sharded)
    hlo = lowered.compile().as_text()

    kinds = {"all-reduce": 0, "reduce-scatter": 0, "all-gather": 0,
             "collective-permute": 0}
    bytes_by_kind = dict.fromkeys(kinds, 0)
    for line in hlo.splitlines():
        ls = line.strip()
        for kind in kinds:
            # match op instances like '%all-reduce.1 = f32[...] all-reduce('
            if re.search(rf"= ?[^=]*\b{kind}\(", ls) or \
                    re.search(rf"^%?{kind}[\.\d]* = ", ls):
                kinds[kind] += 1
                sig = ls.split("=", 1)[1] if "=" in ls else ls
                bytes_by_kind[kind] += tensor_bytes(sig.split(kind)[0])
                break

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    grad_bytes = n_params * 4
    total_coll = sum(bytes_by_kind.values())
    print(f"devices={n_devices}  params={n_params/1e6:.2f}M "
          f"(grad f32 = {grad_bytes/2**20:.1f} MiB)")
    for kind, cnt in kinds.items():
        if cnt:
            print(f"  {kind:20s} ops={cnt:4d}  "
                  f"bytes={bytes_by_kind[kind]/2**20:.1f} MiB")
    print(f"  total collective payload/step: {total_coll/2**20:.1f} MiB")

    # analytic ICI bound (ring all-reduce over the data axis)
    ici_gbps = 45e9  # per-direction v5e ICI bandwidth, one 1D ring
    ring_bytes = 2 * (n_devices - 1) / n_devices * grad_bytes
    t_coll = ring_bytes / ici_gbps
    print(f"  ring all-reduce wire bytes/chip: {ring_bytes/2**20:.1f} MiB "
          f"→ {t_coll*1e3:.2f} ms at {ici_gbps/1e9:.0f} GB/s ICI")

    # measured single-chip compute time for the same per-device work (from
    # the r3/r4 chip measurements: PSMNet 96×128-crop train step; pass via
    # env to avoid needing the chip here)
    t_step = float(os.environ.get("STEP_MS", "0")) * 1e-3
    if t_step:
        frac = t_coll / (t_step + t_coll)
        print(f"  vs measured {t_step*1e3:.1f} ms/step on the chip → "
              f"collective fraction ≈ {frac:.1%}, "
              f"scaling efficiency bound ≈ {1 - frac:.1%}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
