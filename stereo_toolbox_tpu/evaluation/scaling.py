"""Training-throughput and scaling-efficiency measurement.

No reference counterpart (the reference publishes no distributed numbers —
SURVEY §6); targets come from BASELINE.json: frames/s/chip at 1 chip vs
N devices with ≥85% efficiency.

Measures jitted train-step throughput on meshes of increasing size (global
batch scaled with the mesh, per-device batch constant — weak scaling), using
the slope-timing utility that survives this environment's async dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stereo_toolbox_tpu.parallel import make_mesh, shard_batch
from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                        make_train_step)
from stereo_toolbox_tpu.utils.timing import make_sync


def measure_scaling(model, config: TrainConfig, sample_shape=(320, 512),
                    per_device_batch: int = 2, steps: int = 8,
                    device_counts=None):
    """frames/s/device for each mesh size; returns dict size → metrics.

    `scaling efficiency(N)` = throughput_per_device(N) /
    throughput_per_device(1).
    """
    import time

    all_devices = jax.devices()
    if device_counts is None:
        device_counts = sorted({1, 2, len(all_devices)})
    device_counts = [n for n in device_counts if n <= len(all_devices)]

    results = {}
    base = None
    for n in device_counts:
        mesh = make_mesh(data=n, spatial=1, devices=all_devices[:n])
        gb = per_device_batch * n
        rng = np.random.RandomState(0)
        batch = {
            "left": rng.randn(gb, *sample_shape, 3).astype(np.float32),
            "right": rng.randn(gb, *sample_shape, 3).astype(np.float32),
            "gt_disp": np.abs(rng.randn(gb, *sample_shape) * 32).astype(
                np.float32),
        }
        state = init_train_state(model, config, batch, total_steps=100)
        step = make_train_step(model, config, mesh=mesh)
        sb = shard_batch(batch, mesh)

        state, loss = step(state, sb)  # compile
        sync = make_sync(loss)
        sync(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, sb)
        sync(loss)
        dt = (time.perf_counter() - t0) / steps
        fps_per_dev = gb / dt / n
        eff = 1.0 if base is None else fps_per_dev / base
        if base is None:
            base = fps_per_dev
        results[n] = {"step_time_s": dt, "frames_per_s_per_device":
                      fps_per_dev, "efficiency": eff}
        print(f"devices={n}: {dt*1e3:.1f} ms/step, "
              f"{fps_per_dev:.2f} frames/s/dev, eff {eff:.2%}", flush=True)
    return results
