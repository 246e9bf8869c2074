"""Measure the single-chip PSMNet train-step time at the reference's
384×512 training crop — the compute-side denominator for the collective
fraction bound in SCALING.md (tools/collective_overhead.py).

Usage: python tools/train_step_time.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(batch: int = 2):
    import jax.numpy as jnp
    from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
    from stereo_toolbox_tpu.datasets.loader import DataLoader
    from stereo_toolbox_tpu.models import PSMNet
    from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                            make_train_step)
    from stereo_toolbox_tpu.utils.timing import bench_fn

    config = TrainConfig(lr=1e-3, max_disp=192, loss="multihead")
    model = PSMNet(max_disp=192, dtype=jnp.bfloat16)
    ds = SyntheticStereoDataset(num_samples=batch, height=400, width=528,
                                max_disp=96, training=True,
                                crop_size=(384, 512), seed=0)
    loader = DataLoader(ds, batch_size=batch, num_workers=0, seed=0)
    b = next(iter(loader))
    state = init_train_state(model, config, b, total_steps=10)
    step = make_train_step(model, config)

    # the train step donates its state; copy inside the jit so repeated
    # same-argument timing calls don't re-donate the same buffers
    timed = jax.jit(lambda s, bb: step(
        jax.tree_util.tree_map(jnp.copy, s), bb)[1])
    dt = bench_fn(timed, (state, b), n1=3, n2=9)
    print(f"PSMNet train step, 384x512 crop, batch {batch}: "
          f"{dt * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
