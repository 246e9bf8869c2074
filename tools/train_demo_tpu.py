"""End-to-end training demo on the real chip: PSMNet on synthetic data.
Verifies the full trainer stack (loader -> sharded step -> loss drop) on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from stereo_toolbox_tpu.datasets import SyntheticStereoDataset, DataLoader
from stereo_toolbox_tpu.models import PSMNet
from stereo_toolbox_tpu.trainer import TrainConfig, init_train_state, make_train_step
from stereo_toolbox_tpu.utils.timing import make_sync

config = TrainConfig(lr=3e-4, max_disp=64, loss="multihead",
                     loss_weights=(0.5, 0.7, 1.0), clip_grad=1.0)
model = PSMNet(max_disp=64, dtype=jnp.bfloat16)
ds = SyntheticStereoDataset(num_samples=16, height=320, width=448,
                            max_disp=48, training=True, crop_size=(256, 384))
loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=4,
                    drop_last=True)
batch0 = next(iter(loader))
state = init_train_state(model, config, batch0, total_steps=60)
step = make_train_step(model, config)
print("compiled? running 24 steps...", flush=True)
losses = []
t0 = time.time()
sync = None
for epoch in range(3):
    loader.set_epoch(epoch)
    for batch in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ("left", "right", "gt_disp")}
        state, loss = step(state, jb)
        if sync is None:
            sync = make_sync(loss)
        losses.append(sync(loss))
        print(f"step {len(losses)}: loss {losses[-1]:.4f}", flush=True)
print(f"total {time.time()-t0:.1f}s; first {losses[0]:.3f} -> last {losses[-1]:.3f}", flush=True)
assert losses[-1] < losses[0] * 0.8, "loss did not drop"
print("TRAIN DEMO OK", flush=True)
