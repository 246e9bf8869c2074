"""Trainer tests: optimization actually reduces the loss; checkpoint
round-trips; the sharded train step compiles and runs on an 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-model compiles dominate CPU runtime; deselect with -m 'not slow'
pytestmark = pytest.mark.slow

from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
from stereo_toolbox_tpu.datasets.loader import DataLoader
from stereo_toolbox_tpu.models import PSMNet
from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                        make_train_step, make_optimizer)
from stereo_toolbox_tpu.parallel import make_mesh, shard_batch


def _batch(b=2, h=48, w=64):
    ds = SyntheticStereoDataset(num_samples=b, height=h + 16, width=w + 32,
                                max_disp=12, training=True, crop_size=(h, w))
    loader = DataLoader(ds, batch_size=b, num_workers=0)
    return next(iter(loader))


def test_loss_decreases_on_overfit():
    config = TrainConfig(lr=1e-3, max_disp=16, loss="multihead",
                         clip_grad=1.0)
    model = PSMNet(max_disp=16)
    batch = _batch()
    state = init_train_state(model, config, batch, total_steps=30)
    step = make_train_step(model, config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k in ("left", "right", "gt_disp")}
    losses = []
    for _ in range(12):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_schedule_shape():
    config = TrainConfig(lr=1e-3, pct_start=0.1)
    _, sched = make_optimizer(config, 100)
    lrs = [float(sched(s)) for s in (0, 10, 50, 99)]
    assert lrs[0] == pytest.approx(1e-3 / 25, rel=1e-3)
    assert lrs[1] == pytest.approx(1e-3, rel=1e-3)
    assert lrs[2] < lrs[1] and lrs[3] < lrs[2]


def test_sharded_train_step_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8, spatial=1)
    config = TrainConfig(lr=1e-4, max_disp=16, loss="multihead")
    model = PSMNet(max_disp=16)
    batch = _batch(b=8, h=32, w=32)
    state = init_train_state(model, config, batch, total_steps=10)
    step = make_train_step(model, config, mesh=mesh)
    jb = shard_batch({k: v for k, v in batch.items()
                      if k in ("left", "right", "gt_disp")}, mesh)
    state, loss = step(state, jb)
    assert np.isfinite(float(loss))
    state, loss2 = step(state, jb)
    assert np.isfinite(float(loss2))


def test_checkpoint_roundtrip(tmp_path):
    from stereo_toolbox_tpu.trainer import Trainer
    config = TrainConfig(lr=1e-4, max_disp=16, ckpt_dir=str(tmp_path),
                         loss="multihead")
    model = PSMNet(max_disp=16)
    batch = _batch()
    state = init_train_state(model, config, batch, total_steps=10)
    trainer = Trainer(model, config)
    trainer.save_checkpoint(state, epoch=3)
    state2, epoch = trainer.load_checkpoint(
        state, str(tmp_path / "epoch_0003"))
    assert epoch == 3
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scaling_harness_tiny():
    """Weak-scaling harness runs on the CPU mesh and reports efficiency."""
    from stereo_toolbox_tpu.evaluation.scaling import measure_scaling
    from stereo_toolbox_tpu.models import PSMNet
    config = TrainConfig(lr=1e-4, max_disp=16, loss="multihead")
    res = measure_scaling(PSMNet(max_disp=16), config,
                          sample_shape=(32, 32), per_device_batch=1,
                          steps=2, device_counts=[1, 2])
    assert set(res) == {1, 2}
    assert res[2]["efficiency"] > 0


def test_find_unused_parameters():
    from stereo_toolbox_tpu.utils.find_unused_parameters import \
        find_unused_parameters
    import flax.linen as fnn

    class Toy(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            used = fnn.Dense(4, name="used")(x)
            _dead = fnn.Dense(4, name="dead")(x)
            return used.sum()

    m = Toy()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    unused = find_unused_parameters(
        lambda p: m.apply({"params": p}, jnp.ones((1, 3))), v["params"])
    assert any("dead" in u for u in unused)
    assert not any("used/" in u and "kernel" in u for u in unused)


def test_selfsup_no_gt_training_improves_photometric():
    """round-3 verdict item 6: a no-GT batch trains end-to-end with
    loss='selfsup' — finite loss, and the photometric reconstruction
    error of the prediction decreases over the run."""
    from stereo_toolbox_tpu import losses

    # structured stereo pair with a constant 4-px shift and NO gt_disp key
    rng = np.random.RandomState(7)
    base = rng.rand(1, 48, 80, 3).astype(np.float32)
    for ax, k in ((1, 9), (2, 9)):  # smooth it so photometric loss is sane
        kernel = np.ones(k) / k
        base = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), ax, base)
    d = 4
    left = base[:, :, d:64 + d]
    right = base[:, :, :64]
    mean = np.array(losses.IMAGENET_MEAN, np.float32)
    std = np.array(losses.IMAGENET_STD, np.float32)
    batch = {"left": jnp.asarray((left - mean) / std),
             "right": jnp.asarray((right - mean) / std)}

    config = TrainConfig(lr=1e-3, max_disp=16, loss="selfsup",
                         smooth_weight=0.05, clip_grad=1.0)
    model = PSMNet(max_disp=16)
    state = init_train_state(
        model, config, {"left": batch["left"], "right": batch["right"]},
        total_steps=40)
    step = make_train_step(model, config)

    def photo_err(params, stats):
        pred = model.apply({"params": params, "batch_stats": stats},
                           batch["left"], batch["right"], train=False)
        lo = jnp.asarray(left)
        ro = jnp.asarray(right)
        return float(losses.photometric_loss(lo, ro, pred).mean())

    err0 = photo_err(state.params, state.batch_stats)
    seen = []
    for _ in range(15):
        state, loss = step(state, batch)
        seen.append(float(loss))
    assert np.isfinite(seen).all(), seen
    err1 = photo_err(state.params, state.batch_stats)
    assert err1 < err0, (err0, err1)
