"""Resume semantics and multi-dataset concatenation.

VERDICT r1 items 4 and 7: a killed run resumed from its checkpoint must
continue at the *next* epoch (reference trainer_torchrun.py:182-212 restores
start_epoch = ckpt['epoch'] + 1), and mixed training needs the reference's
ConcatDataset (tests/train_accelerate.py:97-107).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.datasets import ConcatDataset, DataLoader
from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
from stereo_toolbox_tpu.trainer import (TrainConfig, Trainer,
                                        init_train_state)
from stereo_toolbox_tpu.models import PSMNet
import pytest


def _loader(b=2, n=4):
    ds = SyntheticStereoDataset(num_samples=n, height=48, width=64,
                                max_disp=12, training=True,
                                crop_size=(32, 32))
    return DataLoader(ds, batch_size=b, num_workers=0)


@pytest.mark.slow
def test_kill_and_resume_continues_at_next_epoch(tmp_path):
    config = TrainConfig(lr=1e-4, max_disp=16, loss="multihead",
                         ckpt_dir=str(tmp_path), save_every=1, epochs=2,
                         log_every=1000)
    model = PSMNet(max_disp=16)
    loader = _loader()
    state = init_train_state(model, config, next(iter(loader)),
                             total_steps=8)

    trainer = Trainer(model, config)
    # "run" that dies after epoch 0 (checkpoint saved by save_every=1)
    state_after0 = trainer.train(state, loader, epochs=1)
    assert (tmp_path / "epoch_0000").exists()
    steps_after0 = int(state_after0.step)
    assert steps_after0 == len(loader)

    # fresh process: new state, restore, resume at epoch 1
    state2 = init_train_state(model, config, next(iter(loader)),
                              total_steps=8)
    state2, last_epoch = trainer.load_checkpoint(
        state2, str(tmp_path / "epoch_0000"))
    assert last_epoch == 0
    assert int(state2.step) == steps_after0  # step counter restored

    epochs_run = []
    orig_set_epoch = loader.set_epoch

    def spy(epoch):
        epochs_run.append(epoch)
        orig_set_epoch(epoch)

    loader.set_epoch = spy
    state2 = trainer.train(state2, loader, epochs=2,
                           start_epoch=last_epoch + 1)
    assert epochs_run == [1]  # does NOT re-run epoch 0
    assert int(state2.step) == 2 * len(loader)
    # epoch 1's checkpoint saved alongside (not overwriting) epoch 0's
    assert (tmp_path / "epoch_0001").exists()
    assert (tmp_path / "epoch_0000").exists()


def test_concat_dataset_indexing_and_epoch():
    a = SyntheticStereoDataset(num_samples=3, height=48, width=64,
                               max_disp=12, training=True,
                               crop_size=(32, 32), seed=1)
    b = SyntheticStereoDataset(num_samples=5, height=48, width=64,
                               max_disp=12, training=True,
                               crop_size=(32, 32), seed=2)
    cat = ConcatDataset([a, b])
    assert len(cat) == 8
    np.testing.assert_array_equal(cat[2]["left"], a[2]["left"])
    np.testing.assert_array_equal(cat[3]["left"], b[0]["left"])
    np.testing.assert_array_equal(cat[7]["left"], b[4]["left"])
    cat.set_epoch(5)
    assert a.epoch == 5 and b.epoch == 5

    loader = DataLoader(cat, batch_size=4, shuffle=True, num_workers=0,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["left"].shape == (4, 32, 32, 3)
