"""Train PSMNet on deterministic synthetic data and gate its eval metrics.

The first in-tree accuracy artifact (round-2 verdict item 3): a short,
fully-seeded CPU training run whose SceneFlow-protocol eval metrics are
committed as `GOLDEN_METRICS.json`. Re-running this script reproduces the
run bit-for-bit (XLA CPU is deterministic, the synthetic dataset is
seed-indexed) and `evaluation._write_back` ASSERTS on drift beyond 1e-3 —
the regression-gate role of the reference's checkpoint metric write-back
(evaluation/sceneflow_test.py:49-56), made fail-capable.

The recipe is deterministic PER CODE VERSION: any change to the model's
compute graph (even fp-reassociation-level, e.g. a conv lowering swap)
diverges training chaotically over the run — when the gate fires after an
intentional change, delete the affected keys and rerun this script to
re-record them.

Usage: python tools/train_golden.py  [--steps 120] [--model raft_stereo]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# match tests/conftest.py exactly — the XLA CPU topology (virtual device
# count) changes reduction partitioning and therefore the fp-exact
# trajectory; goldens are only reproducible under one fixed topology
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "GOLDEN_METRICS.json")


def run(steps: int = 120, write_json: str = GOLDEN, model_name="psmnet"):
    import numpy as np
    from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
    from stereo_toolbox_tpu.datasets.loader import DataLoader
    from stereo_toolbox_tpu.evaluation import make_apply, sceneflow_test
    from stereo_toolbox_tpu.models import PSMNet, RAFTStereo
    from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                            make_train_step)

    if model_name == "raft_stereo":
        # sequence (RAFT-weighted) loss; short recurrence for CPU runtime
        config = TrainConfig(lr=2e-3, max_disp=48, loss="sequence",
                             clip_grad=1.0)
        model = RAFTStereo(train_iters=4, valid_iters=4)
    elif model_name == "raft_stereo_reg":
        # diagnostic twin of the raft_stereo recipe with the uncapped
        # full-pyramid correlation — run to confirm whether a banded-vs-reg
        # golden gap is trajectory noise or a systematic training change
        # (round-4 advisor item 2); not part of the committed goldens
        config = TrainConfig(lr=2e-3, max_disp=48, loss="sequence",
                             clip_grad=1.0)
        model = RAFTStereo(train_iters=4, valid_iters=4, corr_impl="reg")
    elif model_name == "igev_stereo":
        # third artifact (round-3 verdict item 9): an nn.scan model whose
        # full train loop (GEV trunk + banded lookups + GRU scan +
        # superpixel upsample) sits under the regression gate
        from stereo_toolbox_tpu.models import IGEVStereo
        # max_disp=64 → D/4=16, even through all three hourglass scales
        config = TrainConfig(lr=2e-3, max_disp=64, loss="sequence",
                             clip_grad=1.0)
        model = IGEVStereo(max_disp=64, train_iters=4, valid_iters=4)
    elif model_name == "monster":
        # fourth artifact (round-4 verdict item 8): the dual-branch
        # stereo+mono fusion path (frozen DAv2-vits trunk, mix GRUs, REMP)
        from stereo_toolbox_tpu.models import MODEL_REGISTRY
        config = TrainConfig(lr=2e-3, max_disp=32, loss="sequence",
                             clip_grad=1.0)
        model = MODEL_REGISTRY["MonSter"](
            encoder="vits", max_disp=32, train_iters=3, valid_iters=3,
            mix_iters=2)
    elif model_name == "psmnet_selfsup":
        # fifth artifact (round-4 verdict item 9): the self-supervised
        # photometric path (losses/__init__.py selfsup_sequence_loss) —
        # trained WITHOUT ground truth, evaluated against it
        config = TrainConfig(lr=2e-3, max_disp=48, loss="selfsup",
                             clip_grad=1.0)
        model = PSMNet(max_disp=48)
    else:
        config = TrainConfig(lr=2e-3, max_disp=48, loss="multihead",
                             clip_grad=1.0)
        model = PSMNet(max_disp=48)

    train_ds = SyntheticStereoDataset(num_samples=16, height=80, width=112,
                                      max_disp=24, training=True,
                                      crop_size=(64, 96), seed=0)
    loader = DataLoader(train_ds, batch_size=2, num_workers=0, seed=0)

    batch0 = next(iter(loader))
    state = init_train_state(model, config, batch0, total_steps=steps)
    step = make_train_step(model, config)

    it = 0
    first = last = None
    while it < steps:
        for batch in loader:
            if it >= steps:
                break
            state, loss = step(state, batch)
            if it == 0:
                first = float(loss)
            last = float(loss)
            if it % 20 == 0:
                print(f"step {it}: loss {float(loss):.3f}", flush=True)
            it += 1
    print(f"loss {first:.3f} -> {last:.3f} over {steps} steps", flush=True)
    # the photometric selfsup loss starts low (images are similar) and
    # improves more modestly than supervised losses
    factor = 0.9 if model_name == "psmnet_selfsup" else 0.5
    assert last < first * factor, "training failed to reduce the loss"

    val_ds = SyntheticStereoDataset(num_samples=8, height=96, width=128,
                                    max_disp=24, training=False, seed=100)
    val_loader = DataLoader(val_ds, batch_size=1, num_workers=0,
                            shuffle=False)
    apply_fn = make_apply(model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics = sceneflow_test(apply_fn, variables, val_loader,
                             maxdisp=config.max_disp,
                             write_json=write_json,
                             write_key=(
                                 f"synthetic_sceneflow_protocol_{steps}steps"
                                 if model_name == "psmnet" else
                                 f"{model_name}_synthetic_sceneflow_"
                                 f"protocol_{steps}steps"))
    print("eval:", metrics, flush=True)
    return metrics


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--out", default=GOLDEN)
    ap.add_argument("--model", default="psmnet",
                    choices=["psmnet", "raft_stereo", "raft_stereo_reg",
                             "igev_stereo", "monster", "psmnet_selfsup"])
    a = ap.parse_args()
    run(a.steps, a.out, a.model)
