"""Training entry point — the reference's launcher scripts, TPU-style.

The reference ships two launchers (tests/train_torchrun.py for torchrun+DDP,
tests/train_accelerate.py for HF Accelerate); on TPU one script covers both
roles: `jax.distributed.initialize()` discovers the pod slice, the Mesh spans
every chip, and GSPMD handles the gradient all-reduce over ICI. Multi-host
launch is just running this same script on every host.

Examples:
  # single host, synthetic data smoke run
  python examples/train.py --model PSMNet --dataset synthetic --epochs 1

  # SceneFlow (manifests generated via tools/gen_manifests.py)
  python examples/train.py --model IGEVStereo --dataset sceneflow \
      --root /data/Scene_Flow --batch-size 8 --epochs 20 --bf16

Reference parity for defaults: lr 2e-4, batch 8, maxdisp 192, clip 1.0,
OneCycle linear schedule with pct_start 0.1 (tests/train_torchrun.py:23-37,
:57-65).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="IGEVStereo")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "sceneflow", "kitti2015",
                            "kitti2012"])
    p.add_argument("--split", default="train_finalpass")
    p.add_argument("--root", default=None)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--crop", type=int, nargs=2, default=(320, 512))
    p.add_argument("--clip-grad", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (the TPU analogue of --amp)")
    p.add_argument("--resume", default=None)
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--save-every", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=16)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    return p.parse_args()


def build_dataset(args):
    from stereo_toolbox_tpu import datasets as D
    if args.dataset == "synthetic":
        return D.SyntheticStereoDataset(
            num_samples=64, height=args.crop[0] + 64,
            width=args.crop[1] + 64, max_disp=min(args.maxdisp, 96),
            training=True, crop_size=tuple(args.crop), seed=args.seed)
    cls = {"sceneflow": D.SceneFlow_Dataset,
           "kitti2015": D.KITTI2015_Dataset,
           "kitti2012": D.KITTI2012_Dataset}[args.dataset]
    kw = {"crop_size": tuple(args.crop), "seed": args.seed}
    if args.root:
        kw["root_dir"] = args.root
    return cls(args.split, training=True, **kw)


def main():
    args = parse_args()
    if args.distributed:
        import jax
        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp

    from stereo_toolbox_tpu.datasets import DataLoader
    from stereo_toolbox_tpu.models import create_model
    from stereo_toolbox_tpu.parallel import make_mesh, shard_batch
    from stereo_toolbox_tpu.trainer import (TrainConfig, Trainer,
                                            init_train_state)

    dtype = jnp.bfloat16 if args.bf16 else None
    model_kw = {"dtype": dtype}
    if args.model not in ("RAFTStereo", "SelectiveRAFT"):
        model_kw["max_disp"] = args.maxdisp
    model = create_model(args.model, **model_kw)

    iterative = args.model in ("RAFTStereo", "IGEVStereo", "SelectiveRAFT",
                               "SelectiveIGEV")
    config = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        clip_grad=args.clip_grad, max_disp=args.maxdisp, seed=args.seed,
        ckpt_dir=args.ckpt_dir, save_every=args.save_every,
        loss="sequence" if iterative else "multihead",
        loss_weights={"PSMNet": (0.5, 0.7, 1.0),
                      "ACVNet": (0.5, 0.5, 0.7, 1.0)}.get(
                          args.model, (0.5, 0.5, 0.7, 1.0)))

    dataset = build_dataset(args)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed, drop_last=True,
                        num_workers=args.num_workers,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    total_steps = len(loader) * args.epochs

    sample = next(iter(loader))
    state = init_train_state(model, config, sample, total_steps)

    mesh = make_mesh(spatial=1)
    trainer = Trainer(model, config, mesh=mesh)
    start_epoch = 0
    if args.resume:
        state, start_epoch = trainer.load_checkpoint(state, args.resume)
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    print(f"training {args.model} on {args.dataset}: "
          f"{len(loader)} steps/epoch x {args.epochs} epochs on "
          f"{jax.device_count()} devices")
    trainer.train(state, loader, epochs=args.epochs)


if __name__ == "__main__":
    main()
