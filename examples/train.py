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
                   help="dataset name, or a '+'-joined mix for multi-dataset "
                        "training (reference tests/train_accelerate.py:97-107"
                        "), e.g. sceneflow+sintel+hr_vs+crestereo")
    p.add_argument("--split", default=None,
                   help="split name; default: each dataset's train split")
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
    p.add_argument("--log-dir", default=None,
                   help="TensorBoard/JSONL scalar directory")
    p.add_argument("--loss", default=None,
                   choices=("sequence", "multihead", "selfsup"),
                   help="override the loss mode; 'selfsup' trains without "
                        "GT (photometric+smoothness+auto-mask, SURVEY §3.5)"
                        " — use with no-GT data such as --dataset holopix50k")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of one warm train step "
                        "into <log-dir>/profile")
    return p.parse_args()


# dataset key → (class name, default train split)
DATASETS = {
    "sceneflow": ("SceneFlow_Dataset", "train_finalpass"),
    "kitti2015": ("KITTI2015_Dataset", "train"),
    "kitti2012": ("KITTI2012_Dataset", "train"),
    "middleburyeval3": ("MiddleburyEval3_Dataset", "trainH"),
    "eth3d": ("ETH3D_Dataset", "train"),
    "drivingstereo": ("DrivingStereo_Dataset", "train_half"),
    "middlebury2021": ("Middlebury2021_Dataset", "train"),
    "sintel": ("Sintel_Dataset", "train_final"),
    "hr_vs": ("HR_VS_Dataset", "train"),
    "booster": ("Booster_Dataset", "train_balanced"),
    "instereo2k": ("InStereo2k_Dataset", "train"),
    "crestereo": ("CREStereo_Dataset", "train"),
    "argoverse": ("Argoverse_Dataset", "train"),
    "holopix50k": ("Holopix50k_Dataset", "train"),
    "fallingthings": ("FallingThings_Dataset", "train"),
    "virtualkitti2": ("VirtualKITTI2_Dataset", "train"),
}


def _build_one(name, args):
    from stereo_toolbox_tpu import datasets as D
    if name == "synthetic":
        return D.SyntheticStereoDataset(
            num_samples=64, height=args.crop[0] + 64,
            width=args.crop[1] + 64, max_disp=min(args.maxdisp, 96),
            training=True, crop_size=tuple(args.crop), seed=args.seed)
    if name not in DATASETS:
        raise SystemExit(f"unknown dataset {name!r}; have "
                         f"{['synthetic'] + sorted(DATASETS)}")
    cls_name, default_split = DATASETS[name]
    kw = {"crop_size": tuple(args.crop), "seed": args.seed}
    if args.root:
        kw["root_dir"] = args.root
    return getattr(D, cls_name)(args.split or default_split, training=True,
                                **kw)


def build_dataset(args):
    """Single dataset, or a '+'-joined ConcatDataset mix (the reference's
    SceneFlow+Sintel+HR-VS+CREStereo recipe, train_accelerate.py:97-107)."""
    from stereo_toolbox_tpu.datasets import ConcatDataset
    names = args.dataset.split("+")
    parts = [_build_one(n, args) for n in names]
    return parts[0] if len(parts) == 1 else ConcatDataset(parts)


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
        log_dir=args.log_dir,
        loss=args.loss or ("sequence" if iterative else "multihead"),
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

    from stereo_toolbox_tpu.trainer import make_optimizer
    _, lr_schedule = make_optimizer(config, total_steps)
    mesh = make_mesh(spatial=1)
    trainer = Trainer(model, config, mesh=mesh, lr_schedule=lr_schedule)

    if args.profile:
        # one warm step (compile outside the trace), then one traced step —
        # on a throwaway COPY of the state (train_step donates its input),
        # so profiling leaks no optimizer steps into the real trajectory
        from stereo_toolbox_tpu.utils.observability import profile_trace
        batch = {k: v for k, v in sample.items()
                 if k in ("left", "right", "gt_disp")}
        batch = shard_batch(batch, mesh)
        scratch = jax.tree_util.tree_map(jnp.copy, state)
        scratch, _ = trainer.train_step(scratch, batch)
        prof_dir = os.path.join(args.log_dir or "runs", "profile")
        with profile_trace(prof_dir):
            scratch, loss = trainer.train_step(scratch, batch)
            jax.block_until_ready(loss)
        del scratch
        print(f"profiler trace written to {prof_dir}")
    start_epoch = 0
    if args.resume:
        state, last_epoch = trainer.load_checkpoint(state, args.resume)
        start_epoch = last_epoch + 1
        print(f"resumed from {args.resume}: last completed epoch "
              f"{last_epoch}, continuing at {start_epoch}")

    print(f"training {args.model} on {args.dataset}: "
          f"{len(loader)} steps/epoch x {args.epochs} epochs on "
          f"{jax.device_count()} devices")
    trainer.train(state, loader, epochs=args.epochs,
                  start_epoch=start_epoch)


if __name__ == "__main__":
    main()
