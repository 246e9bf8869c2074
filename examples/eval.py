"""Evaluation entry point — the reference's evaluation workflow as a CLI.

Runs any zoo model through the evaluation suites
(`stereo_toolbox_tpu.evaluation`), optionally starting from a PUBLISHED
REFERENCE (PyTorch) CHECKPOINT converted on the fly — the migration story:

    # reference checkpoint → SceneFlow finalpass EPE/outliers on TPU
    python examples/eval.py --model RAFTStereo --torch-ckpt raftstereo.pth \
        --suite sceneflow --root /data/Scene_Flow

    # generalization (KITTI15/12 + MiddEval3 + ETH3D training sets)
    python examples/eval.py --model IGEVStereo --torch-ckpt igev.pth \
        --suite generalization --root /data

    # speed/memory protocol (no data needed)
    python examples/eval.py --model PSMNet --suite speed

Covers reference evaluation/sceneflow_test.py, generalization_eval.py,
drivingstereo_weather_test.py and speed_and_memory_test.py; `--write-json`
enables the (fail-capable) metric write-back regression gate.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variables(args, model, jax, jnp):
    key = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, 96, 160, 3), jnp.float32)
    if args.torch_ckpt:
        from stereo_toolbox_tpu.utils.torch_import import (
            import_torch_checkpoint)
        variables = import_torch_checkpoint(args.model, args.torch_ckpt)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        print(f"imported reference checkpoint {args.torch_ckpt}")
        if args.dav2_ckpt:
            from stereo_toolbox_tpu.utils.torch_import import graft_dav2_trunk
            variables, skipped = graft_dav2_trunk(args.model, variables,
                                                  args.dav2_ckpt)
            print(f"grafted DAv2 trunk ({len(skipped)} unused head leaves)")
        return variables
    variables = jax.jit(model.init, static_argnames="train")(
        key, probe, probe, train=False)
    if args.ckpt:
        # trainer checkpoints are orbax PyTrees
        # {step, params, batch_stats, opt_state, epoch}
        import orbax.checkpoint as ocp
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.ckpt))
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        print(f"loaded checkpoint {args.ckpt}")
    if args.dav2_ckpt:
        from stereo_toolbox_tpu.utils.torch_import import graft_dav2_trunk
        variables, skipped = graft_dav2_trunk(args.model, variables,
                                              args.dav2_ckpt)
        print(f"grafted DAv2 trunk ({len(skipped)} unused head leaves)")
    return variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="PSMNet")
    ap.add_argument("--suite", default="sceneflow",
                    choices=["sceneflow", "generalization", "weather",
                             "speed"])
    ap.add_argument("--root", default=None,
                    help="dataset root (per-dataset subdirs for "
                         "generalization)")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference (PyTorch) checkpoint to convert")
    ap.add_argument("--dav2-ckpt", default=None,
                    help="DepthAnythingV2 torch checkpoint to graft into a "
                         "foundation-tier model")
    ap.add_argument("--max-disp", type=int, default=192)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--write-json", default=None,
                    help="metrics JSON for the write-back regression gate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stereo_toolbox_tpu import evaluation
    from stereo_toolbox_tpu.datasets.loader import DataLoader
    from stereo_toolbox_tpu.models import create_model

    kwargs = {"max_disp": args.max_disp} if args.model in (
        "PSMNet", "GwcNet_G", "GwcNet_GC", "ACVNet", "CFNet", "PCWNet_G",
        "PCWNet_GC", "IGEVStereo", "SelectiveIGEV") else {}
    if args.bf16:
        kwargs["dtype"] = jnp.bfloat16
    model = create_model(args.model, **kwargs)
    variables = build_variables(args, model, jax, jnp)
    apply_fn = evaluation.make_apply(model)

    if args.suite == "speed":
        evaluation.speed_and_memory_test(apply_fn, variables)
        return

    if args.root is None:
        ap.error(f"--root is required for the data-driven "
                 f"'{args.suite}' suite (dataset root directory)")

    from stereo_toolbox_tpu.datasets import zoo

    def loader(ds):
        return DataLoader(ds, batch_size=1, num_workers=2, shuffle=False)

    if args.suite == "sceneflow":
        ds = zoo.SceneFlow_Dataset("test_finalpass", training=False,
                                  root_dir=args.root)
        evaluation.sceneflow_test(apply_fn, variables, loader(ds),
                                  maxdisp=args.max_disp,
                                  write_json=args.write_json)
    elif args.suite == "generalization":
        loaders = {
            "kitti2015": loader(zoo.KITTI2015_Dataset(
                "train", training=False,
                root_dir=os.path.join(args.root, "KITTI_2015"))),
            "kitti2012": loader(zoo.KITTI2012_Dataset(
                "train", training=False,
                root_dir=os.path.join(args.root, "KITTI_2012"))),
            "middeval3": loader(zoo.MiddleburyEval3_Dataset(
                "trainH", training=False,
                root_dir=os.path.join(args.root, "MiddEval3"))),
            "eth3d": loader(zoo.ETH3D_Dataset(
                "train", training=False,
                root_dir=os.path.join(args.root, "ETH3D"))),
        }
        evaluation.generalization_eval(apply_fn, variables, loaders,
                                       write_json=args.write_json)
    elif args.suite == "weather":
        loaders = {
            cond: loader(zoo.DrivingStereo_Dataset(
                f"test_half_{cond}", training=False, root_dir=args.root))
            for cond in ("sunny", "cloudy", "rainy", "foggy")
        }
        evaluation.drivingstereo_weather_test(apply_fn, variables, loaders,
                                              write_json=args.write_json)


if __name__ == "__main__":
    main()
