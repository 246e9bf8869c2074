"""Generate dataset manifests (file lists) from an on-disk dataset root.

The reference packages its manifests as txt files (3 space-separated relative
paths per line — left, right, disp; 2 columns when no GT;
reference datasets/utils.py:11-21). This repo does not vendor those lists;
this tool regenerates them from standard dataset layouts.

Usage:
  python tools/gen_manifests.py sceneflow /data/Scene_Flow --split test_finalpass
  python tools/gen_manifests.py kitti2015 /data/KITTI_2015 --split train_all
  python tools/gen_manifests.py generic /data/MySet --left left --right right \
      --disp disp --split train

Output goes to stereo_toolbox_tpu/datasets/lists/<name>/<split>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LISTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "stereo_toolbox_tpu", "datasets", "lists")


def write_manifest(name: str, split: str, rows: list[tuple]) -> str:
    out_dir = os.path.join(LISTS, name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{split}.txt")
    with open(path, "w") as f:
        for row in rows:
            f.write(" ".join(p for p in row if p is not None) + "\n")
    print(f"wrote {len(rows)} entries to {path}")
    return path


def scan_sceneflow(root: str, split: str) -> list[tuple]:
    """SceneFlow layout: frames_<pass>/**/left/*.png with disparity/**/
    left/*.pfm mirrored."""
    subset, pass_name = split.split("_")  # e.g. test, finalpass
    rows = []
    frames_dir = os.path.join(root, f"frames_{pass_name}")
    for dirpath, _, files in sorted(os.walk(frames_dir)):
        if os.path.basename(dirpath) != "left":
            continue
        for fn in sorted(files):
            if not fn.endswith(".png"):
                continue
            left = os.path.relpath(os.path.join(dirpath, fn), root)
            right = left.replace("/left/", "/right/")
            disp = left.replace(f"frames_{pass_name}", "disparity").replace(
                ".png", ".pfm")
            if os.path.exists(os.path.join(root, disp)):
                rows.append((left, right, disp))
    del subset
    return rows


def scan_kitti(root: str, split: str) -> list[tuple]:
    """KITTI layout: training/image_2 + image_3 + disp_occ_0 (2015) or
    colored_0/colored_1/disp_occ (2012)."""
    sub = "testing" if split == "test" else "training"
    img2 = os.path.join(root, sub, "image_2")
    if not os.path.isdir(img2):
        img2 = os.path.join(root, sub, "colored_0")
    rows = []
    for fn in sorted(os.listdir(img2)):
        if not fn.endswith("_10.png"):
            continue
        rel2 = os.path.relpath(os.path.join(img2, fn), root)
        rel3 = rel2.replace("image_2", "image_3").replace("colored_0",
                                                          "colored_1")
        disp = rel2.replace("image_2", "disp_occ_0").replace("colored_0",
                                                             "disp_occ")
        if split != "test" and os.path.exists(os.path.join(root, disp)):
            rows.append((rel2, rel3, disp))
        elif split == "test":
            rows.append((rel2, rel3))
    return rows


def scan_generic(root: str, left: str, right: str,
                 disp: str | None) -> list[tuple]:
    rows = []
    ldir = os.path.join(root, left)
    for dirpath, _, files in sorted(os.walk(ldir)):
        for fn in sorted(files):
            lp = os.path.relpath(os.path.join(dirpath, fn), root)
            rp = lp.replace(left, right, 1)
            if not os.path.exists(os.path.join(root, rp)):
                continue
            if disp:
                found = None
                for ext in (".pfm", ".png", ".npy"):
                    dp = os.path.splitext(lp.replace(left, disp, 1))[0] + ext
                    if os.path.exists(os.path.join(root, dp)):
                        found = dp
                        break
                rows.append((lp, rp, found) if found else (lp, rp))
            else:
                rows.append((lp, rp))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="sceneflow | kitti2015 | kitti2012 | "
                                    "generic | <lists-dir-name>")
    ap.add_argument("root")
    ap.add_argument("--split", required=True)
    ap.add_argument("--left", default="left")
    ap.add_argument("--right", default="right")
    ap.add_argument("--disp", default=None)
    ap.add_argument("--name", default=None,
                    help="lists subdir (defaults to dataset)")
    args = ap.parse_args()

    if args.dataset == "sceneflow":
        rows = scan_sceneflow(args.root, args.split)
    elif args.dataset in ("kitti2015", "kitti2012"):
        rows = scan_kitti(args.root, args.split)
    else:
        rows = scan_generic(args.root, args.left, args.right, args.disp)
    if not rows:
        raise SystemExit("no samples found — check the layout/paths")
    write_manifest(args.name or args.dataset, args.split, rows)


if __name__ == "__main__":
    main()
