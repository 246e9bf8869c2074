"""Generate dataset manifests (file lists) from an on-disk dataset root.

The reference packages its manifests as txt files (3 space-separated relative
paths per line — left, right, disp; 2 columns when no GT;
reference datasets/utils.py:11-21). This repo vendors the reference's curated
lists in `stereo_toolbox_tpu/datasets/lists/`; this tool regenerates the
scan-derivable ones (notably the large SceneFlow / CREStereo / FallingThings /
DrivingStereo train lists the reference strips from its sdist) from standard
on-disk layouts.

Usage:
  python tools/gen_manifests.py sceneflow /data/Scene_Flow --split train_finalpass
  python tools/gen_manifests.py kitti2015 /data/KITTI_2015 --split train_all
  python tools/gen_manifests.py crestereo /data/CREStereo --split train
  python tools/gen_manifests.py drivingstereo /data/DrivingStereo --split train_half
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


def _walk_files(root: str, subdir: str, exts: tuple[str, ...]):
    """Yield paths (relative to root) of files under root/subdir with ext."""
    base = os.path.join(root, subdir)
    for dirpath, _, files in sorted(os.walk(base)):
        for fn in sorted(files):
            if fn.endswith(exts):
                yield os.path.relpath(os.path.join(dirpath, fn), root)


def scan_sceneflow(root: str, split: str) -> list[tuple]:
    """SceneFlow: frames_<pass>/**/left/*.png, disparity mirrored under
    frames_disparity/ (vendored test lists) or disparity/ (official layout)."""
    _, pass_name = split.split("_")  # e.g. train, finalpass
    rows = []
    frames_dir = os.path.join(root, f"frames_{pass_name}")
    disp_roots = ["frames_disparity", "disparity"]
    for dirpath, _, files in sorted(os.walk(frames_dir)):
        if os.path.basename(dirpath) != "left":
            continue
        for fn in sorted(files):
            if not fn.endswith(".png"):
                continue
            left = os.path.relpath(os.path.join(dirpath, fn), root)
            right = left.replace("/left/", "/right/")
            for dr in disp_roots:
                disp = left.replace(f"frames_{pass_name}", dr).replace(
                    ".png", ".pfm")
                if os.path.exists(os.path.join(root, disp)):
                    rows.append((left, right, disp))
                    break
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


def scan_crestereo(root: str) -> list[tuple]:
    """CREStereo synthetic set: <subset>/<id>_left.jpg / _right.jpg /
    _left.disp.png (reference datasets/crestereo.py decode ÷32)."""
    rows = []
    for left in _walk_files(root, ".", ("_left.jpg",)):
        right = left[:-len("_left.jpg")] + "_right.jpg"
        disp = left[:-len("_left.jpg")] + "_left.disp.png"
        if os.path.exists(os.path.join(root, right)) and \
                os.path.exists(os.path.join(root, disp)):
            rows.append((left, right, disp))
    return rows


def scan_fallingthings(root: str) -> list[tuple]:
    """FallingThings: **/<frame>.left.jpg / .right.jpg / .left.depth.png
    (depth decodes to disp = 768.16*6*100/depth, reference
    datasets/fallingthings.py:54-60)."""
    rows = []
    for left in _walk_files(root, ".", (".left.jpg",)):
        stem = left[:-len(".left.jpg")]
        right, depth = stem + ".right.jpg", stem + ".left.depth.png"
        if os.path.exists(os.path.join(root, right)) and \
                os.path.exists(os.path.join(root, depth)):
            rows.append((left, right, depth))
    return rows


def scan_drivingstereo(root: str, split: str) -> list[tuple]:
    """DrivingStereo. Weather splits use
    <weather>/{left,right}-image-half-size + disparity-map-half-size
    (vendored test lists); the plain train/test splits use the official
    train-left-image / train-right-image / train-disparity-map tree (flat or
    date-subfoldered), half or full size by suffix."""
    if any(w in split for w in ("sunny", "cloudy", "rainy", "foggy")):
        weather = split.rsplit("_", 1)[1]
        size = "half" if "half" in split else "full"
        ldir = f"{weather}/left-image-{size}-size"
        rows = []
        for left in _walk_files(root, ldir, (".jpg", ".png")):
            right = left.replace("left-image", "right-image")
            disp = os.path.splitext(
                left.replace(f"left-image-{size}-size",
                             f"disparity-map-{size}-size"))[0] + ".png"
            if os.path.exists(os.path.join(root, disp)):
                rows.append((left, right, disp))
        return rows
    sub = "train" if split.startswith("train") else "test"
    rows = []
    for left in _walk_files(root, f"{sub}-left-image", (".jpg", ".png")):
        right = left.replace("left-image", "right-image")
        disp = os.path.splitext(
            left.replace("left-image", "disparity-map"))[0] + ".png"
        if os.path.exists(os.path.join(root, right)) and \
                os.path.exists(os.path.join(root, disp)):
            rows.append((left, right, disp))
    return rows


def scan_virtualkitti2(root: str) -> list[tuple]:
    """VirtualKITTI2: Scene*/<variation>/frames/rgb/Camera_0|1/rgb_*.jpg with
    depth/Camera_0/depth_*.png (vendored list format)."""
    rows = []
    for left in _walk_files(root, ".", (".jpg",)):
        if "/rgb/Camera_0/" not in left.replace(os.sep, "/"):
            continue
        right = left.replace("Camera_0", "Camera_1")
        depth = left.replace("/rgb/", "/depth/").replace(
            "rgb_", "depth_").replace(".jpg", ".png")
        if os.path.exists(os.path.join(root, right)) and \
                os.path.exists(os.path.join(root, depth)):
            rows.append((left, right, depth))
    return rows


def scan_instereo2k(root: str, split: str) -> list[tuple]:
    """InStereo2k: <split>/part*/<id>/{left,right,left_disp}.png."""
    rows = []
    for left in _walk_files(root, split, ("left.png",)):
        if not left.replace(os.sep, "/").endswith("/left.png"):
            continue
        stem = left[:-len("left.png")]
        rows.append((left, stem + "right.png", stem + "left_disp.png"))
    return [r for r in rows
            if all(os.path.exists(os.path.join(root, p)) for p in r)]


def scan_holopix50k(root: str, split: str) -> list[tuple]:
    """Holopix50k: <split>/left/*_left.jpg + right/*_right.jpg, no GT."""
    rows = []
    for left in _walk_files(root, f"{split}/left", ("_left.jpg",)):
        right = left.replace("/left/", "/right/").replace(
            "_left.jpg", "_right.jpg")
        if os.path.exists(os.path.join(root, right)):
            rows.append((left, right))
    return rows


def scan_sintel(root: str, split: str) -> list[tuple]:
    """Sintel: training/<pass>_left/<scene>/frame_*.png with disparities/
    (vendored list format)."""
    pass_name = split.split("_")[1]  # clean | final
    rows = []
    for left in _walk_files(root, f"training/{pass_name}_left", (".png",)):
        right = left.replace(f"{pass_name}_left", f"{pass_name}_right")
        disp = left.replace(f"{pass_name}_left", "disparities")
        if os.path.exists(os.path.join(root, right)) and \
                os.path.exists(os.path.join(root, disp)):
            rows.append((left, right, disp))
    return rows


def scan_hr_vs(root: str) -> list[tuple]:
    """HR-VS: trainingF/<scene>/{im0,im1}.png + disp0GT.pfm."""
    rows = []
    for left in _walk_files(root, "trainingF", ("im0.png",)):
        stem = left[:-len("im0.png")]
        rows.append((left, stem + "im1.png", stem + "disp0GT.pfm"))
    return [r for r in rows
            if all(os.path.exists(os.path.join(root, p)) for p in r)]


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
    ap.add_argument("dataset",
                    help="sceneflow | kitti2015 | kitti2012 | crestereo | "
                         "fallingthings | drivingstereo | virtualkitti2 | "
                         "instereo2k | holopix50k | sintel | hr_vs | "
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
    elif args.dataset == "crestereo":
        rows = scan_crestereo(args.root)
    elif args.dataset == "fallingthings":
        rows = scan_fallingthings(args.root)
    elif args.dataset == "drivingstereo":
        rows = scan_drivingstereo(args.root, args.split)
    elif args.dataset == "virtualkitti2":
        rows = scan_virtualkitti2(args.root)
    elif args.dataset == "instereo2k":
        rows = scan_instereo2k(args.root, args.split)
    elif args.dataset == "holopix50k":
        rows = scan_holopix50k(args.root, args.split)
    elif args.dataset == "sintel":
        rows = scan_sintel(args.root, args.split)
    elif args.dataset == "hr_vs":
        rows = scan_hr_vs(args.root)
    else:
        rows = scan_generic(args.root, args.left, args.right, args.disp)
    if not rows:
        raise SystemExit("no samples found — check the layout/paths")
    write_manifest(args.name or args.dataset, args.split, rows)


if __name__ == "__main__":
    main()
