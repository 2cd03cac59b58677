#!/usr/bin/env python
"""Visualize scenes / predictions as colored PLY files
(reference: ISBNet/tools/visualization.py + visualization/vis_scannetv2.py,
which use open3d/pyviz3d viewers — not available headless, so this exports
standard PLY point clouds any viewer opens).

Modes (--task): input_rgb | semantic_gt | instance_gt | instance_pred |
superpoint. instance_pred reads a benchmark-format export dir from
tools/test.py --out.

Example:
  python tools/visualization.py --synthetic 1 --task instance_gt --out vis/
  python tools/visualization.py --data_root dataset/scannetv2 --scene scene0011_00 \
      --task instance_pred --prediction_path preds/ --out vis/
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# fixed 20-color palette (ScanNet-style)
PALETTE = np.array([
    [174, 199, 232], [152, 223, 138], [31, 119, 180], [255, 187, 120],
    [188, 189, 34], [140, 86, 75], [255, 152, 150], [214, 39, 40],
    [197, 176, 213], [148, 103, 189], [196, 156, 148], [23, 190, 207],
    [247, 182, 210], [219, 219, 141], [255, 127, 14], [158, 218, 229],
    [44, 160, 44], [112, 128, 144], [227, 119, 194], [82, 84, 163],
], np.uint8)


def write_ply(path, xyz, rgb):
    """ASCII PLY writer (no deps). rgb uint8 [N,3]."""
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")


def color_by_ids(ids):
    ids = np.asarray(ids)
    rgb = np.full((len(ids), 3), 128, np.uint8)
    ok = ids >= 0
    rgb[ok] = PALETTE[ids[ok] % len(PALETTE)]
    return rgb


def main():
    ap = argparse.ArgumentParser("gapro_tpu visualization")
    ap.add_argument("--data_root", default="dataset/scannetv2")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--task", default="instance_gt",
                    choices=["input_rgb", "semantic_gt", "instance_gt",
                             "instance_pred", "superpoint"])
    ap.add_argument("--prediction_path", default=None)
    ap.add_argument("--conf_thresh", type=float, default=0.2)
    ap.add_argument("--out", default="vis")
    args = ap.parse_args()

    if args.synthetic:
        from gapro_tpu.data import make_synthetic_scene

        s = make_synthetic_scene(seed=args.synthetic - 1)
        xyz, rgb = s.xyz, s.rgb
        sem, inst, spp = s.semantic_label, s.instance_label, s.spp
        scan = f"synthetic{args.synthetic - 1:04d}"
    else:
        from gapro_tpu.data import scannet_io

        scan = args.scene
        xyz, rgb, sem, inst = scannet_io.load_scene(
            osp.join(args.data_root, "val", scan + "_inst_nostuff.pth"))
        spp = scannet_io.load_superpoints(
            osp.join(args.data_root, "superpoints", scan + ".pth"))

    if args.task == "input_rgb":
        colors = np.clip((rgb + 1) * 127.5, 0, 255).astype(np.uint8)
    elif args.task == "semantic_gt":
        colors = color_by_ids(sem)
    elif args.task == "instance_gt":
        colors = color_by_ids(np.where(inst >= 0, inst, -1))
    elif args.task == "superpoint":
        colors = color_by_ids(spp)
    else:  # instance_pred
        assert args.prediction_path, "--prediction_path required"
        ids = np.full(len(xyz), -1, np.int64)
        with open(osp.join(args.prediction_path, scan + ".txt")) as f:
            lines = [ln.split() for ln in f.read().splitlines() if ln]
        k = 0
        for rel, _label, conf in lines:
            if float(conf) < args.conf_thresh:
                continue
            mask = np.loadtxt(osp.join(args.prediction_path, rel)).astype(bool)
            ids[mask] = k
            k += 1
        colors = color_by_ids(ids)

    out_path = osp.join(args.out, f"{scan}_{args.task}.ply")
    write_ply(out_path, xyz, colors)
    print("wrote", out_path, f"({len(xyz)} points)")


if __name__ == "__main__":
    main()
