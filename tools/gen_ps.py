#!/usr/bin/env python
"""Generate GP pseudo-labels from box annotations (reference: gapro/gen_ps.py).

Real-data mode walks `--data_root/{train,val}` for `*_inst_nostuff.pth`
scenes, derives boxes from GT instances, adds wall boxes from
`scannet_planes`, runs the batched TPU GP labeler, and saves the
(sem, inst, prob, mu, var) 5-tuple per scene.  Resumable: existing outputs
are skipped (reference gen_ps.py:40-41).

`--synthetic N` fabricates N rooms instead (no dataset ships with this
machine) and reports pseudo-label mIoU against the synthetic GT — the same
metric the reference's `--eval_pslabel` computes.
"""

import argparse
import os
import os.path as osp
import sys
import time
from glob import glob

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gapro_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

from gapro_tpu.eval import pseudo_label_miou_scene  # noqa: E402
from gapro_tpu.labeler import (  # noqa: E402
    LabelerConfig,
    generate_scene_labels,
    instance_info,
    wall_boxes_from_planes,
)


def run_scene(xyz, rgb, sem_gt, inst_gt, spp, cfg, wall=None, mask_feats=None):
    info = instance_info(xyz, inst_gt, sem_gt, with_corners=False)
    if info is None:
        return None
    _, cls, boxes, vols, _ = info
    wall_box, wall_vol = (None, None)
    if wall is not None:
        _, wall_box, wall_vol = wall
    feats = mask_feats if mask_feats is not None else np.concatenate([xyz, rgb], axis=1)
    return generate_scene_labels(
        xyz, feats, spp, cls, boxes, vols, wall_box=wall_box, wall_box_volume=wall_vol, cfg=cfg
    )


def main():
    ap = argparse.ArgumentParser("gapro_tpu gen_ps")
    ap.add_argument("--data_root", type=str, default="dataset/scannetv2")
    ap.add_argument("--save_folder", type=str, default="dataset/scannetv2/gaussian_process_kl_pseudo_labels")
    ap.add_argument("--split", type=str, default="train")
    ap.add_argument("--use_deepfeat", action="store_true")
    ap.add_argument("--deepfeat_folder", type=str, default="dataset/scannetv2/pretrain_maskfeats")
    ap.add_argument("--eval_pslabel", action="store_true")
    ap.add_argument("--eval_ap", action="store_true",
                    help="AP of pseudo labels vs GT (eval_ap_ps_labels.py)")
    ap.add_argument("--training_iter", type=int, default=50)
    ap.add_argument("--synthetic", type=int, default=0, help="run N synthetic scenes instead of real data")
    args = ap.parse_args()

    cfg = LabelerConfig(training_iter=args.training_iter)
    ious_all = []
    ap_scenes = []
    t_start = time.time()
    n_done = 0

    if args.synthetic:
        from gapro_tpu.data import make_synthetic_scene

        for i in range(args.synthetic):
            scene = make_synthetic_scene(seed=i)
            out = run_scene(scene.xyz, scene.rgb, scene.semantic_label, scene.instance_label, scene.spp, cfg)
            sem, inst, prob, mu, var, _ = out
            n_done += 1
            gt_sem = scene.semantic_label.copy()
            gt_sem[gt_sem >= 2] -= 2
            gt_sem[(gt_sem == 0) | (gt_sem == 1)] = 18
            ious = pseudo_label_miou_scene(gt_sem, scene.instance_label, sem, inst)
            ious_all.append(ious)
            if args.eval_ap:
                ap_scenes.append((gt_sem, scene.instance_label, sem, inst))
            print(f"scene {i}: {len(scene.xyz)} pts, inst mIoU {np.mean(ious):.4f}")
    else:
        from gapro_tpu.data import scannet_io

        files = sorted(glob(osp.join(args.data_root, args.split, "*_inst_nostuff.pth")))
        if not files:
            print(f"no scenes found under {args.data_root}/{args.split}", file=sys.stderr)
            return 1
        os.makedirs(args.save_folder, exist_ok=True)

        def scene_stream():
            """Load + box derivation per scene; the labeler pipelines scene
            i+1's device stage with scene i's host resolution."""
            for path in files:
                scan = osp.basename(path)[:12]
                save_path = osp.join(args.save_folder, scan + ".pth")
                if osp.exists(save_path):
                    continue
                xyz, rgb, sem_gt, inst_gt = scannet_io.load_scene(path)
                spp = scannet_io.load_superpoints(
                    osp.join(args.data_root, "superpoints", scan + ".pth"))
                mat = scannet_io.load_axis_align_matrix(
                    osp.join(args.data_root, "scans_transform", scan, scan + ".txt")
                )
                xyz = scannet_io.apply_axis_align(xyz, mat)
                plane = scannet_io.load_plane_quads(
                    osp.join(args.data_root, "scannet_planes", scan + ".json"))
                wall = wall_boxes_from_planes(plane, mat) if plane is not None else None
                info = instance_info(xyz, inst_gt, sem_gt,
                                     with_corners=False)
                if info is None:
                    continue
                _, cls, boxes, vols, _ = info
                feats = np.concatenate([xyz, rgb], axis=1)
                if args.use_deepfeat:
                    import torch

                    feats = np.asarray(
                        torch.load(osp.join(args.deepfeat_folder, scan + ".pth"),
                                   map_location="cpu", weights_only=False)
                    ).astype(np.float32)
                kw = dict(coords=xyz, gp_feats=feats, spp=spp, instance_cls=cls,
                          instance_box=boxes, instance_box_volume=vols)
                if wall is not None:
                    _, kw["wall_box"], kw["wall_box_volume"] = wall
                kw["_meta"] = (scan, save_path, sem_gt, inst_gt)
                yield kw

        from gapro_tpu.labeler import generate_scene_labels_stream

        def strip_meta(it):
            for kw in it:
                meta.append(kw.pop("_meta"))
                yield kw

        meta = []
        for i, (_, out) in enumerate(
            generate_scene_labels_stream(strip_meta(scene_stream()), cfg)
        ):
            scan, save_path, sem_gt, inst_gt = meta[i]
            sem, inst, prob, mu, var, _ = out
            scannet_io.save_pseudo_labels(save_path, sem, inst, prob, mu, var)
            n_done += 1
            if args.eval_pslabel:
                gt_sem = sem_gt.copy()
                gt_sem[gt_sem != -100] -= 2
                gt_sem[(gt_sem == -1) | (gt_sem == -2)] = 18
                ious = pseudo_label_miou_scene(gt_sem, inst_gt, sem, inst)
                ious_all.append(ious)
                if args.eval_ap:
                    ap_scenes.append((gt_sem, inst_gt, sem, inst))
                print(f"{scan}: mIoU {np.mean(ious):.4f}")

    dt = time.time() - t_start
    if ap_scenes:
        from gapro_tpu.eval.pseudo import pseudo_label_ap

        res = pseudo_label_ap(ap_scenes)
        print(f"Pseudo-label AP {res['all_ap']:.4f} AP50 {res['all_ap_50%']:.4f} "
              f"AP25 {res['all_ap_25%']:.4f}")
    if ious_all:
        miou = float(np.mean(np.concatenate(ious_all)))
        print(f"Mean instance iou of pseudo labels: {miou:.4f}")
    if n_done:
        print(f"{n_done} scenes in {dt:.1f}s  ({n_done / dt:.3f} scenes/sec)")
    print("Finish")
    return 0


if __name__ == "__main__":
    sys.exit(main())
