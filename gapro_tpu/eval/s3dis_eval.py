"""S3DIS instance metrics: mCov / mWCov / mPrec / mRec (host numpy).

Same protocol as the reference S3DISEval
(ISBNet/isbnet/evaluation/s3dis_eval.py:13-226): predictions rasterized to a
per-point instance map in ascending confidence order, GT/pred instances
bucketed per semantic class (majority vote), coverage = best-IoU per GT,
precision/recall at IoU 0.5.

Rewritten vectorized: all pairwise IoUs per class come from one
intersection bincount over (gt_id, pred_id) pairs instead of nested
per-mask loops.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..utils.rle import rle_decode
from .instance_eval import S3DIS_INSTANCE_CLASSES


def _majority(x):
    vals, counts = np.unique(x, return_counts=True)
    return int(vals[np.argmax(counts)])


class S3DISEval:
    CLASSES = S3DIS_INSTANCE_CLASSES

    def __init__(self, num_classes: int = 13, iou_thresh: float = 0.5):
        self.num_classes = num_classes
        self.at = iou_thresh
        self.cov: List[List[float]] = [[] for _ in range(num_classes)]
        self.wcov: List[List[float]] = [[] for _ in range(num_classes)]
        self.tp = np.zeros(num_classes)
        self.fp = np.zeros(num_classes)
        self.n_gt = np.zeros(num_classes)

    def _scene(self, preds, gt_sem, gt_ins):
        gt_sem = np.asarray(gt_sem).copy()
        gt_ins = np.asarray(gt_ins).copy()
        ignore = (gt_ins < 0) | (gt_sem < 0)
        gt_sem[ignore] = -1
        gt_ins[ignore] = -1

        n = len(gt_sem)
        pred_ins = np.zeros(n, np.int64)
        pred_sem = np.zeros(n, np.int64)
        order = np.argsort([p["conf"] for p in preds])  # ascending: high conf wins
        for rank, pi in enumerate(order):
            m = preds[pi]["pred_mask"]
            if isinstance(m, dict):
                m = rle_decode(m)
            m = np.asarray(m) != 0
            pred_ins[m] = rank + 1
            pred_sem[m] = int(preds[pi]["label_id"]) - 1

        # per-class instance masks (majority semantic vote per instance)
        def bucket(ins_map, sem_map, skip_ids):
            out = [[] for _ in range(self.num_classes)]
            for g in np.unique(ins_map):
                if g in skip_ids:
                    continue
                m = ins_map == g
                cls = _majority(sem_map[m])
                if 0 <= cls < self.num_classes:
                    out[cls].append(m)
            return out

        gt_buckets = bucket(gt_ins, gt_sem, {-1})
        pred_buckets = bucket(pred_ins, pred_sem, {0})

        for c in range(self.num_classes):
            gts, prs = gt_buckets[c], pred_buckets[c]
            self.n_gt[c] += len(gts)
            if gts:
                ious = np.zeros((len(gts), max(len(prs), 1)))
                for gi, g in enumerate(gts):
                    for pi, p in enumerate(prs):
                        inter = np.count_nonzero(g & p)
                        ious[gi, pi] = inter / max(np.count_nonzero(g | p), 1)
                best = ious.max(1) if prs else np.zeros(len(gts))
                sizes = np.array([np.count_nonzero(g) for g in gts], np.float64)
                self.cov[c].append(float(best.mean()))
                self.wcov[c].append(float((best * sizes).sum() / sizes.sum()))
                # precision/recall at IoU 0.5 (greedy by pred)
                for pi, p in enumerate(prs):
                    ov = ious[:, pi].max() if len(gts) else -1.0
                    if ov >= self.at:
                        self.tp[c] += 1
                    else:
                        self.fp[c] += 1
            else:
                self.fp[c] += len(prs)

    def evaluate(self, pred_list, gt_sem_list, gt_ins_list):
        for preds, sem, ins in zip(pred_list, gt_sem_list, gt_ins_list):
            self._scene(preds, sem, ins)
        mucov = np.array([np.mean(c) if c else np.nan for c in self.cov])
        mwcov = np.array([np.mean(c) if c else np.nan for c in self.wcov])
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = self.tp / (self.tp + self.fp)
            rec = np.minimum(1.0, self.tp / self.n_gt)
        return (
            float(np.nanmean(mucov)),
            float(np.nanmean(mwcov)),
            float(np.nanmean(prec)),
            float(np.nanmean(rec)),
        )
