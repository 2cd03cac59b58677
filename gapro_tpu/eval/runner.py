"""Shared per-scene inference used by tools/test.py and in-train validation
(reference validate(), ISBNet/tools/train.py:110-236).

One scene (batch-1) -> list of instance prediction dicts
({scan_id, label_id, conf, pred_mask rle}).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np


def make_infer_fn(model, variables, model_type: str,
                  n_sample_arr: Optional[tuple] = None) -> Callable:
    """Returns infer(batch) -> outputs dict for 'isbnet' / 'spformer'.

    Jitted: un-jitted model.apply runs eagerly, which on the remote-relay
    TPU costs a round trip per op (measured 38.9 s/scene vs 0.5 jitted)."""
    import jax

    if model_type == "isbnet":
        if n_sample_arr is not None:
            f = jax.jit(lambda v, b: model.apply(
                v, b,
                method=lambda m, x: m.forward_inference(x, n_sample_arr=n_sample_arr)))
        else:
            f = jax.jit(lambda v, b: model.apply(
                v, b, method=lambda m, x: m.forward_inference(x)))
    else:
        f = jax.jit(lambda v, b: model.apply(v, b, False))
    return lambda b: f(variables, b)


def infer_scene_instances(model_type: str, out, batch, scene_spp, point2voxel,
                          n_points: int, scan_id: str, test_cfg) -> list:
    """Model outputs -> instance dicts (get_instance postprocessing)."""
    from ..models.inference import TestConfig, get_instances, spformer_get_instances

    if model_type == "isbnet":
        tc = (test_cfg if isinstance(test_cfg, TestConfig)
              else TestConfig.from_dict(test_cfg))
        return get_instances(scan_id, out, batch, scene_spp,
                             np.asarray(point2voxel), n_points, tc)
    t = dict(test_cfg or {})
    return spformer_get_instances(
        scan_id, out, batch, scene_spp, np.asarray(point2voxel), n_points,
        topk_insts=t.get("topk_insts", 100),
        score_thr=t.get("score_thresh", 0.0),
        npoint_thr=t.get("npoint_thresh", 100))


def validate(model, variables, model_type: str, dataset, cfg, log,
             prepare_fn, max_scenes: Optional[int] = None):
    """In-train validation (reference ISBNet/tools/train.py:110-236).

    semantic_only models -> pointwise (mIoU, acc, offset MAE), metric = mIoU;
    otherwise -> full AP eval with single-round sampling (the reference sets
    iterative_sampling=False during training validation, train.py:122),
    metric = all_ap. Returns (metric, detail_dict).
    """
    from ..data.dataset import build_dataloader
    from .instance_eval import (S3DIS_INSTANCE_CLASSES, SCANNET_INSTANCE_CLASSES,
                                ScanNetEval)
    from .point_wise_eval import PointWiseEval

    semantic_only = bool(cfg.model.get("semantic_only", False))
    n_queries = cfg.model.get("n_queries", 256)
    if semantic_only:
        _f = jax.jit(lambda v, b: model.apply(v, b, False))
        infer = lambda b: _f(variables, b)
        pe = PointWiseEval(num_classes=cfg.model.get("instance_classes", 18) + 1)
    else:
        infer = make_infer_fn(model, variables, model_type,
                              n_sample_arr=(n_queries,) if model_type == "isbnet" else None)
        labels = (S3DIS_INSTANCE_CLASSES if cfg.data.type == "s3dis"
                  else SCANNET_INSTANCE_CLASSES)
        ev = ScanNetEval(labels, dataset_name=cfg.data.type)
        all_preds, all_sems, all_insts = [], [], []

    def resolve(rec):
        scene, scan_id, prepared, out = rec
        p2v = np.asarray(prepared.point2voxel)
        if semantic_only:
            sem_pred = np.asarray(out["semantic_scores"]).argmax(1)[p2v]
            corners = np.asarray(out["corners_offset"])[p2v]
            gt_corners = _corner_labels(scene)
            pe.update(sem_pred, corners, scene["semantic"], gt_corners,
                      scene["instance"])
        else:
            insts = infer_scene_instances(
                model_type, out, prepared.batch, scene["spp"], p2v,
                len(scene["xyz"]), scan_id, cfg.get("test", {}))
            all_preds.append(insts)
            all_sems.append(scene["semantic"])
            all_insts.append(scene["instance"])

    # one scene in flight: scene i+1's forward is dispatched before scene
    # i's host postprocess (same pipeline as tools/test.py)
    n_done = 0
    pending = None
    for lb in build_dataloader(dataset, 1, training=False, drop_last=False):
        if max_scenes is not None and n_done >= max_scenes:
            break
        scene = lb.scenes[0]
        # the reference skips >3M-point scenes during in-train validation to
        # avoid OOM (train.py:127-128)
        if len(scene["xyz"]) > 3_000_000:
            continue
        prepared = prepare_fn(lb)
        out = infer(prepared.batch)
        rec = (scene, lb.scan_ids[0], prepared, out)
        if pending is not None:
            resolve(pending)
        pending = rec
        n_done += 1
    if pending is not None:
        resolve(pending)

    if semantic_only:
        miou, acc, mae = pe.get_eval(log)
        return float(miou), dict(val_miou=float(miou), val_acc=float(acc),
                                 val_offset_mae=float(mae))
    res = ev.evaluate(all_preds, all_sems, all_insts)
    log.info("val AP %.4f AP50 %.4f AP25 %.4f", res["all_ap"],
             res["all_ap_50%"], res["all_ap_25%"])
    return float(res["all_ap"]), dict(val_ap=float(res["all_ap"]),
                                      val_ap50=float(res["all_ap_50%"]),
                                      val_ap25=float(res["all_ap_25%"]))


def _corner_labels(scene):
    """GT box-corner offsets per point (reference get_instance_info,
    model_utils.py:519-555): [min - xyz, max - xyz] of the point's instance."""
    xyz = np.asarray(scene["xyz"], np.float32)
    inst = np.asarray(scene["instance"])
    out = np.full((len(xyz), 6), -100.0, np.float32)
    for i in np.unique(inst):
        if i < 0:
            continue
        m = inst == i
        mn, mx = xyz[m].min(0), xyz[m].max(0)
        out[m, :3] = mn - xyz[m]
        out[m, 3:] = mx - xyz[m]
    return out
