#!/usr/bin/env python
"""Inference + AP evaluation (reference: ISBNet/tools/test.py, SPFormer/tools/test.py).

Batch-1 per scene, per-scene wall-time report, ScanNet AP harness, and
optional benchmark-format export (txt index + per-mask RLE dumps).

Examples:
  python tools/test.py configs/isbnet_scannetv2.yaml runs/isbnet/latest --synthetic 4
  python tools/test.py configs/spformer_scannetv2.yaml runs/spf/best --out preds/
"""

import argparse
import json
import logging
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gapro_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

from tools.train import build_dataset, build_model  # noqa: E402



def _read_plan_shrink(data_cfg):
    """plan_shrink: one factor or a per-level list (sparse/plan.py)."""
    v = data_cfg.get("plan_shrink", 0.5)
    return tuple(float(s) for s in v) if isinstance(v, (list, tuple)) else float(v)

def main():
    ap = argparse.ArgumentParser("gapro_tpu test")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out", default=None, help="benchmark-format export dir")
    ap.add_argument("--save_pointwise", default=None,
                    help="dump per-point semantic_pred/offset_pred/"
                         "offset_vertices_pred .npy dirs (the reference "
                         "visualization tools' prediction_path layout, "
                         "ISBNet/tools/visualization.py:345-383,505)")
    ap.add_argument("--no_eval", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gapro_tpu.data.dataset import build_dataloader
    from gapro_tpu.eval import ScanNetEval, SCANNET_INSTANCE_CLASSES, S3DIS_INSTANCE_CLASSES, S3DISEval
    from gapro_tpu.models.inference import TestConfig, get_instances, spformer_get_instances
    from gapro_tpu.models.prepare import prepare_voxel_batch
    from gapro_tpu.train.checkpoint import load_checkpoint
    from gapro_tpu.train.config import load_config

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("test")

    cfg = load_config(args.config)
    model, crit, _ = build_model(cfg)
    dataset = build_dataset(cfg, args, training=False)
    num_levels = cfg.model.get("num_blocks", cfg.model.get("blocks", 7))
    spp_cap = cfg.model.spp_cap
    plan_shrink = _read_plan_shrink(cfg.data)
    is_isbnet = cfg.model.type == "isbnet"

    # variables: init-then-load (shape-checked partial restore)
    probe = next(iter(build_dataloader(dataset, 1, training=False)))
    from gapro_tpu.models.prepare import upload_point_batch

    pb = upload_point_batch(probe.points)
    prepared = prepare_voxel_batch(pb, pb.coords.shape[0], 1, num_levels, spp_cap, plan_shrink)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), prepared.batch, False)
    if args.checkpoint:
        tree = load_checkpoint(args.checkpoint, dict(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {})))
        variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
        log.info("loaded %s", args.checkpoint)

    # jit the whole inference forward: un-jitted model.apply runs eagerly,
    # which on the remote relay costs a round trip PER OP (measured
    # 38.9 s/scene vs 0.5 s jitted)
    if is_isbnet:
        tc = TestConfig.from_dict(cfg.get("test", {}))
        infer = jax.jit(lambda v, b: model.apply(
            v, b, method=lambda m, x: m.forward_inference(x)))
    else:
        infer = jax.jit(lambda v, b: model.apply(v, b, False))

    x4 = bool(cfg.get("test", {}).get("x4_split", False)) and is_isbnet
    if x4:
        infer = jax.jit(lambda v, b: model.apply(
            v, b, method=lambda m, x: m.forward_inference(x, x4_split=True)))

    all_preds, all_sems, all_insts, all_coords = [], [], [], []
    def submit(lb):
        """Host pack + device prepare/infer dispatch, NON-blocking: the
        device computes scene i+1 while the host postprocesses scene i
        (reference runs strictly serial, ISBNet/tools/test.py:121-131)."""
        scene = lb.scenes[0]
        n_points = len(scene["xyz"])
        if x4:
            # 4 interleaved pieces ride the batch axis (s3dis.py:79-116);
            # remember the permutation to unscramble the final masks
            from gapro_tpu.models.prepare import points_to_batch_np

            order = np.argsort(scene["xyz"][:, 0], kind="stable")
            pieces = []
            for p in range(4):
                idx = order[p::4]
                pieces.append({k: (v[idx] if isinstance(v, np.ndarray)
                                   and len(v) == n_points else v)
                               for k, v in scene.items()})
            perm = np.concatenate([order[p::4] for p in range(4)])
            pbh = points_to_batch_np(pieces, voxel_scale=dataset.voxel_cfg.scale)
            pb = upload_point_batch(pbh)
            prepared = prepare_voxel_batch(pb, pbh.coords.shape[0], 4,
                                           num_levels, spp_cap, plan_shrink)
            scene = {**scene, "spp": np.concatenate([p_["spp"] for p_ in pieces])}
        else:
            perm = None
            pb = upload_point_batch(lb.points)
            prepared = prepare_voxel_batch(pb, pb.coords.shape[0], 1, num_levels, spp_cap, plan_shrink)
        # async dispatch: on a production TPU runtime scene i+1's forward
        # overlaps scene i's host postprocess; this machine's relay
        # serializes fetches with device compute, so the overlap is
        # neutral HERE but free (docs/PERF.md timing-methodology note)
        out = infer(variables, prepared.batch)
        return lb.scan_ids[0], scene, n_points, perm, prepared, out

    def resolve(rec, t_last):
        scan_id, scene, n_points, perm, prepared, out = rec
        if is_isbnet:
            insts = get_instances(scan_id, out, prepared.batch,
                                  scene["spp"], np.asarray(prepared.point2voxel),
                                  n_points, tc)
        else:
            t = cfg.get("test", {})
            insts = spformer_get_instances(
                scan_id, out, prepared.batch, scene["spp"],
                np.asarray(prepared.point2voxel), n_points,
                topk_insts=t.get("topk_insts", 100),
                score_thr=t.get("score_thresh", 0.0),
                npoint_thr=t.get("npoint_thresh", 100))
        if perm is not None:
            # masks are in piece-concatenated order; restore scene order
            from gapro_tpu.utils.rle import rle_decode, rle_encode

            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            for inst in insts:
                m = rle_decode(inst["pred_mask"])
                inst["pred_mask"] = rle_encode(m[inv])
        dt = time.time() - t_last  # completed-scene interval (throughput)
        times.append(dt)
        log.info("%s: %d pts, %d instances, %.3fs", scan_id, n_points,
                 len(insts), dt)
        all_preds.append(insts)
        all_sems.append(scene["semantic"])
        all_insts.append(scene["instance"])
        all_coords.append(scene["xyz"])

        if args.out:
            export_benchmark(args.out, scan_id, insts, n_points)
        if args.save_pointwise and is_isbnet:
            # point-level pointwise-head dumps in the reference viewers'
            # prediction_path layout (semantic_pred/, offset_pred/,
            # offset_vertices_pred/ — visualization.py:345-383,505)
            import jax.numpy as _jnp

            p2v = np.asarray(prepared.point2voxel)[:n_points]
            sem_pt = np.asarray(_jnp.argmax(out["semantic_scores"], 1))[p2v]
            corners_pt = np.asarray(out["corners_offset"])[p2v]  # [N, 6]
            if perm is not None:
                inv = np.empty_like(perm)
                inv[perm] = np.arange(len(perm))
                sem_pt, corners_pt = sem_pt[inv], corners_pt[inv]
            for sub, arr in (("semantic_pred", sem_pt.astype(np.int32)),
                             ("offset_pred",
                              ((corners_pt[:, :3] + corners_pt[:, 3:]) / 2
                               ).astype(np.float32)),
                             ("offset_vertices_pred",
                              corners_pt.astype(np.float32))):
                d = osp.join(args.save_pointwise, sub)
                os.makedirs(d, exist_ok=True)
                np.save(osp.join(d, scan_id + ".npy"), arr)
        return time.time()

    times = []
    t_last = time.time()
    pending = None
    for lb in build_dataloader(dataset, 1, training=False, drop_last=False):
        rec = submit(lb)
        if pending is not None:
            t_last = resolve(pending, t_last)
        pending = rec
    if pending is not None:
        resolve(pending, t_last)

    # with the one-scene-in-flight pipeline, first compiles can surface in
    # the first TWO resolved intervals — the median is the steady number
    log.info("Average run time: %.4fs (steady median: %.4fs)",
             float(np.mean(times)), float(np.median(times)))

    if not args.no_eval:
        labels = (S3DIS_INSTANCE_CLASSES if cfg.data.type == "s3dis"
                  else SCANNET_INSTANCE_CLASSES)
        ev = ScanNetEval(labels, dataset_name=cfg.data.type)
        res = ev.evaluate(all_preds, all_sems, all_insts)
        log.info("AP %.4f  AP50 %.4f  AP25 %.4f", res["all_ap"],
                 res["all_ap_50%"], res["all_ap_25%"])
        print(json.dumps({k: v for k, v in res.items() if k != "classes"}))
        if not is_isbnet:
            # the reference runs box AP on every non-test SPFormer eval
            # (SPFormer/tools/test.py:72 -> evaluate_box)
            resb = ev.evaluate_box(all_preds, all_coords, all_sems, all_insts)
            log.info("Box AP %.4f  Box AP50 %.4f  Box AP25 %.4f",
                     resb["all_ap"], resb["all_ap_50%"], resb["all_ap_25%"])
            print(json.dumps({("box_" + k): v for k, v in resb.items()
                              if k != "classes"}))
        if cfg.data.type == "s3dis":
            mucov, mwcov, prec, rec = S3DISEval().evaluate(all_preds, all_sems, all_insts)
            log.info("mCov %.4f mWCov %.4f mPrec %.4f mRec %.4f", mucov, mwcov, prec, rec)


def export_benchmark(out_dir, scan_id, instances, n_points):
    """ScanNet benchmark submission format (ISBNet/tools/test.py:41-59):
    <scan>.txt lines `pred_mask/<scan>_<i>.txt label conf` + binary masks."""
    from gapro_tpu.utils.rle import rle_decode

    os.makedirs(osp.join(out_dir, "pred_mask"), exist_ok=True)
    lines = []
    for i, inst in enumerate(instances):
        rel = f"pred_mask/{scan_id}_{i:03d}.txt"
        mask = rle_decode(inst["pred_mask"]).astype(np.int8)
        np.savetxt(osp.join(out_dir, rel), mask, fmt="%d")
        lines.append(f"{rel} {inst['label_id']} {inst['conf']:.4f}")
    with open(osp.join(out_dir, scan_id + ".txt"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
