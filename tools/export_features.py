#!/usr/bin/env python
"""Export per-point mask-tower features for self-training
(reference: ISBNet/tools/export_features.py:81-113 + isbnet.py:511-516).

The exported 32-d features replace xyz+rgb as GP inputs in
`tools/gen_ps.py --use_deepfeat` (gapro/gen_ps.py:48-55), closing the
self-training loop (docs/TRAIN.md:31-46).

Example:
  python tools/export_features.py configs/isbnet_scannetv2.yaml runs/isbnet/best \
      --save_dir dataset/scannetv2/pretrain_maskfeats --synthetic 4
"""

import argparse
import logging
import os
import os.path as osp
import sys

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
    ap = argparse.ArgumentParser("gapro_tpu export_features")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--save_dir", default="maskfeats")
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gapro_tpu.data.dataset import build_dataloader
    from gapro_tpu.models.prepare import prepare_voxel_batch
    from gapro_tpu.train.checkpoint import load_checkpoint
    from gapro_tpu.train.config import load_config

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("export")

    cfg = load_config(args.config)
    assert cfg.model.type == "isbnet", "feature export is an ISBNet path"
    model, _, _ = build_model(cfg)
    dataset = build_dataset(cfg, args, training=False)
    num_levels = cfg.model.get("num_blocks", 7)
    spp_cap = cfg.model.spp_cap
    plan_shrink = _read_plan_shrink(cfg.data)

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

    def _fn(m, b):
        out, _ = m.trunk(b, False)
        return m.run_mask_tower(out["voxel_feats"], b.valid, False)

    # jitted: eager apply costs a relay round trip per op (see tools/test.py)
    _jit_apply = jax.jit(lambda v, b: model.apply(v, b, method=_fn))

    def mask_features(batch):
        """Backbone features -> per-voxel mask-tower features (isbnet.py:512-516
        runs the tower on voxel features before superpoint pooling)."""
        return _jit_apply(variables, batch)

    os.makedirs(args.save_dir, exist_ok=True)
    import torch

    for lb in build_dataloader(dataset, 1, training=False, drop_last=False):
        scene = lb.scenes[0]
        n_points = len(scene["xyz"])
        pb = upload_point_batch(lb.points)
        prepared = prepare_voxel_batch(pb, pb.coords.shape[0], 1, num_levels, spp_cap, plan_shrink)
        vf = np.asarray(mask_features(prepared.batch))  # [V, 32]
        p2v = np.asarray(prepared.point2voxel)[:n_points]
        feats_pt = vf[np.maximum(p2v, 0)]
        path = osp.join(args.save_dir, lb.scan_ids[0] + ".pth")
        torch.save(feats_pt.astype(np.float32), path)
        log.info("%s -> %s (%s)", lb.scan_ids[0], path, feats_pt.shape)


if __name__ == "__main__":
    main()
