#!/usr/bin/env python
"""Train ISBNet / SPFormer (reference: ISBNet/tools/train.py, SPFormer/tools/train.py).

Single-chip by default; `--dp N` shards scenes over an N-device mesh
(DDP analog: psum-averaged grads/BN via shard_map, train/step.py).

No dataset on this machine? `--synthetic N` fabricates N rooms.

Examples:
  python tools/train.py configs/isbnet_scannetv2.yaml --synthetic 8 --epochs 2
  python tools/train.py configs/spformer_scannetv2.yaml --work_dir runs/spf
  python tools/train.py configs/isbnet_scannetv2.yaml --resume runs/isbnet/latest
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


def build_model(cfg):
    if cfg.model.type == "isbnet":
        from gapro_tpu.losses.criterion import CriterionConfig
        from gapro_tpu.models import ISBNet, ISBNetConfig
        from gapro_tpu.train.step import make_train_step

        mk = {k: v for k, v in cfg.model.items() if k != "type"}
        crit = CriterionConfig(**dict(cfg.get("criterion", {})))
        return ISBNet(ISBNetConfig(**mk)), crit, make_train_step
    elif cfg.model.type == "spformer":
        from gapro_tpu.losses.spformer_criterion import SPFormerCriterionConfig
        from gapro_tpu.models.spformer import SPFormer, SPFormerConfig
        from gapro_tpu.train.step import make_spformer_train_step

        mk = {k: v for k, v in cfg.model.items() if k != "type"}
        ck = dict(cfg.get("criterion", {}))
        for tup in ("loss_weight", "cost_weight"):
            if tup in ck:
                ck[tup] = tuple(ck[tup])
        return SPFormer(SPFormerConfig(**mk)), SPFormerCriterionConfig(**ck), make_spformer_train_step
    raise ValueError(cfg.model.type)


def build_dataset(cfg, args, training=True):
    from gapro_tpu.data.dataset import (
        S3DISDataset,
        ScanNetDataset,
        SyntheticDataset,
        VoxelCfg,
    )

    vc = VoxelCfg(
        scale=cfg.data.voxel.scale,
        spatial_shape=tuple(cfg.data.voxel.spatial_shape),
        max_npoint=cfg.data.voxel.max_npoint,
        min_npoint=cfg.data.voxel.min_npoint,
    )
    if args.synthetic:
        return SyntheticDataset(n_scenes=args.synthetic, training=training,
                                voxel_cfg=vc, repeat=cfg.data.get("repeat", 1))
    cls = S3DISDataset if cfg.data.type == "s3dis" else ScanNetDataset
    prefix = cfg.data.prefix_train if training else cfg.data.prefix_val
    return cls(cfg.data.data_root, prefix=prefix, training=training,
               label_type=cfg.data.get("label_type") if training else None,
               repeat=cfg.data.get("repeat", 1) if training else 1,
               voxel_cfg=vc)


def main():
    ap = argparse.ArgumentParser("gapro_tpu train")
    ap.add_argument("config")
    ap.add_argument("--work_dir", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--only_backbone", action="store_true")
    ap.add_argument("--trainall", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--dp", type=int, default=0, help="data-parallel device count")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gapro_tpu.core.bucketing import next_bucket
    from gapro_tpu.data.dataset import build_dataloader
    from gapro_tpu.models.prepare import prepare_voxel_batch
    from gapro_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from gapro_tpu.train.config import load_config
    from gapro_tpu.train.state import cosine_lr_after_step, create_train_state

    cfg = load_config(args.config)
    if args.only_backbone:
        cfg.model["semantic_only"] = True
        if "semantic_only" in cfg.get("criterion", {}):
            cfg.criterion["semantic_only"] = True
    if args.trainall and "trainall" in cfg.get("criterion", {}):
        cfg.criterion["trainall"] = True
    if args.epochs:
        cfg.train["epochs"] = args.epochs
    if args.batch_size:
        cfg.train["batch_size"] = args.batch_size

    work_dir = args.work_dir or osp.join(
        "runs", osp.splitext(osp.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(osp.join(work_dir, "train.log"))],
    )
    log = logging.getLogger("train")
    log.info("devices: %s", jax.devices())
    metrics_f = open(osp.join(work_dir, "metrics.jsonl"), "a")

    model, crit, make_step = build_model(cfg)
    dataset = build_dataset(cfg, args, training=True)

    # init on one probe batch
    probe = next(iter(build_dataloader(dataset, cfg.train.batch_size,
                                       training=True, seed=args.seed)))
    n_cap = probe.points.coords.shape[0]
    num_levels = cfg.model.get("num_blocks", cfg.model.get("blocks", 7))
    spp_cap = cfg.model.spp_cap

    def prepare(pb, bs):
        pb = jax.tree_util.tree_map(jnp.asarray, pb)
        return prepare_voxel_batch(pb, pb.coords.shape[0], bs, num_levels, spp_cap)

    prepared = prepare(probe.points, probe.batch_size)
    variables = model.init(jax.random.PRNGKey(args.seed), prepared.batch, False)
    if cfg.train.get("pretrain"):
        variables = dict(variables)
        variables["params"] = load_checkpoint(
            cfg.train.pretrain, variables["params"]
        )
        log.info("loaded pretrain %s", cfg.train.pretrain)
    state = create_train_state(variables, lr=cfg.train.lr,
                               weight_decay=cfg.train.weight_decay)
    start_epoch = 1
    if args.resume:
        tree = load_checkpoint(args.resume, dict(
            params=state.params, batch_stats=state.batch_stats,
            opt_state=state.opt_state, step=state.step, epoch=0))
        state = state.replace(params=tree["params"], batch_stats=tree["batch_stats"],
                              opt_state=tree["opt_state"], step=tree["step"])
        start_epoch = int(tree.get("epoch", 0)) + 1
        log.info("resumed from %s at epoch %d", args.resume, start_epoch)

    if args.dp > 1:
        from jax.sharding import Mesh

        from gapro_tpu.train.step import make_dp_train_step

        mesh = Mesh(np.array(jax.devices()[: args.dp]), ("dp",))
        step_fn = make_dp_train_step(model, crit, mesh)
        log.info("data-parallel over %d devices", args.dp)
    else:
        step_fn = make_step(model, crit)

    epochs = cfg.train.epochs
    for epoch in range(start_epoch, epochs + 1):
        lr = cosine_lr_after_step(cfg.train.lr, epoch - 1,
                                  cfg.train.step_epoch, epochs)
        t0 = time.time()
        n_iter, loss_sum = 0, 0.0
        for lb in build_dataloader(dataset, cfg.train.batch_size,
                                   training=True, seed=args.seed, epoch=epoch):
            if args.dp > 1:
                # one scene micro-batch per device, padded to a common bucket
                from gapro_tpu.models.prepare import points_to_batch_np

                per_dev = [lb.scenes[d % len(lb.scenes)] for d in range(args.dp)]
                cap = max(next_bucket(len(s["xyz"])) for s in per_dev)
                shards = [
                    prepare(points_to_batch_np([s], voxel_scale=dataset.voxel_cfg.scale,
                                               n_cap=cap), 1)
                    for s in per_dev
                ]
                prepared = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
            else:
                prepared = prepare(lb.points, lb.batch_size)
            state, losses = step_fn(state, prepared, jnp.float32(lr))
            loss_sum += float(losses["loss"])
            n_iter += 1
        dt = time.time() - t0
        mean_loss = loss_sum / max(n_iter, 1)
        log.info("epoch %d/%d loss %.4f lr %.2e (%.1fs, %d iters)",
                 epoch, epochs, mean_loss, lr, dt, n_iter)
        metrics_f.write(json.dumps(dict(epoch=epoch, loss=mean_loss, lr=lr,
                                        seconds=dt)) + "\n")
        metrics_f.flush()
        save_checkpoint(work_dir, dict(
            params=state.params, batch_stats=state.batch_stats,
            opt_state=state.opt_state, step=state.step, epoch=epoch,
        ), epoch, save_freq=cfg.train.get("save_freq", 16))
    log.info("done: %s", work_dir)


if __name__ == "__main__":
    main()
