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
import contextlib
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
        if "fixed_modules" in mk:
            mk["fixed_modules"] = tuple(mk["fixed_modules"] or ())
        crit = CriterionConfig(**dict(cfg.get("criterion", {})))
        return ISBNet(ISBNetConfig(**mk)), crit, make_train_step
    elif cfg.model.type == "spformer":
        from gapro_tpu.losses.spformer_criterion import SPFormerCriterionConfig
        from gapro_tpu.models.spformer import SPFormer, SPFormerConfig
        from gapro_tpu.train.step import make_spformer_train_step

        mk = {k: v for k, v in cfg.model.items() if k != "type"}
        if "fixed_modules" in mk:
            mk["fixed_modules"] = tuple(mk["fixed_modules"] or ())
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



def _read_plan_shrink(data_cfg):
    """plan_shrink: one factor or a per-level list (sparse/plan.py)."""
    v = data_cfg.get("plan_shrink", 0.5)
    return tuple(float(s) for s in v) if isinstance(v, (list, tuple)) else float(v)

def main():
    ap = argparse.ArgumentParser("gapro_tpu train")
    ap.add_argument("config")
    ap.add_argument("--work_dir", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--pretrain", default=None,
                    help="backbone-pretrain checkpoint (overrides cfg.train.pretrain)")
    ap.add_argument("--only_backbone", action="store_true")
    ap.add_argument("--trainall", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--dp", type=int, default=0, help="data-parallel device count")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_validate", action="store_true")
    ap.add_argument("--val_scenes", type=int, default=None,
                    help="cap validation to N scenes (speed)")
    ap.add_argument("--num_workers", type=int, default=None,
                    help="host dataloader worker processes (default cfg or 0)")
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="capture a jax.profiler trace of the first N steps "
                         "of the first epoch into <work_dir>/trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gapro_tpu.core.bucketing import next_bucket
    from gapro_tpu.data.dataset import build_dataloader
    from gapro_tpu.eval.runner import validate
    from gapro_tpu.models.prepare import prepare_voxel_batch
    from gapro_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from gapro_tpu.train.config import load_config
    from gapro_tpu.train.state import (cosine_lr_after_step, create_train_state,
                                       poly_lr)

    cfg = load_config(args.config)
    if args.only_backbone:
        # reference --only_backbone (ISBNet/tools/train.py:260-263)
        cfg.model["semantic_only"] = True
        cfg.model["fixed_modules"] = []
        if "semantic_only" in cfg.get("criterion", {}):
            cfg.criterion["semantic_only"] = True
    if args.trainall:
        # reference --trainall (train.py:265-268): train everything
        cfg.model["semantic_only"] = False
        cfg.model["fixed_modules"] = []
        if "trainall" in cfg.get("criterion", {}):
            cfg.criterion["trainall"] = True
    if args.epochs:
        cfg.train["epochs"] = args.epochs
    if args.batch_size:
        cfg.train["batch_size"] = args.batch_size
    fixed_modules = tuple(cfg.model.get("fixed_modules", ()) or ())
    cfg.model["fixed_modules"] = fixed_modules

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
    # level-capacity shrink: 0.5 suits ScanNet-density clouds (~4x voxel
    # reduction per stride-2); sparser data (synthetic smokes, low-res
    # scans) needs more headroom — overflow shows up as ovf_plan_voxels
    plan_shrink = _read_plan_shrink(cfg.data)

    from gapro_tpu.models.prepare import upload_point_batch

    def prepare(pb, bs):
        pb = upload_point_batch(pb)  # one H2D transfer (relay latency)
        return prepare_voxel_batch(pb, pb.coords.shape[0], bs, num_levels, spp_cap, plan_shrink)

    prepared = prepare(probe.points, probe.batch_size)
    # jitted init: eager init costs a relay round trip per op on the
    # remote TPU (see tools/test.py)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(args.seed), prepared.batch, False)
    if args.pretrain:
        cfg.train["pretrain"] = args.pretrain
    if cfg.train.get("pretrain"):
        variables = dict(variables)
        variables["params"] = load_checkpoint(
            cfg.train.pretrain, variables["params"]
        )
        log.info("loaded pretrain %s", cfg.train.pretrain)
    # In dp mode each device consumes exactly ONE scene per step, so the
    # loader must yield `dp` scenes per batch: keeping cfg batch_size would
    # silently drop scenes (batch > dp) or replicate them (batch < dp).
    loader_batch = args.dp if args.dp > 1 else cfg.train.batch_size
    if args.dp > 1 and cfg.train.batch_size != args.dp:
        log.info("dp mode: loader batch %d -> %d (one scene per device)",
                 cfg.train.batch_size, args.dp)
    # world-batch linear LR scaling (reference train.py:315-320: base LR is
    # calibrated for batch 16); world batch = actual samples per step
    world_batch = loader_batch
    base_lr = cfg.train.lr
    lr0 = base_lr * (world_batch / cfg.train.get("base_batch_size", 16))
    if lr0 != base_lr:
        log.info("scale LR %.2e (batch 16) -> %.2e (world batch %d)",
                 base_lr, lr0, world_batch)

    if fixed_modules:
        log.info("frozen modules: %s", list(fixed_modules))
    state = create_train_state(variables, lr=lr0,
                               weight_decay=cfg.train.weight_decay,
                               fixed_modules=fixed_modules)
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

        # device-side prepare: voxelize + plan build run inside the
        # shard_map program, one per device in parallel (not host-serial)
        from gapro_tpu.models.prepare import unpack_point_batch

        def dp_prepare(buf):
            pb = unpack_point_batch(buf)
            return prepare_voxel_batch(pb, buf.shape[0], 1, num_levels,
                                       spp_cap, plan_shrink)

        if cfg.model.type == "spformer":
            from gapro_tpu.train.step import _spformer_loss_fn

            step_fn = make_dp_train_step(model, crit, mesh,
                                         loss_fn=_spformer_loss_fn,
                                         prepare_fn=dp_prepare)
        else:
            step_fn = make_dp_train_step(model, crit, mesh,
                                         prepare_fn=dp_prepare)
        log.info("data-parallel over %d devices", args.dp)
    else:
        step_fn = make_step(model, crit)

    # LR schedule: ISBNet uses cosine-after-step (util/utils.py:54-61),
    # SPFormer uses PolyLR power 0.9 (boxsup_spf_scannet.yaml:103-106)
    epochs = cfg.train.epochs
    schedule = cfg.train.get(
        "schedule", "poly" if cfg.model.type == "spformer" else "cosine")

    def lr_at(epoch):
        if schedule == "poly":
            return poly_lr(lr0, epoch - 1, epochs,
                           power=cfg.train.get("poly_power", 0.9))
        return cosine_lr_after_step(lr0, epoch - 1, cfg.train.step_epoch, epochs)

    val_dataset = None
    if not args.skip_validate:
        try:
            val_dataset = build_dataset(cfg, args, training=False)
        except Exception as e:  # no val split on disk
            log.warning("no validation dataset (%s); skipping in-train val", e)

    def prepare_val(lb):
        pb = upload_point_batch(lb.points)
        return prepare_voxel_batch(pb, pb.coords.shape[0], 1, num_levels, spp_cap, plan_shrink)

    def is_val_epoch(epoch):
        save_freq = cfg.train.get("save_freq", 16)
        return epoch % save_freq == 0 or (epoch & (epoch - 1)) == 0

    best_metric = -1.0
    save_freq = cfg.train.get("save_freq", 16)
    num_workers = (args.num_workers if args.num_workers is not None
                   else cfg.train.get("num_workers", 0))
    if num_workers:
        log.info("dataloader: %d worker processes", num_workers)
    from gapro_tpu.utils import profiling

    prof = contextlib.ExitStack()  # closed after --profile N steps
    prof_steps = 0
    for epoch in range(start_epoch, epochs + 1):
        lr = lr_at(epoch)
        t0 = time.time()
        n_iter = 0
        meters = {}
        if args.profile and epoch == start_epoch:
            prof.enter_context(profiling.trace(os.path.join(work_dir, "trace")))
        for lb in build_dataloader(dataset, loader_batch,
                                   training=True, seed=args.seed, epoch=epoch,
                                   num_workers=num_workers):
            if args.dp > 1:
                # one scene micro-batch per device, padded to a common bucket;
                # filler shards (batch < n_devices) get zero reduction weight.
                # Host work per step is just collate+pack (numpy); voxelize +
                # plan construction happen per-device inside the step.
                from gapro_tpu.models.prepare import (pack_point_batch_np,
                                                      points_to_batch_np)

                per_dev = [lb.scenes[d % len(lb.scenes)] for d in range(args.dp)]
                weight = jnp.asarray(
                    [1.0 if d < len(lb.scenes) else 0.0 for d in range(args.dp)],
                    jnp.float32)
                cap = max(next_bucket(len(s["xyz"])) for s in per_dev)
                bufs = np.stack([
                    pack_point_batch_np(points_to_batch_np(
                        [s], voxel_scale=dataset.voxel_cfg.scale, n_cap=cap))
                    for s in per_dev
                ])
                state, losses = step_fn(state, jnp.asarray(bufs),
                                        jnp.float32(lr), weight)
            else:
                prepared = prepare(lb.points, lb.batch_size)
                state, losses = step_fn(state, prepared, jnp.float32(lr))
            for k, v in losses.items():
                meters[k] = meters.get(k, 0.0) + float(v)
            n_iter += 1
            if args.profile:
                prof_steps += 1
                if prof_steps == args.profile:
                    jax.block_until_ready(losses)
                    prof.close()
                    mem = profiling.device_memory_stats()
                    if mem:
                        log.info("device memory: %.0f MiB in use, %.0f MiB peak",
                                 mem["bytes_in_use"] / 2**20,
                                 mem["peak_bytes_in_use"] / 2**20)
        dt = time.time() - t0
        means = {k: v / max(n_iter, 1) for k, v in meters.items()}
        log.info("epoch %d/%d loss %.4f lr %.2e (%.1fs, %d iters) | %s",
                 epoch, epochs, means.get("loss", 0.0), lr, dt, n_iter,
                 " ".join(f"{k} {v:.4f}" for k, v in sorted(means.items())
                          if k != "loss"))
        record = dict(epoch=epoch, lr=lr, seconds=dt, **means)

        is_best = False
        if val_dataset is not None and is_val_epoch(epoch):
            eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
            metric, detail = validate(model, eval_vars, cfg.model.type,
                                      val_dataset, cfg, log, prepare_val,
                                      max_scenes=args.val_scenes)
            record.update(detail)
            if metric > best_metric:
                best_metric = metric
                is_best = True
                log.info("new best metric %.4f at epoch %d", metric, epoch)

        metrics_f.write(json.dumps(record) + "\n")
        metrics_f.flush()
        save_checkpoint(work_dir, dict(
            params=state.params, batch_stats=state.batch_stats,
            opt_state=state.opt_state, step=state.step, epoch=epoch,
        ), epoch, save_freq=save_freq, best=is_best)
    log.info("done: %s (best metric %.4f)", work_dir, best_metric)


if __name__ == "__main__":
    main()
