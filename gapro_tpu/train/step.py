"""Train steps: single-chip jit and data-parallel shard_map.

The reference trains with DDP + NCCL gradient all-reduce
(ISBNet/tools/train.py:300-303, isbnet/util/dist.py:24-30).  TPU-native
equivalent: one `jax.sharding.Mesh` over the chips, each device computes the
forward/backward on its own scene batch (leading `dp` axis), gradients and
BatchNorm statistics are `psum`-averaged over the mesh by XLA collectives
inside `shard_map` — no custom comm layer.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collections import namedtuple

from ..losses.criterion import (CriterionConfig, build_targets,
                                corner_labels_only, isbnet_loss)

_PointwiseTargets = namedtuple(
    "_PointwiseTargets", ["corners_offset_labels", "n_inst_overflow_voxels"],
    defaults=[0])


def _loss_fn(params, batch_stats, model, prepared, crit_cfg, train=True):
    variables = {"params": params, "batch_stats": batch_stats}
    outputs, mutated = model.apply(
        variables, prepared.batch, train, mutable=["batch_stats"]
    )
    if crit_cfg.semantic_only:
        # backbone-pretrain stage: no decoder outputs; only the pointwise
        # targets exist (reference --only_backbone)
        corners = corner_labels_only(
            prepared.voxel_instance, prepared.batch.coords_float,
            prepared.batch.valid, crit_cfg.inst_cap)
        losses = isbnet_loss(
            outputs, prepared,
            _PointwiseTargets(corners_offset_labels=corners), crit_cfg)
        return losses["loss"], (losses, mutated["batch_stats"])
    targets = build_targets(
        prepared.voxel_instance,
        prepared.voxel_semantic,
        prepared.batch.coords_float,
        prepared.batch.spp,
        prepared.batch.batch_idx,
        prepared.batch.valid,
        outputs["sp_dense_idx"],
        prepared.batch.n_spp,
        crit_cfg.inst_cap,
        voxel_prob=prepared.voxel_prob,
        voxel_mu=prepared.voxel_mu,
        voxel_var=prepared.voxel_var,
        voxel_rgb=prepared.voxel_rgb,
    )
    losses = isbnet_loss(outputs, prepared, targets, crit_cfg)
    return losses["loss"], (losses, mutated["batch_stats"])


def make_train_step(model, crit_cfg: CriterionConfig) -> Callable:
    """Single-device jitted train step: (state, prepared, lr) -> (state, losses)."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, prepared, lr):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, model, prepared, crit_cfg
        )
        state = state.apply_gradients(grads, new_batch_stats=new_bs, lr=lr)
        return state, losses

    return step


def _spformer_loss_fn(params, batch_stats, model, prepared, crit_cfg, train=True):
    from ..losses.spformer_criterion import spformer_loss

    variables = {"params": params, "batch_stats": batch_stats}
    outputs, mutated = model.apply(
        variables, prepared.batch, train, mutable=["batch_stats"]
    )
    targets = build_targets(
        prepared.voxel_instance,
        prepared.voxel_semantic,
        prepared.batch.coords_float,
        prepared.batch.spp,
        prepared.batch.batch_idx,
        prepared.batch.valid,
        outputs["sp_dense_idx"],
        prepared.batch.n_spp,
        crit_cfg.inst_cap,
        voxel_prob=prepared.voxel_prob,
        voxel_mu=prepared.voxel_mu,
        voxel_var=prepared.voxel_var,
        voxel_rgb=prepared.voxel_rgb,
        # point-resolution label pooling, matching the model's extract_feat
        # (reference pools devoxelized points, spformer.py:250-275)
        vox_weights=prepared.batch.vox_npoints,
        pool=model.cfg.pool,
    )
    losses = spformer_loss(outputs, targets, crit_cfg)
    return losses["loss"], (losses, mutated["batch_stats"])


def make_spformer_train_step(model, crit_cfg) -> Callable:
    """Single-device jitted SPFormer train step (mirrors make_train_step)."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, prepared, lr):
        grad_fn = jax.value_and_grad(_spformer_loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, model, prepared, crit_cfg
        )
        state = state.apply_gradients(grads, new_batch_stats=new_bs, lr=lr)
        return state, losses

    return step


def make_dp_train_step(model, crit_cfg: CriterionConfig, mesh: Mesh,
                       loss_fn=_loss_fn, prepare_fn=None) -> Callable:
    """Data-parallel train step over `mesh` axis 'dp'.

    `prepared` must be a pytree whose arrays have a leading dp axis equal to
    mesh size (one scene micro-batch per device).  Params/opt-state are
    replicated; gradients and BN stats are psum-averaged (DDP semantics).

    `weight` ([ndev] float32, 1.0 real / 0.0 filler) excludes padding shards
    from the reductions: when the last batch has fewer scenes than devices
    the trainer replicates a scene to fill the mesh, and an unweighted pmean
    would count the duplicate as an independent sample.

    `prepare_fn` (optional): device-side (packed point buffer [N, 17] ->
    PreparedBatch).  When given, the step takes a stacked [ndev, N, 17]
    buffer instead of pre-built PreparedBatch shards, and voxelize + U-Net
    plan construction run INSIDE the shard_map program — each device builds
    its own rulebooks in parallel, replacing the host-serial per-device
    prepare() loop that scaled step time with device count (VERDICT r2 #7).
    """

    def per_device(state, prepared, lr, w):
        if prepare_fn is not None:
            prepared = prepare_fn(prepared)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, model, prepared, crit_cfg
        )
        wsum = jnp.maximum(jax.lax.psum(w, "dp"), 1e-6)
        wmean = lambda t: jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a * w, "dp") / wsum, t
        )
        grads = wmean(grads)
        new_bs = wmean(new_bs)
        losses = wmean(losses)
        state = state.apply_gradients(grads, new_batch_stats=new_bs, lr=lr)
        return state, losses

    import inspect

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def squeeze0(x):
        # shard_map hands each device a [1, ...] shard; drop the dp axis
        return jax.tree_util.tree_map(lambda a: a[0], x)

    def per_device_wrap(state, shard, lr, weight):
        return per_device(state, squeeze0(shard), lr, weight[0])

    params = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in params else {"check_rep": False}
    fn = shard_map(
        per_device_wrap,
        mesh=mesh,
        in_specs=(P(), P("dp"), P(), P("dp")),
        out_specs=(P(), P()),
        **check_kw,
    )
    jitted = jax.jit(fn, donate_argnums=(0,))

    ndev = mesh.devices.size

    def step(state, prepared, lr, weight=None):
        if weight is None:
            weight = jnp.ones((ndev,), jnp.float32)
        return jitted(state, prepared, lr, weight)

    return step
