"""ISBNet: kernel-based 3D instance segmentation (TPU-native).

Follows the reference architecture (ISBNet/isbnet/model/isbnet.py):
sparse U-Net backbone -> point-wise heads (semantic / box-corner offsets /
box conf) -> background filtering via superpoint-pooled semantics -> 2-stage
local aggregator producing instance queries -> query MLP heads
(cls/conf/box) + controller -> dynamic-convolution mask decoding over
superpoint-pooled features, with mu/logvar heads for the GP-uncertainty KL
loss.

TPU redesign highlights:
  * everything static-shape: voxels padded to capacity, superpoints to a
    static cap, queries fixed; validity masks everywhere;
  * dynamic conv is one batched einsum over dense [B, S] superpoints
    (reference loops per batch item and chunks, isbnet.py:783-826);
  * the backbone consumes a precomputed UNetPlan (rulebooks built once).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.batching import flat_to_dense_index, gather_dense
from ..core.segment import segment_max, segment_mean
from ..sparse.plan import UNetPlan
from ..sparse.unet import SparseUNetBackbone
from .aggregator import LocalAggregator
from .common import MLP, ConvBlock1d, GenericMLP
from .dyco import dyco_mlp


@dataclass(frozen=True)
class ISBNetConfig:
    channels: int = 32
    num_blocks: int = 7
    instance_classes: int = 18
    semantic_classes: int = 19
    with_coords: bool = True
    semantic_only: bool = False
    mask_dim_out: int = 32
    dec_dim: int = 128
    n_sample_pa1: int = 2048
    n_queries: int = 256
    radius_scale: float = 1.0
    neighbor: int = 32
    filter_bg_thresh: float = 0.1
    use_spp_pool: bool = True
    # frozen modules for stage-2 training (reference fixed_modules,
    # isbnet.py:168-176 + boxsup_isbnet_scannetv2.yaml:29). Accepts the
    # reference names; input_conv/unet/output_layer all map to our single
    # `backbone` module. Frozen modules run with train=False (BatchNorm in
    # eval mode, the parity trap at isbnet.py:219-225) and their outputs are
    # stop_gradient-ed; the optimizer additionally zeroes their updates
    # (train/state.py create_train_state).
    fixed_modules: tuple = ()
    # static capacity knobs
    spp_cap: int = 4096  # max superpoints per batch-item (dense S axis)
    # dense foreground-voxel axis = voxel capacity * ratio. The aggregator's
    # FPS/ballquery/gathers all scale with this capacity; overflow beyond
    # the cap excludes voxels from being query CENTERS (still segmented
    # via superpoint masks), logged as ovf_fg_voxels. With the Pallas FPS
    # + window-conv kernels, ratio 1.0 costs only +34 ms on the full
    # forward (359 vs 325 ms at 262k voxels, docs/PERF.md) - the round-1
    # accuracy/speed trade (where it saved ~330 ms) is gone, so default to
    # the exact setting.
    fg_cap_ratio: float = 1.0


import flax.struct


@flax.struct.dataclass
class VoxelBatch:
    """Voxel-level model inputs (all static shapes).

    feats: [V, 3] rgb; coords_float: [V, 3]; batch_idx/valid: [V];
    spp: [V] compact global superpoint ids (-1 invalid); plan: UNetPlan.
    """

    feats: jax.Array
    coords_float: jax.Array
    batch_idx: jax.Array
    valid: jax.Array
    spp: jax.Array
    plan: Any
    batch_size: int = flax.struct.field(pytree_node=False)
    n_spp: int = flax.struct.field(pytree_node=False)  # static global spp capacity
    # [V] member-point count per voxel (0 for padding). SPFormer's
    # point-resolution superpoint pooling weights voxel means by this
    # (reference devoxelizes then pools points, spformer.py:250-262);
    # None falls back to uniform (voxel-resolution) weighting.
    vox_npoints: Optional[jax.Array] = None


class ISBNet(nn.Module):
    cfg: ISBNetConfig = field(default_factory=ISBNetConfig)

    def setup(self):
        c = self.cfg.channels
        self.backbone = SparseUNetBackbone(
            channels=c,
            num_blocks=self.cfg.num_blocks,
            in_channels=6 if self.cfg.with_coords else 3,
            name="backbone",
        )
        self.semantic_linear = MLP(self.cfg.semantic_classes, num_layers=2, name="semantic_linear")
        self.offset_vertices_linear = MLP(6, num_layers=2, name="offset_vertices_linear")
        self.box_conf_linear = MLP(1, num_layers=2, name="box_conf_linear")

        if not self.cfg.semantic_only:
            self.mu_linear = MLP(1, num_layers=3, name="mu_linear")
            self.logvar_linear = MLP(1, num_layers=3, name="logvar_linear")
            rs = self.cfg.radius_scale
            self.point_aggregator1 = LocalAggregator(
                mlp_dim=c,
                n_sample=self.cfg.n_sample_pa1,
                radius=0.2 * rs,
                n_neighbor=self.cfg.neighbor,
                n_neighbor_post=self.cfg.neighbor * 2,
                name="point_aggregator1",
            )
            self.point_aggregator2 = LocalAggregator(
                mlp_dim=c * 2,
                n_sample=self.cfg.n_queries,
                radius=0.4 * rs,
                n_neighbor=self.cfg.neighbor,
                n_neighbor_post=self.cfg.neighbor,
                name="point_aggregator2",
            )
            dd = self.cfg.dec_dim
            self.inst_shared_mlp = GenericMLP(
                (c * 4,), dd, hidden_use_bias=False, output_use_activation=True,
                output_use_norm=True, name="inst_shared_mlp",
            )
            self.inst_sem_head = GenericMLP(
                (dd, dd), self.cfg.instance_classes + 1, name="inst_sem_head"
            )
            self.inst_conf_head = GenericMLP((dd, dd), 1, name="inst_conf_head")
            self.inst_box_head = GenericMLP((dd, dd), 6, name="inst_box_head")

            m = self.cfg.mask_dim_out
            self.mask_tower = [
                ConvBlock1d(c, name="mask_tower0"),
                ConvBlock1d(c, name="mask_tower1"),
                ConvBlock1d(c, name="mask_tower2"),
            ]
            self.mask_out = nn.Dense(m, name="mask_out")

            self.weight_nums = [(m + 6) * m, m * (m // 2), (m // 2) * 1]
            self.bias_nums = [m, m // 2, 1]
            num_gen = sum(self.weight_nums) + sum(self.bias_nums)
            self.inst_mask_head = [
                ConvBlock1d(dd, name="inst_mask_head0"),
                ConvBlock1d(dd, name="inst_mask_head1"),
            ]
            self.controller = nn.Dense(
                num_gen,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.zeros,
                name="controller",
            )

    # ------------------------------------------------------------------ #

    def _frozen(self, *names) -> bool:
        fixed = frozenset(self.cfg.fixed_modules)
        return bool(fixed & set(names))

    def _gate(self, x, frozen: bool):
        return jax.lax.stop_gradient(x) if frozen else x

    def pointwise_head(self, feats, valid, train):
        fz_sem = self._frozen("semantic_linear")
        fz_off = self._frozen("offset_vertices_linear", "offset_linear")
        fz_conf = self._frozen("box_conf_linear")
        sem = self._gate(
            self.semantic_linear(feats, valid=valid, train=train and not fz_sem), fz_sem)
        corners = self._gate(
            self.offset_vertices_linear(feats, valid=valid, train=train and not fz_off),
            fz_off)
        conf = self._gate(
            self.box_conf_linear(feats, valid=valid, train=train and not fz_conf),
            fz_conf)[..., 0]
        return sem, corners, conf

    def run_mask_tower(self, x, valid, train):
        for blk in self.mask_tower:
            x = blk(x, valid=valid, train=train)
        x = self.mask_out(x)
        return jnp.where(valid[..., None], x, 0.0)

    def dynamic_mask_head(self, controllers, queries_locs, queries_boxes, sp_mask_feats,
                          sp_coords, sp_boxes, sp_valid):
        """Batched dynamic conv (reference parse_dynamic_params +
        mask_heads_forward, isbnet.py:834-885).

        controllers: [B, Q, P]; queries_locs/boxes: [B, Q, 3/6];
        sp_* dense superpoint arrays [B, S, *].
        Returns mask_logits [B, Q, S].
        """
        m = self.cfg.mask_dim_out
        wn, bn_ = self.weight_nums, self.bias_nums
        splits = []
        off = 0
        for nsz in wn + bn_:
            splits.append(controllers[..., off : off + nsz])
            off += nsz
        w0 = splits[0].reshape(*splits[0].shape[:2], m + 6, m)
        w1 = splits[1].reshape(*splits[1].shape[:2], m, m // 2)
        w2 = splits[2].reshape(*splits[2].shape[:2], m // 2, 1)
        b0, b1 = splits[3], splits[4]  # [B, Q, m], [B, Q, m//2]; last layer no bias

        qdims = queries_boxes[..., 3:] - queries_boxes[..., :3]
        sdims = sp_boxes[..., 3:] - sp_boxes[..., :3]
        # fused 3-layer MLP: Pallas kernel on TPU, batched einsums elsewhere
        # (models/dyco.py; the XLA path keeps the first-layer einsum split)
        return dyco_mlp(w0, w1, w2, b0, b1, queries_locs, qdims,
                        sp_mask_feats, sp_coords, sdims, sp_valid)

    def query_heads(self, query_feats, q_valid, train):
        qf = self.inst_shared_mlp(query_feats, valid=q_valid, train=train)
        cls_logits = self.inst_sem_head(qf, valid=q_valid, train=train)
        conf_logits = self.inst_conf_head(qf, valid=q_valid, train=train)[..., 0]
        box_offsets = self.inst_box_head(qf, valid=q_valid, train=train)
        x = qf
        for blk in self.inst_mask_head:
            x = blk(x, valid=q_valid, train=train)
        controllers = self.controller(x)
        return cls_logits, conf_logits, box_offsets, controllers

    # ------------------------------------------------------------------ #

    def run_queries(self, agg2, d_sp_mask_feats, d_sp_coords, d_sp_boxes,
                    sp_dense_valid, train):
        """Query heads + dynamic-conv mask decoding for one query set."""
        cls_logits, conf_logits, box_offsets, controllers = self.query_heads(
            agg2.feats, agg2.valid, train
        )
        query_box_preds = box_offsets + jnp.tile(agg2.locs, (1, 1, 2))
        mask_logits = self.dynamic_mask_head(
            controllers, agg2.locs, query_box_preds,
            d_sp_mask_feats, d_sp_coords, d_sp_boxes, sp_dense_valid,
        )
        return cls_logits, conf_logits, query_box_preds, mask_logits

    def trunk(self, batch: VoxelBatch, train: bool, feats: Optional[jax.Array] = None):
        """Backbone -> pointwise heads -> bg filter -> spp pooling -> dense
        views -> stage-1 aggregator. Shared by the train and inference paths
        (reference forward_train isbnet.py:233-436 / forward_test :448-661).
        `feats` skips the backbone (x4_split merge path)."""
        cfg = self.cfg
        B = batch.batch_size
        V = batch.feats.shape[0]
        S = batch.n_spp

        if feats is None:
            in_feats = batch.feats
            if cfg.with_coords:
                in_feats = jnp.concatenate([in_feats, batch.coords_float], axis=1)
            fz_bb = self._frozen("backbone", "input_conv", "unet", "output_layer")
            feats = self._gate(
                self.backbone(in_feats, batch.plan, train and not fz_bb), fz_bb
            )  # [V, C]
        sem_scores, corners_offset, box_conf = self.pointwise_head(feats, batch.valid, train)
        box_preds = corners_offset + jnp.tile(batch.coords_float, (1, 2))

        out: Dict[str, jax.Array] = dict(
            semantic_scores=sem_scores,
            corners_offset=corners_offset,
            box_conf=box_conf,
            box_preds=box_preds,
            voxel_feats=feats,
        )
        if cfg.semantic_only:
            return out, None

        # ---- background filtering on superpoint-pooled semantics ----
        sem_sm = jax.nn.softmax(sem_scores, axis=1)
        spp_sem = segment_mean(sem_sm, batch.spp, S)  # [S, classes]
        spp_fg = jnp.any(spp_sem[:, :-1] >= cfg.filter_bg_thresh, axis=-1)
        fg_mask = spp_fg[jnp.maximum(batch.spp, 0)] & batch.valid  # [V]

        # ---- superpoint pooling (dyco domain) ----
        sp_coords = segment_mean(batch.coords_float, batch.spp, S)
        sp_feats = segment_mean(feats, batch.spp, S)
        sp_boxes = segment_mean(box_preds, batch.spp, S)
        sp_batch = segment_max(
            jnp.where(batch.valid, batch.batch_idx, -1), batch.spp, S
        )
        sp_valid = sp_batch >= 0

        sp_mask_feats = self.run_mask_tower(sp_feats, sp_valid, train)
        mu_pred = self.mu_linear(sp_feats, valid=sp_valid, train=train)[..., 0]
        logvar_pred = self.logvar_linear(sp_feats, valid=sp_valid, train=train)[..., 0]

        # dense superpoint views per batch item
        _, sp_dense_idx, sp_dense_valid = flat_to_dense_index(
            jnp.maximum(sp_batch, 0), sp_valid, B, cfg.spp_cap
        )
        d_sp_coords = gather_dense(sp_coords, sp_dense_idx)
        d_sp_boxes = gather_dense(sp_boxes, sp_dense_idx)
        d_sp_mask_feats = gather_dense(sp_mask_feats, sp_dense_idx)

        # ---- aggregator over foreground voxels (dense views) ----
        nf = int(V * cfg.fg_cap_ratio)
        _, fg_dense_idx, fg_dense_valid = flat_to_dense_index(
            batch.batch_idx, fg_mask, B, nf
        )
        d_locs = gather_dense(batch.coords_float, fg_dense_idx)
        d_feats = gather_dense(feats, fg_dense_idx)
        d_boxes = gather_dense(box_preds, fg_dense_idx)

        agg1 = self.point_aggregator1(
            d_locs, d_feats, d_boxes, fg_dense_valid, train=train, sampled_before=False
        )
        mid = dict(
            agg1=agg1,
            fg_dense_idx=fg_dense_idx,
            d_sp_coords=d_sp_coords,
            d_sp_boxes=d_sp_boxes,
            d_sp_mask_feats=d_sp_mask_feats,
        )
        # overflow counters ("no silent caps"): foreground voxels beyond the
        # fg_cap_ratio capacity, superpoints beyond spp_cap, and coarse
        # voxels dropped by the U-Net level capacities
        ovf_fg = (jnp.sum(fg_mask.astype(jnp.int32))
                  - jnp.sum(fg_dense_valid.astype(jnp.int32)))
        ovf_spp = (jnp.sum(sp_valid.astype(jnp.int32))
                   - jnp.sum(sp_dense_valid.astype(jnp.int32)))
        ovf_plan = sum(
            (lvl.dropped_next for lvl in batch.plan.levels
             if lvl.dropped_next is not None),
            jnp.zeros((), jnp.int32),
        )
        # window-kernel escapee entries beyond esc_cap silently corrupt conv
        # outputs — surface them like every other cap (ADVICE r2)
        ovf_esc = sum(
            (lvl.wtab.esc_overflow for lvl in batch.plan.levels
             if lvl.wtab is not None),
            jnp.zeros((), jnp.int32),
        )
        out.update(
            ovf_fg_voxels=ovf_fg,
            ovf_spp_slots=ovf_spp,
            ovf_plan_voxels=ovf_plan,
            ovf_window_escapees=ovf_esc,
            mu_pred=mu_pred,
            logvar_pred=logvar_pred,
            sp_dense_idx=sp_dense_idx,
            sp_dense_valid=sp_dense_valid,
            sp_valid=sp_valid,
            sp_coords=sp_coords,
            sp_coords_dense=d_sp_coords,
            sp_batch=sp_batch,
            fg_mask=fg_mask,
            agg1_inds=agg1.inds,
            agg1_valid=agg1.valid,
        )
        return out, mid

    def __call__(self, batch: VoxelBatch, train: bool = False) -> Dict[str, jax.Array]:
        out, mid = self.trunk(batch, train)
        if self.cfg.semantic_only:
            return out

        agg1 = mid["agg1"]
        agg2 = self.point_aggregator2(
            agg1.locs, agg1.feats, agg1.boxes, agg1.valid, train=train, sampled_before=True
        )
        cls_logits, conf_logits, query_box_preds, mask_logits = self.run_queries(
            agg2, mid["d_sp_mask_feats"], mid["d_sp_coords"], mid["d_sp_boxes"],
            out["sp_dense_valid"], train,
        )
        out.update(
            cls_logits=cls_logits,
            conf_logits=conf_logits,
            query_box_preds=query_box_preds,
            query_valid=agg2.valid,
            mask_logits=mask_logits,
        )
        return out

    def forward_inference(
        self, batch: VoxelBatch, n_sample_arr: Tuple[int, ...] = (192, 128, 64),
        x4_split: bool = False,
    ) -> Dict[str, jax.Array]:
        """Inference with iterative sampling (reference forward_test
        isbnet.py:572-635): rounds of FPS with shrinking sample counts,
        masking out stage-1 candidates already covered by a predicted mask.

        `x4_split` (S3DIS huge scenes, isbnet.py:703-722): the collate packs
        4 interleaved scene pieces as batch items; the backbone runs them
        independently along the batch axis (rulebooks never cross batch
        ids), then the downstream heads see one merged scene (batch 0).

        Returns concatenated proposals over rounds:
          cls_logits [B, P, C+1], conf_logits [B, P], mask_logits [B, P, S],
          box_preds [B, P, 6], proposal_valid [B, P]  (P = sum(n_sample_arr))
        plus the trunk outputs (semantic_scores, sp_* ...).
        """
        if x4_split:
            in_feats = batch.feats
            if self.cfg.with_coords:
                in_feats = jnp.concatenate([in_feats, batch.coords_float], axis=1)
            feats = self.backbone(in_feats, batch.plan, False)
            merged = batch.replace(
                batch_idx=jnp.zeros_like(batch.batch_idx), batch_size=1
            )
            out, mid = self.trunk(merged, False, feats=feats)
            batch = merged
        else:
            out, mid = self.trunk(batch, False)
        agg1 = mid["agg1"]
        B, N1 = agg1.valid.shape
        S = self.cfg.spp_cap

        # dense spp slot of each stage-1 candidate (for visited masking):
        # candidate -> fg-dense row -> flat voxel -> flat spp id -> dense slot
        flat_vox = jnp.take_along_axis(mid["fg_dense_idx"], agg1.inds, axis=1)  # [B, N1]
        q1_spp = batch.spp[jnp.maximum(flat_vox, 0)]  # flat spp ids
        slot_of = jnp.full((batch.n_spp,), -1, jnp.int32)
        slot_of = slot_of.at[
            jnp.where(out["sp_dense_valid"], out["sp_dense_idx"], batch.n_spp)
        ].set(
            jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1)), mode="drop"
        )
        q1_slot = slot_of[jnp.maximum(q1_spp, 0)]  # [B, N1] dense slot or -1
        q1_slot_safe = jnp.maximum(q1_slot, 0)

        valid1 = agg1.valid
        cls_l, conf_l, mask_l, box_l, valid_l = [], [], [], [], []
        for r in n_sample_arr:
            agg2 = self.point_aggregator2(
                agg1.locs, agg1.feats, agg1.boxes, valid1,
                train=False, sampled_before=False, n_sample=r,
            )
            cls_r, conf_r, box_r, mask_r = self.run_queries(
                agg2, mid["d_sp_mask_feats"], mid["d_sp_coords"], mid["d_sp_boxes"],
                out["sp_dense_valid"], False,
            )
            cls_l.append(cls_r)
            conf_l.append(conf_r)
            mask_l.append(mask_r)
            box_l.append(box_r)
            valid_l.append(agg2.valid)

            # visited: candidate's superpoint covered by any round-r mask
            pos = (mask_r > 0) & agg2.valid[..., None]  # [B, r, S]
            covered = jnp.any(pos, axis=1)  # [B, S]
            hit = jnp.take_along_axis(covered, q1_slot_safe, axis=1) & (q1_slot >= 0)
            valid1 = valid1 & ~hit

        out.update(
            cls_logits=jnp.concatenate(cls_l, axis=1),
            conf_logits=jnp.concatenate(conf_l, axis=1),
            mask_logits=jnp.concatenate(mask_l, axis=1),
            query_box_preds=jnp.concatenate(box_l, axis=1),
            query_valid=jnp.concatenate(valid_l, axis=1),
        )
        return out
