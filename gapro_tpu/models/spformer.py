"""SPFormer: superpoint transformer for 3D instance segmentation (TPU-native).

Reference: SPFormer/spformer/model/spformer.py:18-280 and
query_decoder.py:5-224. Sparse U-Net backbone -> superpoint mean pooling ->
DETR-style decoder: 400 learned queries, 6 x (masked cross-attention over
superpoints -> self-attention -> FFN) with per-layer prediction heads
(iter_pred) and mu/logvar heads for the GP-uncertainty KL loss.

TPU redesign:
  * superpoints live in dense padded [B, S, C] with validity masks — the
    decoder is ONE batched attention per layer instead of the reference's
    python loop over batch items (query_decoder.py:29-42);
  * the sigmoid(mask)<0.5 attention mask is a boolean bias on the batched
    attention, with the all-masked-row escape hatch (query_decoder.py:151);
  * faithful quirk: the reference CrossAttentionLayer discards its LayerNorm
    and dropout results (query_decoder.py:39-41 — `self.norm(output)` is
    unassigned), so cross-attn here is exactly `attn(q,k,v) + q`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.batching import flat_to_dense_index, gather_dense
from ..core.segment import segment_max, segment_weighted_mean
from ..sparse.unet import SparseUNetBackbone
from .common import MLP
from .isbnet import VoxelBatch


@dataclass(frozen=True)
class SPFormerConfig:
    media: int = 32
    blocks: int = 5
    num_class: int = 18
    num_layer: int = 6
    num_query: int = 400
    d_model: int = 256
    nhead: int = 8
    hidden_dim: int = 1024
    activation: str = "gelu"
    iter_pred: bool = True
    attn_mask: bool = True
    with_coords: bool = True
    # superpoint pooling mode (reference spformer.py:27,257-275): "mean"
    # pools POINTS into superpoints — realized here as the per-voxel mean
    # weighted by member-point count (vox_npoints), algebraically the
    # point-level scatter_mean since every point carries its voxel's
    # devoxelized feature; "max" is exactly the voxel-level max (duplicated
    # per-point values never change a max).
    pool: str = "mean"
    spp_cap: int = 4096
    # frozen modules (reference fix_module + norm_eval,
    # SPFormer/configs/boxsup_spf_scannet.yaml:100-101); backbone names run
    # with train=False (BN eval) + stop_gradient when frozen
    fixed_modules: tuple = ()


class CrossAttention(nn.Module):
    """Masked cross-attention, residual only (reference discards its norm)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, query, source, attn_bias):
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, out_features=self.d_model,
        )(query, source, source, mask=attn_bias)
        return out + query


class SelfAttention(nn.Module):
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x):
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, out_features=self.d_model,
        )(x, x, x)
        return nn.LayerNorm()(out + x)


class FFN(nn.Module):
    d_model: int
    hidden_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        if self.activation == "gelu":
            # torch nn.GELU is exact erf; flax defaults to tanh approx
            act = lambda v: nn.gelu(v, approximate=False)
        else:
            act = nn.relu
        h = nn.Dense(self.hidden_dim)(x)
        h = nn.Dense(self.d_model)(act(h))
        return nn.LayerNorm()(h + x)


class QueryDecoder(nn.Module):
    """Iterative-prediction decoder (query_decoder.py:101-224)."""

    cfg: SPFormerConfig

    @nn.compact
    def __call__(self, sp_feats, sp_valid):
        """sp_feats [B, S, media], sp_valid [B, S] ->
        {labels [L+1, B, Q, C+1], scores [L+1, B, Q], masks [L+1, B, Q, S]}

        Submodule names mirror the reference QueryDecoder tree
        (query_decoder.py:124-138) so torch checkpoints map 1:1 in
        tools/convert_torch_ckpt.py::convert_spformer_state_dict.
        """
        c = self.cfg
        B, S, _ = sp_feats.shape

        ip_dense = nn.Dense(c.d_model, name="input_proj_dense")
        ip_norm = nn.LayerNorm(name="input_proj_norm")
        inst_feats = nn.relu(ip_norm(ip_dense(sp_feats)))
        xm0 = nn.Dense(c.d_model, name="x_mask_0")
        xm1 = nn.Dense(c.d_model, name="x_mask_1")
        mask_feats = xm1(nn.relu(xm0(sp_feats)))

        query0 = self.param(
            "query", nn.initializers.normal(1.0), (c.num_query, c.d_model)
        )
        query = jnp.tile(query0[None], (B, 1, 1))

        out_norm = nn.LayerNorm(name="out_norm")
        cls0 = nn.Dense(c.d_model, name="out_cls_0")
        cls1 = nn.Dense(c.num_class + 1, name="out_cls_1")
        score0 = nn.Dense(c.d_model, name="out_score_0")
        score1 = nn.Dense(1, name="out_score_1")
        out_cls = lambda q: cls1(nn.relu(cls0(q)))
        out_score = lambda q: score1(nn.relu(score0(q)))

        key_valid = sp_valid[:, None, None, :]  # [B, 1, 1, S]

        def head(q):
            qn = out_norm(q)
            labels = out_cls(qn)
            scores = out_score(qn)[..., 0]
            masks = jnp.einsum("bqd,bsd->bqs", qn, mask_feats)
            if c.attn_mask:
                am = jax.nn.sigmoid(masks) >= 0.5  # True = attend
                # rows with nothing to attend to fall back to everything
                empty = ~jnp.any(am & sp_valid[:, None, :], axis=-1, keepdims=True)
                am = jax.lax.stop_gradient(am | empty)
                bias = am[:, None, :, :] & key_valid
            else:
                bias = jnp.broadcast_to(key_valid, (B, 1, masks.shape[1], S))
            return labels, scores, masks, bias

        labels_l, scores_l, masks_l = [], [], []
        lab, sc, mk, bias = head(query)
        labels_l, scores_l, masks_l = [lab], [sc], [mk]
        for i in range(c.num_layer):
            query = CrossAttention(c.d_model, c.nhead, name=f"cross{i}")(
                query, inst_feats, bias
            )
            query = SelfAttention(c.d_model, c.nhead, name=f"self{i}")(query)
            query = FFN(c.d_model, c.hidden_dim, c.activation, name=f"ffn{i}")(query)
            lab, sc, mk, bias = head(query)
            labels_l.append(lab)
            scores_l.append(sc)
            masks_l.append(mk)

        return dict(
            labels=jnp.stack(labels_l),  # [L+1, B, Q, C+1]
            scores=jnp.stack(scores_l),  # [L+1, B, Q]
            masks=jnp.stack(masks_l),  # [L+1, B, Q, S]
        )


class SPFormer(nn.Module):
    cfg: SPFormerConfig = field(default_factory=SPFormerConfig)

    def setup(self):
        c = self.cfg
        self.backbone = SparseUNetBackbone(
            channels=c.media,
            num_blocks=c.blocks,
            in_channels=6 if c.with_coords else 3,
            name="backbone",
        )
        self.mu_linear = MLP(1, num_layers=3, name="mu_linear")
        self.logvar_linear = MLP(1, num_layers=3, name="logvar_linear")
        self.decoder = QueryDecoder(c, name="decoder")

    def __call__(self, batch: VoxelBatch, train: bool = False) -> Dict[str, jax.Array]:
        """Voxel batch -> per-layer decoder outputs + spp-level heads.

        Superpoint pooling matches the reference's POINT resolution
        (spformer.py:250-262 devoxelizes then scatter_means points): each
        voxel's feature enters the superpoint mean weighted by its member
        point count (batch.vox_npoints), which equals the per-point mean of
        devoxelized (duplicated per point) voxel features. pool="max"
        (spformer.py:267-275) is weight-free.
        """
        c = self.cfg
        B = batch.batch_size
        S = batch.n_spp

        in_feats = batch.feats
        if c.with_coords:
            in_feats = jnp.concatenate([in_feats, batch.coords_float], axis=1)
        fz_bb = bool(frozenset(self.cfg.fixed_modules)
                     & {"backbone", "input_conv", "unet", "output_layer"})
        feats = self.backbone(in_feats, batch.plan, train and not fz_bb)  # [V, media]
        if fz_bb:
            feats = jax.lax.stop_gradient(feats)

        if c.pool == "max":
            neg = jnp.float32(-1e10)
            sp_feats = segment_max(
                jnp.where(batch.valid[:, None], feats, neg), batch.spp, S
            )
            sp_feats = jnp.where(sp_feats <= neg, 0.0, sp_feats)
        else:
            w = batch.vox_npoints
            if w is None:
                w = jnp.ones(feats.shape[:1], jnp.float32)
            sp_feats = segment_weighted_mean(feats, batch.spp, w, S)  # [S, media]
        sp_batch = segment_max(
            jnp.where(batch.valid, batch.batch_idx, -1), batch.spp, S
        )
        sp_valid_flat = sp_batch >= 0

        mu_pred = self.mu_linear(sp_feats, valid=sp_valid_flat, train=train)[..., 0]
        logvar_pred = self.logvar_linear(sp_feats, valid=sp_valid_flat, train=train)[..., 0]

        _, sp_dense_idx, sp_dense_valid = flat_to_dense_index(
            jnp.maximum(sp_batch, 0), sp_valid_flat, B, c.spp_cap
        )
        d_sp_feats = gather_dense(sp_feats, sp_dense_idx)  # [B, S_cap, media]
        if c.pool == "max":
            neg = jnp.float32(-1e10)
            sp_coords = segment_max(
                jnp.where(batch.valid[:, None], batch.coords_float, neg),
                batch.spp, S,
            )
            sp_coords = jnp.where(sp_coords <= neg, 0.0, sp_coords)
        else:
            sp_coords = segment_weighted_mean(batch.coords_float, batch.spp, w, S)
        d_sp_coords = gather_dense(sp_coords, sp_dense_idx)

        dec = self.decoder(d_sp_feats, sp_dense_valid)
        ovf_spp = (jnp.sum(sp_valid_flat.astype(jnp.int32))
                   - jnp.sum(sp_dense_valid.astype(jnp.int32)))
        ovf_plan = sum(
            (lvl.dropped_next for lvl in batch.plan.levels
             if lvl.dropped_next is not None),
            jnp.zeros((), jnp.int32),
        )
        ovf_esc = sum(
            (lvl.wtab.esc_overflow for lvl in batch.plan.levels
             if lvl.wtab is not None),
            jnp.zeros((), jnp.int32),
        )
        return dict(
            ovf_spp_slots=ovf_spp,
            ovf_plan_voxels=ovf_plan,
            ovf_window_escapees=ovf_esc,
            labels=dec["labels"],
            scores=dec["scores"],
            masks=dec["masks"],
            mu_pred=mu_pred,
            logvar_pred=logvar_pred,
            sp_dense_idx=sp_dense_idx,
            sp_dense_valid=sp_dense_valid,
            sp_valid=sp_valid_flat,
            sp_batch=sp_batch,
            sp_coords_dense=d_sp_coords,
            voxel_feats=feats,
        )
