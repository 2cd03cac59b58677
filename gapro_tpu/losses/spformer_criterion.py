"""SPFormer training criterion (uncertainty-aware, GaPro losses).

Pure-JAX reimplementation of SPFormer/spformer/model/loss.py:226-556:
per decoder layer (iter_pred aux outputs included): Hungarian matching with
cost = 0.5*cls + 1*bce + 1*dice (loss.py:179-222), then
  * CE over all queries with no-object weight 0.1 (loss.py:420-430),
  * prob-weighted BCE over superpoints (GaPro weighting, loss.py:464-467),
  * dice (mean over instances, summed over batch — reference quirk: dice is
    NOT divided by batch size while bce/score are, loss.py:487-489),
  * score MSE on matched pairs with IoU > 0.5 (loss.py:457-462),
  * levelset over RGB within GT boxes (loss.py:351-391),
  * KL(mu, logvar || GP mu, var) * 0.1 on the final layer only
    (loss.py:519-544).
Final loss = 0.5*cls + 1*bce + 1*dice + 0.5*score + 0.2*levelset + kl.

All terms are masked static-shape reductions over [B, Q, S]/[B, I] tensors.
Targets come from :func:`gapro_tpu.losses.criterion.build_targets` (shared
with ISBNet).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ..core.batching import gather_dense
from .criterion import Targets, _bce_with_logits
from .matcher import bce_cost, dice_cost, lsap


@dataclass(frozen=True)
class SPFormerCriterionConfig:
    num_class: int = 18
    non_object_weight: float = 0.1
    loss_weight: tuple = (0.5, 1.0, 1.0, 0.5, 0.2)  # cls, bce, dice, score, levelset
    cost_weight: tuple = (0.5, 1.0, 1.0)  # cls, bce, dice
    kl_weight: float = 0.1
    inst_cap: int = 128


def spformer_match(cls_logits, mask_logits, gt_cls, gt_masks, gt_valid,
                   sp_valid, cfg: SPFormerCriterionConfig):
    """[B, Q, C+1] x [B, Q, S] vs dense GT -> assignment [B, I] (-1 invalid)."""
    wc, wb, wd = cfg.cost_weight

    def one(cl, ml, gc, gm, gv, sv):
        svf = sv.astype(jnp.float32)
        d = dice_cost(ml, gm, svf)
        b = bce_cost(ml, gm, svf)
        sm = jax.nn.softmax(cl, axis=-1)
        cls_c = -sm[:, jnp.maximum(gc, 0)]
        cost = wc * cls_c + wb * b + wd * d
        cost = jnp.where(jnp.isfinite(cost), cost, 1e5)
        return jnp.where(gv[None, :], cost, 1e5)

    costs = jax.vmap(one)(cls_logits, mask_logits, gt_cls, gt_masks, gt_valid, sp_valid)
    assign = lsap(jax.lax.stop_gradient(costs))
    return jnp.where(gt_valid, assign, -1)


def _layer_loss(cls_logits, scores, mask_logits, targets: Targets, sp_valid,
                sp_coords, cfg: SPFormerCriterionConfig, final: bool = True,
                assign=None):
    B, Q, _ = cls_logits.shape
    C = cfg.num_class
    if assign is None:
        assign = spformer_match(
            cls_logits, mask_logits, targets.gt_cls, targets.gt_sp_masks,
            targets.gt_valid, sp_valid, cfg,
        )
    matched = targets.gt_valid & (assign >= 0)
    a = jnp.maximum(assign, 0)

    m_logits = jnp.take_along_axis(mask_logits, a[..., None], axis=1)  # [B, I, S]
    m_scores = jnp.take_along_axis(scores, a, axis=1)  # [B, I]

    svf = sp_valid[:, None, :].astype(jnp.float32)
    mvalid = matched[..., None].astype(jnp.float32)
    gt_m = targets.gt_sp_masks
    num_gt_b = jnp.sum(matched.astype(jnp.float32), axis=1)
    batch_has = (num_gt_b > 0).astype(jnp.float32)
    nB = jnp.float32(B)

    # --- cls CE with no-object weight over ALL queries ---
    tgt_cls = jnp.full((B, Q), C, jnp.int32)
    rows = jnp.where(matched, jnp.arange(B)[:, None] + jnp.zeros_like(a), B)
    tgt_cls = tgt_cls.at[rows, jnp.where(matched, a, 0)].set(
        jnp.where(matched, jnp.clip(targets.gt_cls, 0, C - 1), C), mode="drop"
    )
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=2)[..., 0]
    w = jnp.where(tgt_cls == C, cfg.non_object_weight, 1.0)
    cls_loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)

    # --- score MSE on matched with IoU > 0.5 (loss.py:457-462) ---
    pred_bin = (jax.nn.sigmoid(m_logits) >= 0.5).astype(jnp.float32) * svf
    t = (gt_m > 0.5).astype(jnp.float32) * svf
    inter = jnp.sum(pred_bin * t, -1)
    union = jnp.sum(pred_bin, -1) + jnp.sum(t, -1) - inter
    gt_iou = jax.lax.stop_gradient(inter / (union + 1e-6))
    score_sel = matched & (gt_iou > 0.5)
    mse = (m_scores - gt_iou) ** 2 * score_sel
    per_b = jnp.sum(mse, 1) / jnp.maximum(jnp.sum(score_sel, 1), 1e-6)
    score_loss = jnp.sum(per_b * (jnp.sum(score_sel, 1) > 0)) / nB

    # --- bce (loss.py:464-467). Reference quirk: it passes the LEGACY
    # ``reduce="none"`` kwarg (not ``reduction``), which torch treats as
    # truthy -> reduction='mean', so the BCE collapses to a scalar mean and
    # the subsequent GaPro prob-weighting algebraically cancels
    # ((mean * prob).sum() / prob.sum() == mean). Faithful behavior = plain
    # per-batch mean of BCE over matched instances x superpoints. ---
    bce = _bce_with_logits(m_logits, gt_m) * svf * mvalid
    n_sp_b = jnp.sum(sp_valid.astype(jnp.float32), -1)  # [B]
    cnt = jnp.maximum(num_gt_b * n_sp_b, 1.0)
    bce_loss = jnp.sum(jnp.sum(bce, (1, 2)) / cnt * batch_has) / nB

    # --- dice (mean over instances; summed over batch, NOT / B) ---
    p = jax.nn.sigmoid(m_logits) * svf * mvalid
    num = 2.0 * jnp.sum(p * t, -1)
    den = jnp.sum(p, -1) + jnp.sum(t, -1)
    dice = (1.0 - (num + 1.0) / (den + 1.0)) * matched
    dice_loss_v = jnp.sum(
        jnp.sum(dice, 1) / jnp.maximum(num_gt_b, 1e-6) * batch_has
    )
    if not final:
        # reference quirk: aux layers divide dice by batch size
        # (get_layer_loss, loss.py:330-333) while the final layer does not
        # (forward, loss.py:487-489)
        dice_loss_v = dice_loss_v / nB

    # --- levelset over rgb within GT boxes (loss.py:351-391) ---
    within = (
        jnp.all(sp_coords[:, None, :, :] >= targets.gt_boxes[:, :, None, :3] - 0.005, -1)
        & jnp.all(sp_coords[:, None, :, :] <= targets.gt_boxes[:, :, None, 3:] + 0.005, -1)
    ).astype(jnp.float32) * svf * mvalid
    # SPFormer drops boxes containing < 100 superpoints from the levelset
    # term entirely (loss.py:356 ``min_points_conds = sum >= 100``) — unlike
    # ISBNet's > 0 filter
    enough_pts = (jnp.sum(within, -1) >= 100.0).astype(jnp.float32)  # [B, I]
    within = within * enough_pts[..., None]
    sigm = jax.nn.sigmoid(m_logits) * within
    wsum = jnp.maximum(jnp.sum(sigm, -1, keepdims=True), 1e-5)
    avg = jnp.einsum("bis,bsc->bic", sigm, targets.sp_rgb) / wsum
    diff = targets.sp_rgb[:, None, :, :] - avg[:, :, None, :]
    lvl = jnp.sum(diff * diff, -1) * sigm
    npts = jnp.maximum(jnp.sum(within, -1), 1.0)
    lvl_inst = jnp.sum(lvl, -1) / npts * matched * enough_pts
    lvl_loss = jnp.sum(
        jnp.sum(lvl_inst, 1) / jnp.maximum(num_gt_b, 1e-4) * batch_has
    ) / nB

    wcls, wbce, wdice, wscore, wlvl = cfg.loss_weight
    total = (wcls * cls_loss + wbce * bce_loss + wdice * dice_loss_v
             + wscore * score_loss + wlvl * lvl_loss)
    return total, dict(cls_loss=cls_loss, bce_loss=bce_loss, dice_loss=dice_loss_v,
                       score_loss=score_loss, levelset_loss=lvl_loss)


def kl_loss_spp(mu_pred, logvar_pred, sp_dense_idx, sp_valid, sp_mu, sp_var,
                weight=0.1):
    """GP-uncertainty KL on the final layer (loss.py:519-544)."""
    mu_p = gather_dense(mu_pred, sp_dense_idx)
    logvar_p = gather_dense(logvar_pred, sp_dense_idx)
    eps = 1e-4
    # threshold, not equality: the -100 sentinel rides through a superpoint
    # segment_mean whose TPU accumulation is inexact (see criterion.py)
    has = (sp_mu > -50.0) & (sp_var > -50.0) & sp_valid
    mz = has & (sp_var <= eps)
    mv = has & (sp_var > eps)
    kl_z = (jnp.exp(logvar_p) - 1.0) ** 2 + (mu_p - sp_mu) ** 2
    kl_z = jnp.sum(kl_z * mz) / (jnp.sum(mz.astype(jnp.float32)) + 1e-4)
    safe_var = jnp.where(mv, sp_var, 1.0)
    kl_v = (
        (logvar_p - jnp.log(safe_var))
        + ((mu_p - sp_mu) ** 2 + safe_var**2) * jnp.exp(-2.0 * logvar_p)
        - 0.5
    )
    kl_v = jnp.sum(kl_v * mv) / (jnp.sum(mv.astype(jnp.float32)) + 1e-4)
    return weight * (
        jnp.where(jnp.sum(mz) > 0, kl_z, 0.0) + jnp.where(jnp.sum(mv) > 0, kl_v, 0.0)
    )


def spformer_loss(outputs: Dict, targets: Targets,
                  cfg: SPFormerCriterionConfig) -> Dict[str, jax.Array]:
    """Full criterion over the final layer + aux layers (loss.py:393-556)."""
    labels = outputs["labels"]  # [L+1, B, Q, C+1]
    scores = outputs["scores"]
    masks = outputs["masks"]
    sp_valid = outputs["sp_dense_valid"]
    sp_coords = outputs["sp_coords_dense"]
    n_layers = labels.shape[0]

    total = jnp.float32(0.0)
    out: Dict[str, jax.Array] = {}
    for li in range(n_layers):
        l, d = _layer_loss(labels[li], scores[li], masks[li], targets,
                           sp_valid, sp_coords, cfg,
                           final=(li == n_layers - 1))
        total = total + l
        if li == n_layers - 1:
            out.update(d)

    kl = kl_loss_spp(
        outputs["mu_pred"], outputs["logvar_pred"], outputs["sp_dense_idx"],
        sp_valid, targets.sp_mu, targets.sp_var, cfg.kl_weight,
    )
    out["kl_loss"] = kl
    out["loss"] = total + kl
    # overflow counters ride along for logging; NOT part of the loss
    for k in ("ovf_spp_slots", "ovf_plan_voxels", "ovf_window_escapees"):
        if k in outputs:
            out[k] = outputs[k].astype(jnp.float32)
    out["ovf_inst_voxels"] = jnp.asarray(
        targets.n_inst_overflow_voxels, jnp.float32)
    return out
