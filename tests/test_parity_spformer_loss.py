"""Cross-implementation parity: SPFormer criterion vs the reference
(SPFormer/spformer/model/loss.py:226-556), matching held fixed on both sides.
Covers the final-layer terms (cls/bce/dice/score/levelset + KL) and the
aux-layer dice-divided-by-B quirk (get_layer_loss vs forward).
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_shim  # noqa: E402

from gapro_tpu.losses.criterion import Targets  # noqa: E402
from gapro_tpu.losses.spformer_criterion import (  # noqa: E402
    SPFormerCriterionConfig,
    _layer_loss,
    kl_loss_spp,
)

B, Q, C, ICAP = 2, 12, 18, 6
N_PTS = (300, 380)
S = max(N_PTS)


def _scenario(seed):
    rng = np.random.default_rng(seed)
    offs = np.concatenate([[0], np.cumsum(N_PTS)])
    n_flat = offs[-1]

    cls_logits = rng.standard_normal((B, Q, C + 1)).astype(np.float32)
    scores = rng.random((B, Q)).astype(np.float32)
    mask_logits = rng.standard_normal((B, Q, S)).astype(np.float32) * 2.5

    coords = rng.random((n_flat, 3)).astype(np.float32) * 4
    rgb = rng.random((n_flat, 3)).astype(np.float32)
    prob = rng.random(n_flat).astype(np.float32) * 0.9 + 0.1
    mu_lbl = np.where(rng.random(n_flat) < 0.3, -100.0,
                      rng.standard_normal(n_flat)).astype(np.float32)
    var_lbl = np.where(mu_lbl == -100.0, -100.0,
                       np.where(rng.random(n_flat) < 0.4, 0.0,
                                rng.random(n_flat) * 0.5 + 0.001)).astype(np.float32)
    mu_pred = rng.standard_normal(n_flat).astype(np.float32)
    logvar_pred = (rng.standard_normal(n_flat) * 0.3).astype(np.float32)

    n_gts = (3, 4)
    gt_cls = np.full((B, ICAP), -1, np.int32)
    gt_masks = np.zeros((B, ICAP, S), np.float32)
    gt_boxes = np.zeros((B, ICAP, 6), np.float32)
    gt_valid = np.zeros((B, ICAP), bool)
    assign = np.full((B, ICAP), -1, np.int32)
    insts = []
    indices = []
    for b in range(B):
        nb = N_PTS[b]
        ng = n_gts[b]
        picks = rng.choice(Q, size=ng, replace=False)
        cls_b = rng.integers(0, C, size=ng)
        masks_b = (rng.random((ng, nb)) < 0.4).astype(np.float32)
        # boxes sized so some contain >= 100 superpoints and some fewer
        # (exercises SPFormer's levelset min-points filter, loss.py:356)
        gc = rng.random((ng, 3)).astype(np.float32) * 3 + 0.5
        gs = np.where(rng.random((ng, 1)) < 0.5, 0.3, 2.0).astype(np.float32) \
            * (rng.random((ng, 3)).astype(np.float32) * 0.5 + 0.5)
        boxes_b = np.concatenate([gc - gs, gc + gs], -1)
        gt_cls[b, :ng] = cls_b
        gt_masks[b, :ng, :nb] = masks_b
        gt_boxes[b, :ng] = boxes_b
        gt_valid[b, :ng] = True
        assign[b, :ng] = picks
        insts.append(dict(gt_labels=cls_b, gt_spmasks=masks_b, gt_boxes=boxes_b))
        indices.append((picks, np.arange(ng)))

    sp_valid = np.zeros((B, S), bool)
    sp_dense_idx = np.full((B, S), -1, np.int32)
    d_prob = np.zeros((B, S), np.float32)
    d_mu = np.full((B, S), -100.0, np.float32)
    d_var = np.full((B, S), -100.0, np.float32)
    d_rgb = np.zeros((B, S, 3), np.float32)
    d_coords = np.zeros((B, S, 3), np.float32)
    for b in range(B):
        nb = N_PTS[b]
        sp_valid[b, :nb] = True
        sp_dense_idx[b, :nb] = np.arange(offs[b], offs[b + 1])
        d_prob[b, :nb] = prob[offs[b]:offs[b + 1]]
        d_mu[b, :nb] = mu_lbl[offs[b]:offs[b + 1]]
        d_var[b, :nb] = var_lbl[offs[b]:offs[b + 1]]
        d_rgb[b, :nb] = rgb[offs[b]:offs[b + 1]]
        d_coords[b, :nb] = coords[offs[b]:offs[b + 1]]
    mask_logits = np.where(sp_valid[:, None, :], mask_logits, 0.0)

    return dict(cls_logits=cls_logits, scores=scores, mask_logits=mask_logits,
                coords=coords, rgb=rgb, prob=prob, mu_lbl=mu_lbl, var_lbl=var_lbl,
                mu_pred=mu_pred, logvar_pred=logvar_pred, offs=offs,
                insts=insts, indices=indices, gt_cls=gt_cls, gt_masks=gt_masks,
                gt_boxes=gt_boxes, gt_valid=gt_valid, assign=assign,
                sp_valid=sp_valid, sp_dense_idx=sp_dense_idx, d_prob=d_prob,
                d_mu=d_mu, d_var=d_var, d_rgb=d_rgb, d_coords=d_coords)


class _Inst:
    def __init__(self, d, t):
        self.gt_labels = t(d["gt_labels"]).long()
        self.gt_spmasks = t(d["gt_spmasks"])
        self.gt_boxes = t(d["gt_boxes"])

    def __len__(self):
        return len(self.gt_labels)


def _ref(sc, with_aux):
    import torch

    loss_mod = ref_shim.load_spformer("model.loss")
    crit = loss_mod.Criterion(loss_weight=[0.5, 1.0, 1.0, 0.5, 0.2],
                              cost_weight=[0.5, 1.0, 1.0], num_class=C)
    t = lambda x: torch.from_numpy(np.asarray(x))

    fixed = [(t(q).long(), t(g).long()) for q, g in sc["indices"]]

    class _FixedMatcher(torch.nn.Module):
        def forward(self, *a, **k):
            return fixed

    crit.matcher = _FixedMatcher()

    offs = sc["offs"]
    pred = dict(
        labels=t(sc["cls_logits"]),
        scores=t(sc["scores"])[..., None],
        masks=[t(sc["mask_logits"][b, :, :N_PTS[b]]) for b in range(B)],
        sp_coords=t(sc["coords"]),
        sp_rgb_feats=t(sc["rgb"]),
        batch_offsets=t(offs).long(),
        sp_prob_labels=t(sc["prob"]),
        sp_mu_labels=t(sc["mu_lbl"]),
        sp_var_labels=t(sc["var_lbl"]),
        sp_mu_preds=t(sc["mu_pred"]),
        sp_logvar_preds=t(sc["logvar_pred"]),
    )
    if with_aux:
        pred["aux_outputs"] = [dict(labels=pred["labels"], scores=pred["scores"],
                                    masks=pred["masks"])]
    insts = [_Inst(d, t) for d in sc["insts"]]
    loss, out = crit.forward(pred, insts)
    out["loss"] = float(loss)
    return out


def _mine_layer(sc, final):
    targets = Targets(
        gt_cls=jnp.asarray(sc["gt_cls"]), gt_boxes=jnp.asarray(sc["gt_boxes"]),
        gt_sp_masks=jnp.asarray(sc["gt_masks"]), gt_valid=jnp.asarray(sc["gt_valid"]),
        sp_prob=jnp.asarray(sc["d_prob"]), sp_mu=jnp.asarray(sc["d_mu"]),
        sp_var=jnp.asarray(sc["d_var"]), sp_rgb=jnp.asarray(sc["d_rgb"]),
        corners_offset_labels=jnp.zeros((4, 6)), num_gts=jnp.asarray(0),
    )
    cfg = SPFormerCriterionConfig(num_class=C, inst_cap=ICAP)
    total, terms = _layer_loss(
        jnp.asarray(sc["cls_logits"]), jnp.asarray(sc["scores"]),
        jnp.asarray(sc["mask_logits"]), targets, jnp.asarray(sc["sp_valid"]),
        jnp.asarray(sc["d_coords"]), cfg, final=final,
        assign=jnp.asarray(sc["assign"]),
    )
    kl = kl_loss_spp(jnp.asarray(sc["mu_pred"]), jnp.asarray(sc["logvar_pred"]),
                     jnp.asarray(sc["sp_dense_idx"]), jnp.asarray(sc["sp_valid"]),
                     targets.sp_mu, targets.sp_var)
    return float(total), {k: float(v) for k, v in terms.items()}, float(kl)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spformer_final_layer_parity(seed):
    sc = _scenario(seed)
    ref = _ref(sc, with_aux=False)
    total, terms, kl = _mine_layer(sc, final=True)

    assert terms["cls_loss"] == pytest.approx(ref["cls_loss"], rel=2e-4, abs=2e-5)
    assert terms["bce_loss"] == pytest.approx(ref["mask_bce_loss"], rel=2e-4, abs=2e-5)
    assert terms["dice_loss"] == pytest.approx(ref["mask_dice_loss"], rel=2e-4, abs=2e-5)
    assert terms["score_loss"] == pytest.approx(ref["score_loss"], rel=2e-4, abs=2e-5)
    assert terms["levelset_loss"] == pytest.approx(ref["levelset_loss"], rel=2e-4, abs=2e-5)
    assert kl == pytest.approx(ref["kl_loss"].item(), rel=2e-4, abs=2e-5)
    assert total + kl == pytest.approx(ref["loss"], rel=2e-4, abs=2e-4)


def test_spformer_aux_layer_parity():
    """Aux layers divide dice by B (get_layer_loss) — final layer does not."""
    sc = _scenario(3)
    ref = _ref(sc, with_aux=True)
    total_final, _, kl = _mine_layer(sc, final=True)
    total_aux, terms_aux, _ = _mine_layer(sc, final=False)
    # _layer_loss(final=False) already applies the aux /B division
    assert terms_aux["dice_loss"] == pytest.approx(
        ref["layer_0_mask_dice_loss"], rel=2e-4, abs=2e-5)
    assert total_final + total_aux + kl == pytest.approx(ref["loss"], rel=2e-4, abs=2e-4)
