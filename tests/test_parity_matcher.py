"""Cross-implementation parity: matcher costs/assignments vs the reference
(ISBNet/isbnet/model/matcher.py:144-206, runnable torch+scipy on this host),
plus adversarial fuzzing of the device auction LSAP against scipy (VERDICT #6).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

sys.path.insert(0, str(Path(__file__).parent))
import ref_shim  # noqa: E402

from gapro_tpu.losses.matcher import (  # noqa: E402
    _INVALID_COST,
    bce_cost,
    dice_cost,
    giou_pairwise,
    lsap_auction,
)


def _rand_inputs(rng, Q=32, I=10, S=200, C=18):
    cls_logits = rng.standard_normal((Q, C + 1)).astype(np.float32)
    mask_logits = rng.standard_normal((Q, S)).astype(np.float32) * 2
    conf = rng.random(Q).astype(np.float32)
    centers = rng.random((Q, 3)).astype(np.float32) * 4
    sizes = rng.random((Q, 3)).astype(np.float32)
    box_preds = np.concatenate([centers - sizes, centers + sizes], 1)
    gt_cls = rng.integers(0, C, size=I).astype(np.int64)
    gt_masks = (rng.random((I, S)) < 0.3).astype(np.float32)
    gc = rng.random((I, 3)).astype(np.float32) * 4
    gs = rng.random((I, 3)).astype(np.float32)
    gt_boxes = np.concatenate([gc - gs, gc + gs], 1)
    return cls_logits, mask_logits, conf, box_preds, gt_cls, gt_masks, gt_boxes


def _my_cost(cls_logits, mask_logits, conf, box_preds, gt_cls, gt_masks, gt_boxes):
    """Rebuild the per-scene cost exactly as hungarian_match's inner fn does
    (losses/matcher.py:184-195) with all superpoints valid."""
    sv = jnp.ones(mask_logits.shape[1], jnp.float32)
    d = dice_cost(jnp.asarray(mask_logits), jnp.asarray(gt_masks), sv)
    b = bce_cost(jnp.asarray(mask_logits), jnp.asarray(gt_masks), sv)
    sm = jax.nn.softmax(jnp.asarray(cls_logits), axis=-1)
    cls_c = -sm[:, jnp.asarray(gt_cls)]
    conf_c = -jnp.asarray(conf)[:, None]
    _, giou = giou_pairwise(jnp.asarray(box_preds), jnp.asarray(gt_boxes))
    cost = 0.5 * cls_c + d + b + 0.2 * conf_c + 0.2 * (-giou)
    return np.asarray(jnp.where(jnp.isfinite(cost), cost, _INVALID_COST))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matcher_cost_parity(seed):
    import torch

    rng = np.random.default_rng(seed)
    inputs = _rand_inputs(rng)
    cls_logits, mask_logits, conf, box_preds, gt_cls, gt_masks, gt_boxes = inputs

    ref_m = ref_shim.load_isbnet("model.matcher")
    matcher = ref_m.HungarianMatcher()
    # reproduce get_match's final_cost (matcher.py:144-206) via its pieces so
    # we can compare the matrix, then its scipy assignment
    t = lambda x: torch.from_numpy(np.asarray(x))
    dice_ref = ref_m.compute_dice_cost(t(mask_logits), t(gt_masks))
    bce_ref = ref_m.sigmoid_bce_loss(t(mask_logits), t(gt_masks))
    cls_sm = torch.softmax(t(cls_logits), dim=-1)
    class_ref = -cls_sm[:, t(gt_cls)]
    conf_ref = -t(conf)[:, None].repeat(1, len(gt_cls))
    mu = ref_shim.load_isbnet("model.model_utils")
    _, giou_ref = mu.batch_giou_cross(t(box_preds), t(gt_boxes))
    ref_cost = (0.5 * class_ref + dice_ref + bce_ref + 0.2 * conf_ref
                + 0.2 * (-giou_ref)).numpy()

    my_cost = _my_cost(*inputs)
    np.testing.assert_allclose(my_cost, ref_cost, rtol=1e-4, atol=1e-4)

    # identical scipy solve on both -> same optimal total cost
    r1, c1 = linear_sum_assignment(ref_cost)
    r2, c2 = linear_sum_assignment(my_cost)
    assert ref_cost[r1, c1].sum() == pytest.approx(my_cost[r2, c2].sum(), abs=1e-3)


def test_matcher_full_get_match_parity():
    """Run the reference get_match end to end and check the scipy assignment
    over our cost matches its assignment's total cost."""
    import torch

    rng = np.random.default_rng(42)
    inputs = _rand_inputs(rng, Q=64, I=14, S=150)
    cls_logits, mask_logits, conf, box_preds, gt_cls, gt_masks, gt_boxes = inputs

    ref_m = ref_shim.load_isbnet("model.matcher")
    matcher = ref_m.HungarianMatcher()
    t = lambda x: torch.from_numpy(np.asarray(x))
    rows, cols, _, _ = matcher.get_match(
        t(gt_cls), t(gt_masks), t(gt_boxes),
        t(cls_logits), t(mask_logits), t(conf), t(box_preds),
    )
    my_cost = _my_cost(*inputs)
    r2, c2 = linear_sum_assignment(my_cost)
    assert my_cost[rows, cols].sum() == pytest.approx(my_cost[r2, c2].sum(), abs=1e-3)


# --------------------------------------------------------------------------- #
# auction hardening (VERDICT weak #5): realistic sizes + adversarial cases
# --------------------------------------------------------------------------- #


def _auction_gap(cost):
    """Return (auction_total - scipy_optimal_total, I) for one [Q, I] cost."""
    a = np.asarray(lsap_auction(jnp.asarray(cost[None]))[0])
    I = cost.shape[1]
    feasible = cost.min(0) < _INVALID_COST * 0.5
    rows, cols = linear_sum_assignment(cost)
    # scipy assigns every column; restrict to feasible ones like the auction
    opt = cost[rows, cols][feasible[cols]].sum()
    assert np.all(a[feasible] >= 0), "auction left a feasible column unassigned"
    assert len(np.unique(a[feasible])) == feasible.sum(), "duplicate rows assigned"
    got = cost[a[feasible], np.nonzero(feasible)[0]].sum()
    return got - opt, int(feasible.sum())


def test_auction_fuzz_realistic():
    """[256 queries x 128 GT] random costs: eps-optimality bound must hold."""
    rng = np.random.default_rng(0)
    for _ in range(8):
        cost = rng.standard_normal((256, 128)).astype(np.float32) * 3
        gap, I = _auction_gap(cost)
        span = cost.max() - cost.min()
        eps = span / (64.0 * (I + 1))
        assert gap <= I * eps + 1e-3, (gap, I * eps)


def test_auction_adversarial():
    rng = np.random.default_rng(1)
    Q, I = 64, 32
    cases = []
    # ties everywhere
    cases.append(np.zeros((Q, I), np.float32))
    # near-degenerate: all rows nearly identical
    base = rng.standard_normal(I).astype(np.float32)
    cases.append(np.tile(base, (Q, 1)) + rng.standard_normal((Q, I)).astype(np.float32) * 1e-6)
    # padding columns with 1e5 sentinels (half the columns infeasible)
    c = rng.standard_normal((Q, I)).astype(np.float32)
    c[:, I // 2:] = _INVALID_COST
    cases.append(c)
    # huge span
    c = rng.standard_normal((Q, I)).astype(np.float32)
    c[0, 0] = 9e4
    c[1, 1] = -9e4
    cases.append(c)
    # integer costs (exact ties across rows)
    cases.append(rng.integers(0, 5, size=(Q, I)).astype(np.float32))

    for k, cost in enumerate(cases):
        gap, If = _auction_gap(cost)
        span = max(cost.max() - cost.min(), 1e-6)
        eps = span / (64.0 * (If + 1))
        assert gap <= If * eps + 1e-2, (k, gap, If * eps)


def test_auction_batch_fuzz_small():
    """Many small random instances, exact-optimum check within eps bound."""
    rng = np.random.default_rng(2)
    costs = rng.standard_normal((50, 24, 12)).astype(np.float32)
    assigns = np.asarray(lsap_auction(jnp.asarray(costs)))
    for cost, a in zip(costs, assigns):
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        got = cost[a, np.arange(12)].sum()
        span = cost.max() - cost.min()
        assert got - opt <= 12 * span / (64.0 * 13) + 1e-4
