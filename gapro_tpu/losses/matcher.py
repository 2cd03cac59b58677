"""Hungarian matching between queries and GT instances.

Cost semantics follow the reference matcher
(ISBNet/isbnet/model/matcher.py:144-206): cost = 0.5*cls + 1*dice + 1*bce +
0.2*conf + 0.2*giou, NaN/Inf -> 1e5, solved with LSAP.

TPU execution: costs are computed on device over dense padded [B, Q, I]
tensors (invalid GT columns forced to a large constant). The LSAP solver:

  * `lsap_auction` — device-native Bertsekas auction with epsilon scaling
    (vmapped over the batch). Required on this machine's TPU backend,
    which does not support host callbacks at all, and avoids the
    jit-pipeline stall a host round trip causes anyway.
  * `_lsap_host` — scipy `linear_sum_assignment` via pure_callback, kept
    for platforms with callback support (exact reference semantics).

`lsap` picks per backend at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INVALID_COST = 1e5


def _lsap_host(cost):
    """cost: [B, Q, I] numpy -> assignment [B, I] (query index per GT, -1)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    b, q, i = cost.shape
    out = np.full((b, i), -1, np.int32)
    for bi in range(b):
        rows, cols = linear_sum_assignment(cost[bi])
        out[bi, cols] = rows.astype(np.int32)
    return out


def lsap_auction(cost: jax.Array, eps_scale: float = 64.0, max_sweeps: int = 128):
    """Device-native LSAP: Gauss-Seidel Bertsekas auction (single phase).

    cost [B, Q, I] (Q >= I) -> assignment [B, I]: the query row assigned to
    each GT column (-1 for padding columns). Columns bid sequentially (a
    lax.scan sweep) at fresh prices from zero initial prices; termination is
    eps-complementary-slack, i.e. within I*eps of optimal with
    eps = span / (eps_scale * (I+1)). No price carryover between phases:
    the asymmetric (Q > I) auction is only eps-optimal from uniform initial
    prices (carryover needs the lambda-mechanism and measurably degrades
    solutions). On test matrices this reproduces scipy's optimum
    (tests/test_matcher.py).
    """
    B, Q, I = cost.shape

    def single(c):
        span = jnp.maximum(jnp.max(c) - jnp.min(c), 1e-6)
        value0 = -c  # maximize value
        # padding columns (all-invalid cost) never bid: with more columns
        # than rows the auction would otherwise cycle forever
        feasible = jnp.min(c, axis=0) < _INVALID_COST * 0.5  # [I]

        def phase(price, eps):
            assigned0 = jnp.full((I,), -1, jnp.int32)
            owner0 = jnp.full((Q,), -1, jnp.int32)

            def bid(state, j):
                price, assigned, owner = state
                do = (assigned[j] < 0) & feasible[j]
                v = value0[:, j] - price
                top2, top2_idx = jax.lax.top_k(v, 2)
                r = top2_idx[0]
                bid_amt = top2[0] - top2[1] + eps
                prev = owner[r]
                # evict previous owner of r (if bidding)
                assigned = assigned.at[jnp.where(do & (prev >= 0), prev, I)].set(
                    -1, mode="drop"
                )
                assigned = assigned.at[jnp.where(do, j, I)].set(r, mode="drop")
                owner = owner.at[jnp.where(do, r, Q)].set(j, mode="drop")
                price = price.at[jnp.where(do, r, Q)].add(bid_amt, mode="drop")
                return (price, assigned, owner), None

            def sweep_cond(state):
                price, assigned, owner, it = state
                return jnp.any((assigned < 0) & feasible) & (it < max_sweeps)

            def sweep(state):
                price, assigned, owner, it = state
                (price, assigned, owner), _ = jax.lax.scan(
                    bid, (price, assigned, owner), jnp.arange(I)
                )
                return price, assigned, owner, it + 1

            price, assigned, owner, _ = jax.lax.while_loop(
                sweep_cond, sweep, (price, assigned0, owner0, jnp.int32(0))
            )
            return price, assigned

        eps = span / (eps_scale * (I + 1))
        _, assigned = phase(jnp.zeros((Q,)), eps)
        return jnp.where(feasible, assigned, -1)

    return jax.vmap(single)(cost)


def use_device_auction() -> bool:
    """Auction on TPU-class backends: this machine's relay backend rejects
    host callbacks outright (and reports itself as plain "tpu"), and even on
    real TPUs a host round trip stalls the jit pipeline."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def lsap(cost: jax.Array) -> jax.Array:
    """Solve LSAP per batch. cost [B, Q, I] -> [B, I] query-per-GT."""
    if use_device_auction():
        return lsap_auction(cost)
    b, _, i = cost.shape
    return jax.pure_callback(
        _lsap_host,
        jax.ShapeDtypeStruct((b, i), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def dice_cost(mask_logits, gt_masks, sp_valid):
    """[Q,S] logits vs [I,S] masks -> [Q,I]; masked superpoints excluded."""
    p = jax.nn.sigmoid(mask_logits) * sp_valid[None, :]
    t = gt_masks * sp_valid[None, :]
    num = 2.0 * jnp.einsum("qs,is->qi", p, t)
    den = p.sum(-1)[:, None] + t.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def bce_cost(mask_logits, gt_masks, sp_valid):
    """Per-element sigmoid BCE averaged over S (matcher.py:66-81)."""
    ns = jnp.maximum(sp_valid.sum(), 1.0)
    pos = jax.nn.softplus(-mask_logits) * sp_valid[None, :]  # -log sigmoid(x)
    neg = jax.nn.softplus(mask_logits) * sp_valid[None, :]  # -log(1-sigmoid(x))
    t = gt_masks * sp_valid[None, :]
    loss = jnp.einsum("qs,is->qi", pos, t) + jnp.einsum("qs,is->qi", neg, (1.0 - gt_masks) * sp_valid[None, :])
    return loss / ns


def giou_pairwise(boxes1, boxes2):
    """[Q,6] x [I,6] -> iou, giou [Q,I] (model_utils.py:385-413)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    inter = jnp.prod(
        jnp.clip(jnp.minimum(b1[..., 3:], b2[..., 3:]) - jnp.maximum(b1[..., :3], b2[..., :3]), 0.0),
        -1,
    )
    v1 = jnp.prod(jnp.clip(b1[..., 3:] - b1[..., :3], 0.0), -1)
    v2 = jnp.prod(jnp.clip(b2[..., 3:] - b2[..., :3], 0.0), -1)
    union = v1 + v2 - inter
    iou = inter / (union + 1e-6)
    bound = jnp.prod(
        jnp.clip(jnp.maximum(b1[..., 3:], b2[..., 3:]) - jnp.minimum(b1[..., :3], b2[..., :3]), 0.0),
        -1,
    )
    giou = iou - (bound - union) / (bound + 1e-6)
    return iou, giou


def hungarian_match(
    cls_logits,  # [B, Q, C+1]
    mask_logits,  # [B, Q, S]
    conf_logits,  # [B, Q]
    box_preds,  # [B, Q, 6]
    gt_cls,  # [B, I] int32 (-1 invalid)
    gt_masks,  # [B, I, S] float
    gt_boxes,  # [B, I, 6]
    gt_valid,  # [B, I] bool
    sp_valid,  # [B, S] bool
    query_valid,  # [B, Q] bool
):
    """Returns assignment [B, I]: matched query index per GT (-1 invalid)."""

    def one(cl, ml, co, bp, gc, gm, gb, gv, sv, qv):
        d = dice_cost(ml, gm, sv.astype(jnp.float32))
        bce = bce_cost(ml, gm, sv.astype(jnp.float32))
        sm = jax.nn.softmax(cl, axis=-1)
        cls_c = -sm[:, jnp.maximum(gc, 0)]
        conf_c = -co[:, None]
        _, giou = giou_pairwise(bp, gb)
        cost = 0.5 * cls_c + d + bce + 0.2 * conf_c + 0.2 * (-giou)
        cost = jnp.where(jnp.isfinite(cost), cost, _INVALID_COST)
        cost = jnp.where(gv[None, :], cost, _INVALID_COST)
        cost = jnp.where(qv[:, None], cost, _INVALID_COST)
        return cost

    costs = jax.vmap(one)(
        cls_logits, mask_logits, conf_logits, box_preds,
        gt_cls, gt_masks, gt_boxes, gt_valid, sp_valid, query_valid,
    )
    assign = lsap(jax.lax.stop_gradient(costs))
    return jnp.where(gt_valid, assign, -1)
