"""Hungarian matching between queries and GT instances.

Cost semantics follow the reference matcher
(ISBNet/isbnet/model/matcher.py:144-206): cost = 0.5*cls + 1*dice + 1*bce +
0.2*conf + 0.2*giou, NaN/Inf -> 1e5, solved with LSAP.

TPU execution: costs are computed on device over dense padded [B, Q, I]
tensors (invalid GT columns forced to a large constant); the LSAP itself is
a `pure_callback` to scipy on host (cost matrices are tiny: 256 x <=128).
A device-side auction solver can replace the callback later without
touching callers.
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


def lsap(cost: jax.Array) -> jax.Array:
    """Solve LSAP per batch on host. cost [B, Q, I] -> [B, I] query-per-GT."""
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
