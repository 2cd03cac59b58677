"""Mask NMS for instance proposals (TPU-native, static shapes).

Matrix NMS follows the reference semantics
(ISBNet/isbnet/model/model_utils.py:109-160): sort by score, class-gated
IoU decay exp(-2*iou^2) with max-overlap compensation, then top-k.

TPU redesign: masks stay at *superpoint* resolution with per-superpoint
voxel counts as weights — mathematically identical to the reference's
voxel-level einsum (masks are constant within a superpoint) but S ~ 10^3
instead of V ~ 10^5, so the [P, P] IoU matrix costs P*P*S instead of P*P*V.

``standard_nms_host`` is the sequential greedy variant
(model_utils.py:77-106) on numpy for the non-default config path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def weighted_mask_iou(masks, weights):
    """Pairwise IoU of [P, S] {0,1} masks under per-column weights [S]."""
    mw = masks * weights[None, :]
    inter = jnp.einsum("ns,ms->nm", mw, masks, preferred_element_type=jnp.float32)
    num = jnp.sum(mw, axis=1)
    union = num[:, None] + num[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


@partial(jax.jit, static_argnums=(4,))
def matrix_nms(masks, categories, scores, weights, topk: int, sigma: float = 2.0):
    """Matrix NMS over fixed-size proposal sets.

    Args:
      masks: [P, S] float {0,1} superpoint masks.
      categories: [P] int32 (-1 = invalid row).
      scores: [P] float (invalid rows must carry score <= 0).
      weights: [S] float voxel count per superpoint (0 for padding).
      topk: static number of survivors to return.

    Returns (indices [topk] into the input P axis, updated scores [topk],
    keep [topk] bool).
    """
    p = masks.shape[0]
    order = jnp.argsort(-scores)  # descending; invalid (<=0) sink to the end
    m = masks[order]
    c = categories[order]
    s = scores[order]

    ious = weighted_mask_iou(m, weights)
    same_cls = (c[None, :] == c[:, None]) & (c[:, None] >= 0)
    triu = jnp.triu(jnp.ones((p, p), jnp.float32), k=1)
    label_matrix = same_cls.astype(jnp.float32) * triu

    decay_iou = ious * label_matrix
    compensate_iou = jnp.max(decay_iou, axis=0)  # per column: worst overlap
    compensate = compensate_iou[:, None]  # broadcast as rows (ref transpose)

    decay = jnp.exp(-sigma * decay_iou**2) / jnp.exp(-sigma * compensate**2)
    coeff = jnp.min(jnp.where(label_matrix > 0, decay, jnp.inf), axis=0)
    coeff = jnp.where(jnp.isfinite(coeff), coeff, 1.0)

    new_scores = jnp.where(s > 0, s * coeff, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(new_scores, topk)
    keep = jnp.isfinite(top_scores)
    return order[top_idx], jnp.where(keep, top_scores, 0.0), keep


def standard_nms_host(masks, categories, scores, weights, threshold=0.2):
    """Greedy class-aware mask NMS (numpy). Returns kept indices."""
    masks = np.asarray(masks, np.float32) * np.asarray(weights)[None, :]
    bin_masks = np.asarray(masks > 0, np.float32)
    inter = (masks @ bin_masks.T)
    num = masks.sum(1)
    ious = inter / np.maximum(num[:, None] + num[None, :] - inter, 1e-6)

    ixs = np.argsort(-np.asarray(scores))
    pick = []
    while len(ixs) > 0:
        i = ixs[0]
        pick.append(int(i))
        rest = ixs[1:]
        cond = (ious[i, rest] > threshold) & (
            np.asarray(categories)[rest] == categories[i]
        )
        ixs = rest[~cond]
    return np.asarray(pick, np.int64)
