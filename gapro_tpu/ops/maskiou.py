"""Proposal-vs-GT mask IoU + mask label assignment (TPU-native).

Replaces the CUDA kernels `get_mask_iou_on_cluster` / `get_mask_iou_on_pred`
/ `get_mask_label`
(ISBNet/isbnet/ops/src/cal_iou_and_masklabel/cal_iou_and_masklabel.cu:15-60+;
wrappers ops/functions.py:7-139) with one-hot matmul formulations — the same
trick the reference itself uses in numpy at gapro/eval_ps_labels.py:35-42.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def mask_iou_on_cluster(proposal_masks, instance_labels, num_instances: int):
    """IoU between binary proposals and GT instance ids.

    proposal_masks [P, N] {0,1}; instance_labels [N] (-100/-1 = none).
    Returns [P, num_instances].
    """
    onehot = (
        instance_labels[:, None] == jnp.arange(num_instances)[None, :]
    ).astype(jnp.float32)  # [N, I]
    inter = jnp.einsum("pn,ni->pi", proposal_masks.astype(jnp.float32), onehot)
    p_sz = jnp.sum(proposal_masks, axis=1).astype(jnp.float32)
    g_sz = jnp.sum(onehot, axis=0)
    union = p_sz[:, None] + g_sz[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


@partial(jax.jit, static_argnums=(3,))
def mask_label(proposal_masks, instance_labels, iou_thresh, num_instances: int):
    """Per-proposal soft mask label (get_mask_label semantics): points of the
    best-IoU GT instance are positives iff that IoU exceeds `iou_thresh`."""
    ious = mask_iou_on_cluster(proposal_masks, instance_labels, num_instances)
    best = jnp.argmax(ious, axis=1)  # [P]
    best_iou = jnp.take_along_axis(ious, best[:, None], axis=1)[:, 0]
    pos = (instance_labels[None, :] == best[:, None]) & (
        best_iou[:, None] > iou_thresh
    )
    return pos.astype(jnp.float32), ious
