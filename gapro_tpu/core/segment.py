"""Segment reductions with static segment counts.

TPU-native replacements for the reference's ``torch_scatter.scatter*`` calls
and the ``sec_mean/sec_min/sec_max`` CUDA kernels
(ISBNet/isbnet/ops/src/sec_mean/sec_mean.cu): everything maps to
``jax.ops.segment_*`` with a *static* ``num_segments`` and an explicit
trash-bin row for invalid ids, so shapes stay fixed under jit.

Convention: segment ids < 0 or >= num_segments are dropped (routed to a
trash bin and sliced off).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _route_invalid(seg_ids: jax.Array, num_segments: int) -> jax.Array:
    """Map out-of-range ids to the trash bin ``num_segments``."""
    valid = (seg_ids >= 0) & (seg_ids < num_segments)
    return jnp.where(valid, seg_ids, num_segments)


def segment_sum(data, seg_ids, num_segments: int):
    seg = _route_invalid(seg_ids, num_segments)
    out = jax.ops.segment_sum(data, seg, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(seg_ids, num_segments: int, dtype=jnp.float32):
    seg = _route_invalid(seg_ids, num_segments)
    ones = jnp.ones(seg.shape[:1], dtype=dtype)
    out = jax.ops.segment_sum(ones, seg, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data, seg_ids, num_segments: int, eps: float = 1e-12):
    """Mean per segment; empty segments give 0.

    Matches the fp32-forced mean of the reference's ``custom_scatter_mean``
    (ISBNet/isbnet/model/model_utils.py:600-613): accumulation is in fp32
    regardless of input dtype, result cast back.
    """
    dtype = data.dtype
    data32 = data.astype(jnp.float32)
    s = segment_sum(data32, seg_ids, num_segments)
    c = segment_count(seg_ids, num_segments)
    c = c.reshape(c.shape + (1,) * (s.ndim - 1))
    return (s / jnp.maximum(c, eps)).astype(dtype)


def segment_weighted_mean(data, seg_ids, weights, num_segments: int,
                          eps: float = 1e-12):
    """Weighted mean per segment; empty/zero-weight segments give 0.

    Used for point-resolution superpoint pooling of voxel features
    (weights = member-point count per voxel): equals the reference's
    scatter_mean over devoxelized points
    (SPFormer/spformer/model/spformer.py:257-262), since each point carries
    exactly its voxel's feature. fp32 accumulation like segment_mean.
    """
    dtype = data.dtype
    w32 = weights.astype(jnp.float32)
    data32 = data.astype(jnp.float32)
    wshaped = w32.reshape(w32.shape + (1,) * (data32.ndim - 1))
    s = segment_sum(data32 * wshaped, seg_ids, num_segments)
    c = segment_sum(w32, seg_ids, num_segments)
    c = c.reshape(c.shape + (1,) * (s.ndim - 1))
    return (s / jnp.maximum(c, eps)).astype(dtype)


def segment_min(data, seg_ids, num_segments: int):
    seg = _route_invalid(seg_ids, num_segments)
    out = jax.ops.segment_min(data, seg, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_max(data, seg_ids, num_segments: int):
    seg = _route_invalid(seg_ids, num_segments)
    out = jax.ops.segment_max(data, seg, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_argmin(data, seg_ids, num_segments: int):
    """Index (into ``data``) of the per-segment minimum.

    Replacement for ``torch_scatter.scatter_min``'s argmin output used by the
    reference's smallest-volume box assignment (gapro/gen_ps_utils.py:453).
    Ties resolve to the smallest index.
    """
    n = data.shape[0]
    mins = segment_min(data, seg_ids, num_segments)
    seg = _route_invalid(seg_ids, num_segments)
    gathered = jnp.where(seg < num_segments, mins[jnp.minimum(seg, num_segments - 1)], jnp.inf)
    is_min = (data == gathered) & (seg < num_segments)
    idx = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_min, idx, n)
    arg = segment_min(cand, seg_ids, num_segments)
    return jnp.where(arg < n, arg, -1)


def segment_prod_mask(mask, seg_ids, num_segments: int):
    """Logical AND per segment (all members true)."""
    return segment_min(mask.astype(jnp.int32), seg_ids, num_segments) > 0


def compact_unique(ids: jax.Array, num_out: int, valid=None):
    """Static-shape ``torch.unique(return_inverse=True)``.

    Args:
      ids: [N] int array of raw ids (e.g. superpoint ids).
      num_out: static upper bound on the number of unique values.
      valid: optional [N] bool; invalid entries get inverse id -1.

    Returns:
      (unique_vals [num_out] padded with -1, inverse [N] int32, count scalar)
      Unique values appear in sorted order, matching torch.unique.
    """
    n = ids.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, ids.astype(jnp.int32), big)
    order = jnp.argsort(key)
    sorted_key = key[order]
    is_new = jnp.concatenate(
        [jnp.array([True]), sorted_key[1:] != sorted_key[:-1]]
    ) & (sorted_key != big)
    ranks = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # rank within sorted order
    count = jnp.sum(is_new.astype(jnp.int32))
    # scatter ranks back to original positions
    inverse = jnp.zeros((n,), dtype=jnp.int32).at[order].set(ranks)
    inverse = jnp.where(valid, inverse, -1)
    uniq = jnp.full((num_out,), -1, dtype=jnp.int32)
    uniq = uniq.at[jnp.where(is_new, ranks, num_out)].set(
        jnp.where(is_new, sorted_key, -1), mode="drop"
    )
    return uniq, inverse, count


def superpoint_major_voting(labels, spp, n_classes: int, num_segments: int,
                            ignore_label: int = -100):
    """Majority class per superpoint, broadcast back to points
    (ISBNet/isbnet/model/model_utils.py:616-644). Ignore labels vote as a
    dedicated class 0 and map back to `ignore_label`.

    Returns (refined_labels [N], vote_fraction [N]).
    """
    shifted = jnp.where(labels >= 0, labels + 1, 0)
    onehot = jax.nn.one_hot(shifted, n_classes + 1, dtype=jnp.float32)
    counts = segment_sum(onehot, spp, num_segments)  # [S, C+1]
    label_spp = jnp.argmax(counts, axis=1)
    frac_spp = counts / jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), 1.0)
    label_spp = jnp.where(label_spp >= 1, label_spp - 1, ignore_label)
    safe = jnp.clip(spp, 0, num_segments - 1)
    refined = jnp.where(spp >= 0, label_spp[safe], ignore_label)
    votes = jnp.where(
        spp >= 0,
        jnp.take_along_axis(
            frac_spp[safe], jnp.maximum(refined, 0)[:, None] + 1, axis=1
        )[:, 0],
        0.0,
    )
    return refined, votes
