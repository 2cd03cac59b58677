"""Voxelization as sort + unique (TPU-native).

Replaces the reference's CPU hash-map voxelizer and CUDA mean-scatter
(ISBNet/isbnet/ops/src/voxelize/voxelize.cpp:68-130, voxelize.cu;
wrappers ISBNet/isbnet/ops/functions.py:142-217).  Semantics:

  * ``voxelize`` : int coords [N,4] (batch,z,y,x) -> unique voxel coords,
    a point->voxel id map (the reference's ``input_map``/"v2p_map"), and a
    representative (first) point per voxel (stand-in for the ragged
    ``output_map`` rulebook — labels are taken from the first point, features
    from the mean over member points).
  * ``voxel_feats_mean`` : per-voxel mean of point features (mode 4).
  * ``devoxelize``: gather voxel features back to points.

All outputs are padded to a static ``num_voxels`` capacity with a validity
count; voxels appear in lexicographic (batch, z, y, x) order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import segment
from ..core.packing import KEY_MAX, pack_coords, pair_lexsort


class VoxelMaps(NamedTuple):
    voxel_coords: jax.Array  # [V, 4] int32 (batch, z, y, x); padded rows = -1
    point2voxel: jax.Array  # [N] int32 point -> voxel id; -1 for invalid points
    voxel_first_point: jax.Array  # [V] int32 first (lowest-index) member point; -1 pad
    num_voxels: jax.Array  # scalar int32
    valid_voxel: jax.Array  # [V] bool
    overflow: jax.Array = None  # scalar int32: unique voxels dropped by the cap


def voxelize(coords: jax.Array, extents, num_voxels: int, valid=None) -> VoxelMaps:
    """Deduplicate integer voxel coordinates.

    Args:
      coords: [N, 4] int32 (batch, z, y, x), non-negative for valid rows.
      extents: static (Z, Y, X) bounds used for key packing.
      num_voxels: static output capacity (>= true number of unique voxels;
        if smaller, excess voxels are dropped deterministically from the end
        of the sort order).
      valid: optional [N] bool mask of real (non-padding) points.

    Returns: VoxelMaps.
    """
    n = coords.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    hi, lo = pack_coords(coords, extents, valid=valid)
    order = pair_lexsort(hi, lo)
    shi, slo = hi[order], lo[order]
    s_valid = shi != KEY_MAX
    is_new = (
        jnp.concatenate([jnp.array([True]), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
        & s_valid
    )
    ranks = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # voxel id per sorted point
    nvox = jnp.sum(is_new.astype(jnp.int32))
    ranks = jnp.where(s_valid & (ranks < num_voxels), ranks, -1)

    point2voxel = jnp.zeros((n,), dtype=jnp.int32).at[order].set(ranks)
    point2voxel = jnp.where(valid, point2voxel, -1)

    # first member point id per voxel (min of original point index)
    pt_idx = jnp.arange(n, dtype=jnp.int32)
    first_pt = segment.segment_min(
        jnp.where(point2voxel >= 0, pt_idx, jnp.iinfo(jnp.int32).max),
        point2voxel,
        num_voxels,
    )
    valid_voxel = jnp.arange(num_voxels) < jnp.minimum(nvox, num_voxels)
    first_pt = jnp.where(valid_voxel, first_pt, -1)

    voxel_coords = jnp.where(
        valid_voxel[:, None],
        coords[jnp.maximum(first_pt, 0)].astype(jnp.int32),
        -1,
    )
    return VoxelMaps(
        voxel_coords=voxel_coords,
        point2voxel=point2voxel,
        voxel_first_point=first_pt,
        num_voxels=jnp.minimum(nvox, num_voxels).astype(jnp.int32),
        valid_voxel=valid_voxel,
        overflow=jnp.maximum(nvox - num_voxels, 0).astype(jnp.int32),
    )


def voxel_feats_mean(feats: jax.Array, point2voxel: jax.Array, num_voxels: int):
    """Per-voxel mean of point features (the reference's mode-4 voxelization)."""
    return segment.segment_mean(feats, point2voxel, num_voxels)


def voxel_gather_first(values: jax.Array, maps: VoxelMaps):
    """Per-voxel value taken from the first member point (for labels)."""
    idx = jnp.maximum(maps.voxel_first_point, 0)
    out = values[idx]
    mask_shape = (maps.valid_voxel.shape[0],) + (1,) * (out.ndim - 1)
    return jnp.where(maps.valid_voxel.reshape(mask_shape), out, 0)


def devoxelize(voxel_feats: jax.Array, point2voxel: jax.Array):
    """Gather voxel features back to points (reference ``point_recover``,
    SPFormer/spformer/lib/pointgroup_ops/pointgroup_ops.py:80-115)."""
    idx = jnp.maximum(point2voxel, 0)
    out = voxel_feats[idx]
    mask_shape = point2voxel.shape + (1,) * (out.ndim - 1)
    return jnp.where((point2voxel >= 0).reshape(mask_shape), out, 0)
