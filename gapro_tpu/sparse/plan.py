"""Rulebook construction for sparse convolutions.

Replaces spconv's hash-map rulebook builders with sort + binary search
(TPU-friendly, fully on device, static shapes):

  * submanifold 3x3x3 neighbor table: for each active voxel and each of the
    27 kernel offsets, the index of the neighboring active voxel (or -1) —
    found by binary search over the grid's sorted (hi, lo) coordinate keys.
  * stride-2 down map: output grid = unique(coords // 2); each input voxel
    records its parent output voxel and which of the 8 kernel offsets
    (z%2, y%2, x%2) it occupies.  The inverse conv reuses the same map
    transposed — exactly spconv's ``indice_key`` sharing semantics
    (ISBNet/isbnet/model/blocks.py:216-233).

``build_unet_plan`` precomputes the whole level hierarchy once per forward;
the U-Net then runs pure gather-GEMMs against it.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..core.packing import pack_coords, pair_lookup
from ..ops.voxelize import voxelize
from .tensor import SparseGrid


@flax.struct.dataclass
class LevelPlan:
    grid: SparseGrid
    subm_nbr: jax.Array  # [V, 27] int32 neighbor voxel index, -1 missing
    # down maps to the NEXT (coarser) level; None at the deepest level
    parent: Optional[jax.Array]  # [V] int32 index into next level, -1 invalid
    offset_id: Optional[jax.Array]  # [V] int32 in [0, 8)
    # inverse map: input voxel per (coarse voxel, kernel offset), -1 absent —
    # the scatter-free down-conv gather table (offset within parent is unique)
    down_child: Optional[jax.Array] = None  # [V_next, 8] int32
    # unique coarse voxels dropped by the next level's capacity (overflow
    # counter — "no silent caps"); 0 at the deepest level
    dropped_next: Optional[jax.Array] = None  # scalar int32


class UNetPlan(NamedTuple):
    levels: List[LevelPlan]


_SUBM_OFFSETS = [
    (dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
]
SUBM_CENTER = 13  # index of (0,0,0) in _SUBM_OFFSETS


def subm_neighbor_table(grid: SparseGrid) -> jax.Array:
    """[V, 27] neighbor indices for a 3x3x3 submanifold conv."""
    Z, Y, X = grid.spatial_shape
    extents = (Z, Y, X)
    hi, lo = pack_coords(grid.coords, extents, valid=grid.valid)
    # grid invariant: coords already sorted, so (hi, lo) are sorted.
    offs = jnp.asarray(_SUBM_OFFSETS, jnp.int32)  # [27, 3]
    nbr_coords = grid.coords[:, None, :].astype(jnp.int32) + jnp.pad(
        offs, ((0, 0), (1, 0))
    )  # [V, 27, 4] (batch unchanged)
    in_bounds = (
        (nbr_coords[..., 1] >= 0)
        & (nbr_coords[..., 1] < Z)
        & (nbr_coords[..., 2] >= 0)
        & (nbr_coords[..., 2] < Y)
        & (nbr_coords[..., 3] >= 0)
        & (nbr_coords[..., 3] < X)
        & grid.valid[:, None]
    )
    flat = nbr_coords.reshape(-1, 4)
    qhi, qlo = pack_coords(flat, extents, valid=in_bounds.reshape(-1))
    idx, _found = pair_lookup(hi, lo, qhi, qlo)
    return idx.reshape(grid.capacity, 27)


def downsample_grid(grid: SparseGrid, out_capacity: int) -> Tuple[SparseGrid, jax.Array, jax.Array]:
    """Stride-2 kernel-2 downsample: coarse grid + (parent, offset_id) maps."""
    coarse_coords = jnp.concatenate(
        [grid.coords[:, :1], grid.coords[:, 1:] // 2], axis=1
    )
    coarse_coords = jnp.where(grid.valid[:, None], coarse_coords, -1)
    Z, Y, X = grid.spatial_shape
    out_shape = ((Z + 1) // 2, (Y + 1) // 2, (X + 1) // 2)
    maps = voxelize(coarse_coords, out_shape, out_capacity, valid=grid.valid)
    out_grid = SparseGrid(
        coords=maps.voxel_coords,
        valid=maps.valid_voxel,
        num_voxels=maps.num_voxels,
        spatial_shape=out_shape,
        batch_size=grid.batch_size,
    )
    rem = jnp.where(grid.valid[:, None], grid.coords[:, 1:] % 2, 0)
    offset_id = rem[:, 0] * 4 + rem[:, 1] * 2 + rem[:, 2]

    parent = maps.point2voxel
    child = jnp.full((out_capacity, 8), -1, jnp.int32)
    rows = jnp.where(parent >= 0, parent, out_capacity)  # OOB rows dropped
    child = child.at[rows, offset_id].set(
        jnp.arange(grid.capacity, dtype=jnp.int32), mode="drop"
    )
    return out_grid, parent, offset_id, child, maps.overflow


@partial(jax.jit, static_argnums=(1, 2))
def build_unet_plan(grid: SparseGrid, num_levels: int, shrink: float = 0.5) -> UNetPlan:
    """Precompute subm neighbor tables + down maps for all U-Net levels.

    Capacity at level l+1 is ``capacity_l * shrink`` (bucketless exact value
    to keep one compiled program per top-level capacity).  Real scans reduce
    ~4x per stride-2 level, so 0.5 is conservative; overflow drops the tail
    of the coarse sort order deterministically.
    """
    levels = []
    g = grid
    for lvl in range(num_levels):
        nbr = subm_neighbor_table(g)
        if lvl < num_levels - 1:
            out_cap = max(int(g.capacity * shrink), 256)
            g_next, parent, offset_id, child, dropped = downsample_grid(g, out_cap)
            levels.append(LevelPlan(grid=g, subm_nbr=nbr, parent=parent,
                                    offset_id=offset_id, down_child=child,
                                    dropped_next=dropped))
            g = g_next
        else:
            levels.append(LevelPlan(grid=g, subm_nbr=nbr, parent=None,
                                    offset_id=None,
                                    dropped_next=jnp.zeros((), jnp.int32)))
    return UNetPlan(levels=levels)
