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

from ..core.packing import (KEY_MAX, pack_coords, pair_lookup,
                            pair_searchsorted)
from ..ops.voxelize import voxelize
from .tensor import SparseGrid
from .window_conv import (
    TILE as _WTILE,
    WindowTables,
    build_window_tables,
    window_conv_enabled,
)


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
    # z/y-packed gather tables for the packed subm conv (sparse/conv.py
    # subm_conv_packed): 2(z) x 2(y) voxels share one block row, so the
    # 3x3x3 window spans 12 block rows instead of 27 voxel rows — the
    # dominant conv cost is XLA's row-rate-bound gather (docs/PERF.md)
    pack_parent: Optional[jax.Array] = None  # [V] block id
    pack_parity: Optional[jax.Array] = None  # [V] in [0,4): (z%2)*2 + y%2
    pack_nbr: Optional[jax.Array] = None  # [V, 12] block ids (-1 missing)
    # windowed monotone-gather kernel geometry (sparse/window_conv.py);
    # None when the kernel is disabled or the level is too small to pay
    wtab: Optional[WindowTables] = None


class UNetPlan(NamedTuple):
    levels: List[LevelPlan]


_SUBM_OFFSETS = [
    (dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
]
SUBM_CENTER = 13  # index of (0,0,0) in _SUBM_OFFSETS


def subm_neighbor_table(grid: SparseGrid) -> jax.Array:
    """[V, 27] neighbor indices for a 3x3x3 submanifold conv.

    Sort-based rank matching, ZERO random gathers. XLA's TPU dynamic
    gather runs at ~28M scalar rows/s, so the previous binary search
    (19 dependent gather steps over 27V queries) cost 1.6 s per level
    at V=262k; one lexicographic sort of the same data costs ~35 ms.

      1. merge the V sorted voxel keys with all 27V neighbor-target keys
         and sort by (hi, lo, tag) with queries (tag 0) BEFORE the equal
         key (tag 1);
      2. a query matches iff its equal-key run ends with a key element;
         runs are <= 28 long (27 offsets can target one cell, each from
         a distinct source voxel, + the key itself), so the run scan is
         27 static shifted compares — elementwise, no gathers;
      3. the matched voxel index is simply the number of key elements
         sorted strictly before the query (keys are inserted in voxel
         order, so merged key-rank == voxel row): one exclusive cumsum
         of the tag column;
      4. un-sort by a second sort on the payload column.
    """
    Z, Y, X = grid.spatial_shape
    extents = (Z, Y, X)
    hi, lo = pack_coords(grid.coords, extents, valid=grid.valid)
    c = grid.coords.astype(jnp.int32)
    b, z, y, x = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    v = grid.capacity

    q_hi_l, q_lo_l, ok_l = [], [], []
    for dz, dy, dx in _SUBM_OFFSETS:
        zq, yq, xq = z + dz, y + dy, x + dx
        ok = (grid.valid & (zq >= 0) & (zq < Z) & (yq >= 0) & (yq < Y)
              & (xq >= 0) & (xq < X))
        q_hi_l.append(jnp.where(ok, b * Z + zq, KEY_MAX))
        q_lo_l.append(jnp.where(ok, yq * X + xq, KEY_MAX))
        ok_l.append(ok)
    q_hi = jnp.stack(q_hi_l, 1).reshape(-1)  # [27V], flat index v*27 + k
    q_lo = jnp.stack(q_lo_l, 1).reshape(-1)
    q_ok = jnp.stack(ok_l, 1)  # [V, 27]

    nq = 27 * v
    m_hi = jnp.concatenate([q_hi, hi])
    m_lo = jnp.concatenate([q_lo, lo])
    # payload doubles as the tie-break: queries carry 0..nq-1 and keys
    # nq..nq+v-1, so sorting (hi, lo, payload) puts queries BEFORE their
    # equal key without a separate tag column (25% fewer sort bytes)
    payload = jnp.arange(nq + v, dtype=jnp.int32)
    s_hi, s_lo, s_pay = jax.lax.sort((m_hi, m_lo, payload), num_keys=3)
    s_tag = (s_pay >= nq).astype(jnp.int32)

    # rank of the next key at-or-after each position (= its voxel row)
    key_rank = jnp.cumsum(s_tag) - s_tag  # exclusive cumsum

    # does this element's equal-run end with a key? (runs <= 28; the key,
    # tag 1, sorts last within a run)
    n = nq + v
    pad_hi = jnp.concatenate([s_hi, jnp.full(27, KEY_MAX - 1, jnp.int32)])
    pad_lo = jnp.concatenate([s_lo, jnp.full(27, KEY_MAX - 1, jnp.int32)])
    pad_tag = jnp.concatenate([s_tag, jnp.zeros(27, jnp.int32)])
    match = jnp.zeros(n, bool)
    still_eq = jnp.ones(n, bool)
    for k in range(1, 28):
        eq_k = (pad_hi[k:k + n] == s_hi) & (pad_lo[k:k + n] == s_lo)
        still_eq = still_eq & eq_k
        match = match | (still_eq & (pad_tag[k:k + n] == 1))
    nbr_sorted = jnp.where(match & (s_tag == 0), key_rank, -1)

    _, nbr_flat = jax.lax.sort((s_pay, nbr_sorted), num_keys=1)
    nbr = nbr_flat[:nq].reshape(v, 27)
    return jnp.where(q_ok, nbr, -1)


def zy_pack_tables(grid: SparseGrid):
    """Build the z/y-packed gather tables for ``subm_conv_packed``.

    Blocks of 2(z) x 2(y) x 1(x) voxels collapse into one table row; a 3x3x3
    window then spans <= 12 block rows (2 z-blocks x 2 y-blocks x 3 x
    columns) instead of 27 voxel rows. Rows up to ~512B gather at the same
    row rate as 128B ones on this TPU (docs/PERF.md), so fewer-but-wider
    rows cut the conv's dominant gather cost ~1.6x.

    Returns (parent [V] block id, parity [V] = (z%2)*2 + y%2,
    nbr [V, 12] block id per (tz, ty, dx) in loop order, -1 missing).
    """
    Z, Y, X = grid.spatial_shape
    bz, by = (Z + 1) // 2, (Y + 1) // 2
    c = grid.coords.astype(jnp.int32)
    valid = grid.valid
    v = grid.capacity

    block_coords = jnp.stack([c[:, 0], c[:, 1] // 2, c[:, 2] // 2, c[:, 3]], 1)
    block_coords = jnp.where(valid[:, None], block_coords, -1)
    maps = voxelize(block_coords, (bz, by, X), v, valid=valid)
    parent = maps.point2voxel
    parity = jnp.where(valid, (c[:, 1] % 2) * 2 + (c[:, 2] % 2), 0)

    hi, lo = pack_coords(maps.voxel_coords, (bz, by, X), valid=maps.valid_voxel)
    base_z = jnp.floor_divide(c[:, 1] - 1, 2)
    base_y = jnp.floor_divide(c[:, 2] - 1, 2)
    qcs, qvs = [], []
    for tz in (0, 1):
        for ty in (0, 1):
            for dx in (-1, 0, 1):
                qz, qy, qx = base_z + tz, base_y + ty, c[:, 3] + dx
                qc = jnp.stack([c[:, 0], qz, qy, qx], 1)
                ok = (valid & (qz >= 0) & (qz < bz) & (qy >= 0) & (qy < by)
                      & (qx >= 0) & (qx < X))
                qcs.append(qc)
                qvs.append(ok)
    qc_all = jnp.concatenate(qcs, axis=0)
    qv_all = jnp.concatenate(qvs, axis=0)
    qhi, qlo = pack_coords(qc_all, (bz, by, X), valid=qv_all)
    idx, _found = pair_lookup(hi, lo, qhi, qlo)
    nbr = jnp.transpose(idx.reshape(12, v))
    return parent, parity, nbr


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


def build_unet_plan(grid: SparseGrid, num_levels: int,
                    shrink: "float | tuple" = 0.5,
                    pack_levels: int = 0,
                    use_window: bool | None = None) -> UNetPlan:
    """Precompute subm neighbor tables + down maps for all U-Net levels.

    ``shrink`` is either one factor (capacity at level l+1 =
    ``capacity_l * shrink``; bucketless exact value to keep one compiled
    program per top-level capacity) or a PER-LEVEL schedule of
    ``num_levels - 1`` factors.  Measured occupancy decays superlinearly
    with depth (fills 0.84 / 1.00(!) / 0.68 / 0.27 / 0.12 / 0.04 / 0.02 at
    a flat 0.5 on the 262k bench scene — docs/PERF.md), so a flat factor
    both TRUNCATES the first level and pads the deep ones; conv cost
    scales with capacity, not occupancy.  Overflow drops the tail of the
    coarse sort order deterministically and is counted (dropped_next).

    The first ``pack_levels`` levels also get z/y-packed gather tables
    (``zy_pack_tables``) for the opt-in packed conv experiment (default 0:
    measured slower than the plain gather-GEMM on v5e, see
    conv.packed_profitable).

    Levels with >= 8192 capacity also get windowed-kernel geometry
    (sparse/window_conv.py) when the kernel is enabled; the env flag is
    resolved HERE (outside jit) so toggling it invalidates the trace.
    Callers that are themselves jitted (models/prepare.py) must resolve the
    flag outside their trace and pass ``use_window`` explicitly — a bare
    env read inside their trace would be baked in at first compile.
    """
    if use_window is None:
        use_window = window_conv_enabled()
    if isinstance(shrink, (tuple, list)):
        assert len(shrink) == num_levels - 1, (
            f"per-level shrink schedule needs {num_levels - 1} factors, "
            f"got {len(shrink)}")
        shrink = tuple(float(s) for s in shrink)
    else:
        shrink = float(shrink)
    return _build_unet_plan_jit(grid, num_levels, shrink, pack_levels,
                                bool(use_window), _window_tile_schedule())


def _window_tile_schedule() -> tuple:
    """Per-level window-kernel tile (docs/PERF.md tile sweep: T=512 wins at
    the C=64 level — level 1 for media-32 models — while T=256 wins at
    C=32 and C=96). GAPRO_WINDOW_T_SCHED="256,512,..." overrides; levels
    beyond the list use the default tile."""
    import os

    sched = os.environ.get("GAPRO_WINDOW_T_SCHED", f"{_WTILE},512")
    return tuple(int(s) for s in sched.split(",") if s)


def _tile_for(tiles: tuple, lvl: int, capacity: int) -> int:
    t = tiles[lvl] if lvl < len(tiles) else _WTILE
    if capacity % t:  # externally-sized caps fall back to the default tile
        t = _WTILE
    return t


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _build_unet_plan_jit(grid: SparseGrid, num_levels: int, shrink,
                         pack_levels: int, use_window: bool,
                         tiles: tuple) -> UNetPlan:
    # windowed kernel needs a tile-multiple capacity and enough voxels to
    # beat the plain gather-GEMM's fixed costs
    levels = []
    g = grid
    for lvl in range(num_levels):
        nbr = subm_neighbor_table(g)
        wtab = None
        tile = _tile_for(tiles, lvl, g.capacity)
        if use_window and g.capacity % tile == 0 and g.capacity >= 8192:
            wtab = build_window_tables(nbr, tile=tile)
        if lvl < pack_levels:
            pk_parent, pk_parity, pk_nbr = zy_pack_tables(g)
        else:
            pk_parent = pk_parity = pk_nbr = None
        if lvl < num_levels - 1:
            # round to the NEXT level's tile so every level stays eligible
            # for the windowed conv kernel at its scheduled tile; below the
            # kernel's 8192-capacity eligibility floor the schedule is
            # irrelevant and the default tile keeps tiny plans tight
            s = shrink[lvl] if isinstance(shrink, tuple) else shrink
            nt = (tiles[lvl + 1]
                  if lvl + 1 < len(tiles) and int(g.capacity * s) >= 8192
                  else _WTILE)
            out_cap = max(int(g.capacity * s), nt)
            out_cap = (out_cap + nt - 1) // nt * nt
            g_next, parent, offset_id, child, dropped = downsample_grid(g, out_cap)
            levels.append(LevelPlan(grid=g, subm_nbr=nbr, parent=parent,
                                    offset_id=offset_id, down_child=child,
                                    dropped_next=dropped,
                                    pack_parent=pk_parent, pack_parity=pk_parity,
                                    pack_nbr=pk_nbr, wtab=wtab))
            g = g_next
        else:
            levels.append(LevelPlan(grid=g, subm_nbr=nbr, parent=None,
                                    offset_id=None,
                                    dropped_next=jnp.zeros((), jnp.int32),
                                    pack_parent=pk_parent, pack_parity=pk_parity,
                                    pack_nbr=pk_nbr, wtab=wtab))
    return UNetPlan(levels=levels)
