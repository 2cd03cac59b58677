"""Windowed monotone-gather submanifold conv (Pallas TPU kernel).

The plain gather-GEMM subm conv is bound by XLA's dynamic-gather row rate
(~330M rows/s => 21.9 ms at V=262k, C=32 — docs/PERF.md), ~20x under HBM
peak.  This kernel exploits two structural facts of the sorted voxel grid:

  * per kernel offset k, the neighbor indices ``nbr_k[i]`` are MONOTONE in
    the output index i (coords are lex-sorted; adding a constant offset
    preserves order), and
  * the 9 (dz, dy) offset GROUPS each cover their 3 dx variants within a
    +-1 index range, so for a tile of T consecutive outputs all of a
    group's neighbors live in one narrow contiguous window of the feature
    table (measured: W = 2T covers ~99.6% of neighbor entries on
    surface-like scenes).

Per output tile the kernel DMAs each group's [W, Cin] table window
HBM->VMEM (sequential streams, bandwidth-bound instead of row-bound) and
performs the local gather as a one-hot [W, T] matmul on the MXU.  Neighbors
falling outside their window ("escapees", ~0.4%) are fixed up by a cheap
XLA gather+scatter correction pass outside the kernel.

All window geometry (win_lo, local_idx, escapee list) is a pure function of
the level's voxel coordinates — computed once per UNet plan in
:func:`build_window_tables` and shared by every conv at that level.

The backward pass reuses the SAME kernel: the subm neighbor relation is
symmetric (nbr_k[i] = j  <=>  nbr_{26-k}[j] = i), so d(table) is a windowed
conv of d(out) with offset-reversed, transposed weights, and d(weights)
accumulates per-tile (gathered^T @ dout) over the grid.

Replaces spconv's SubMConv3d CUDA engine (ISBNet/isbnet/model/blocks.py:
183-233 usage) on the hot path.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# outputs per grid step.  GAPRO_WINDOW_T overrides for experiments; larger
# tiles amortize per-tile DMA waits / loop overhead and fill the MXU's N
# dim, at the cost of one-hot FLOPs proportional to WINDOW (span stats say
# W = 2T keeps escapees ~0.4% at T=256 AND T=512)
TILE = int(os.environ.get("GAPRO_WINDOW_T", "256"))
assert TILE % 256 == 0
# table rows DMA'd per (group, tile).  2T covers ~99.6% of neighbor
# entries on surface scenes.  GAPRO_WINDOW_W overrides for experiments;
# 1.5T measured WORSE (one-hot matmul K drops below the 128 MXU tile for
# rpack=4, so the 25% FLOP cut is outweighed by pad waste) — W/rpack must
# stay a multiple of 128, i.e. W=2T is the minimum usable for Cin=32
WINDOW = int(os.environ.get("GAPRO_WINDOW_W", str(2 * TILE)))
assert WINDOW % 128 == 0
# issue hoisting: share one wide one-hot compare + one weight matmul
# across the 3 dx offsets of each (dz, dy) group (the kernel is
# issue-bound at C<=64, docs/PERF.md).  Round-5 chip A/B (tools/
# bench_window.py, bitwise-identical fwd, grads at fp32 tolerance):
# C=32 fwd 16.3 -> 14.0 ms, f+b 27.8 -> 22.8 (-18%); C=64/T=512 fwd
# 14.1 -> 13.2, f+b 23.1 -> 21.3.  Applies only to blockdiag widths
# (L*Cin * L*Cout <= 128^2); wide channels keep the per-offset form.
_FUSED_MASKS = os.environ.get("GAPRO_WINDOW_FUSED_MASKS", "1") == "1"
N_GROUPS = 9  # (dz, dy) pairs; each covers dx in {-1, 0, 1}

_CONTRACT_00 = (((0,), (0,)), ((), ()))  # dot_general: contract dim0 x dim0

# window buffers per DMA chain.  3 buffers give a lookahead-2 pipeline that
# carries across grid steps (9 groups % 3 == 0 keeps slot indices static per
# group, so tile i+1's first windows are already in flight while tile i
# computes) — the kernel is per-tile DMA-WAIT bound (docs/PERF.md roofline:
# ~9.8 us/tile against ~1.7 us of MXU time), so deepening the pipeline is
# the direct lever.  Wide channels (Cin or Cout > 128) fall back to 2
# buffers / lookahead-1 to respect VMEM (the deep UNet levels are a small
# share of the time anyway).
_NBUF_PIPELINED = 3


def _nbuf_for(*channels: int) -> int:
    return _NBUF_PIPELINED if max(channels) <= 128 else 2


def _pipe_start(dma, g, i, nbuf):
    """Issue the DMA that keeps the pipeline `nbuf - 1` groups ahead of the
    group being computed; past the last group, prefetch the next tile's
    leading windows (only valid when 9 % nbuf == 0 keeps slots aligned)."""
    la = nbuf - 1
    nxt = g + la
    if nxt < N_GROUPS:
        dma(nxt % nbuf, nxt, i).start()
    elif nbuf == _NBUF_PIPELINED:
        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            dma(nxt % nbuf, nxt - N_GROUPS, i + 1).start()


def _pipe_prologue(dma, i, nbuf):
    """First grid step: fill the lookahead.  Later steps inherit their
    leading windows from the previous step's epilogue prefetch (nbuf == 3)
    or restart the chain (nbuf == 2, slot pattern not tile-periodic)."""
    if nbuf == _NBUF_PIPELINED:
        @pl.when(i == 0)
        def _():
            for g in range(nbuf - 1):
                dma(g % nbuf, g, i).start()
    else:
        dma(0, 0, i).start()


def window_conv_enabled() -> bool:
    """On by default on real TPU backends; GAPRO_WINDOW_CONV=0 disables,
    =1 forces (interpret mode when off-TPU, for tests)."""
    mode = os.environ.get("GAPRO_WINDOW_CONV", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return jax.default_backend() not in ("cpu", "gpu")


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


import flax.struct


@flax.struct.dataclass
class WindowTables:
    """Geometry tables for one level (see build_window_tables).

    ``tile``/``window`` are STATIC per-level geometry (pytree metadata, so a
    different tile is a different compiled program — the per-level tile
    choice exists because T=512 wins at C=64 while T=256 wins at C=32,
    docs/PERF.md tile sweep)."""

    win_lo: jax.Array  # [9, n_tiles] int32 window base row per (group, tile)
    local_idx: jax.Array  # [27, V] int32 in [0, W) or -1 (missing/escapee)
    esc_out: jax.Array  # [E] int32 output row of escapee entries (-1 pad)
    esc_src: jax.Array  # [E] int32 table row of escapee entries
    esc_k: jax.Array  # [E] int32 kernel offset in [0, 27)
    esc_count: jax.Array  # scalar int32 true escapee count (<= E)
    esc_overflow: jax.Array  # scalar int32 escapees dropped by capacity
    tile: int = flax.struct.field(pytree_node=False, default=TILE)
    window: int = flax.struct.field(pytree_node=False, default=2 * TILE)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def build_window_tables(nbr: jax.Array, esc_cap: int | None = None,
                        tile: int | None = None,
                        window: int | None = None) -> WindowTables:
    """Derive window geometry from a level's [V, 27] neighbor table.

    Pure geometry — one call per UNet level per plan, shared by all convs
    at that level.

    Args:
      nbr: [V, 27] int32 neighbor index or -1 (from subm_neighbor_table);
        V must be a multiple of `tile`.
      esc_cap: static escapee-entry capacity (default max(V//16, 512) —
        >= 10x the measured ~0.4% rate; overflow is counted, never silent).
      tile/window: per-level geometry override (defaults: module TILE and
        its env-tunable WINDOW for the default tile, else 2*tile).
    """
    if tile is None:
        tile = TILE
    if window is None:
        window = WINDOW if tile == TILE else 2 * tile
    assert tile % 256 == 0 and window % 128 == 0
    v = nbr.shape[0]
    assert v % tile == 0, f"capacity {v} must be a multiple of {tile}"
    n_tiles = v // tile
    if esc_cap is None:
        esc_cap = max(_round_up(v // 16, 128), 512)

    nbr_t = nbr.reshape(n_tiles, tile, 9, 3)  # [t, T, g, dx]
    present = nbr_t >= 0
    # window base: min neighbor index in the tile per group (clamped so the
    # fixed-size DMA slice stays inside the padded table)
    lo = jnp.min(jnp.where(present, nbr_t, v), axis=(1, 3))  # [t, 9]
    lo = jnp.where(lo == v, 0, lo)
    lo = jnp.minimum(lo, jnp.maximum(v - window, 0))
    # rows are packed L-per-table-row in the kernel (L in {1,2,4}) and the
    # packed memref's sublane tile is 8 (fp32) / 16 (bf16), so DMA bases
    # must be divisible by 16*L <= 64; a 64-aligned base covers every
    # layout and dtype
    lo = (lo - jnp.remainder(lo, 64)).astype(jnp.int32)
    win_lo = jnp.transpose(lo)  # [9, t]

    rel = nbr_t - lo[:, None, :, None]  # [t, T, g, dx]
    in_win = present & (rel >= 0) & (rel < window)
    local_idx = jnp.where(in_win, rel, -1).reshape(v, 27).astype(jnp.int32)

    # escapees: present but outside the window.  Two-stage nonzero
    # compaction (O(V) cumsum each — argsort here cost ~35 ms/level on
    # chip, an unacceptable per-forward plan cost): (1) gather the rows
    # that have any escapee, (2) compact their flattened 27 entries.
    esc = (present & ~in_win).reshape(v, 27)
    row_cap = max(esc_cap // 4, 128)
    row_has = jnp.any(esc, axis=1)
    (row_idx,) = jnp.nonzero(row_has, size=row_cap, fill_value=-1)
    row_live = row_idx >= 0
    rows_c = jnp.maximum(row_idx, 0)
    cand_esc = esc[rows_c] & row_live[:, None]  # [R, 27]
    cand_nbr = nbr[rows_c]
    flat_esc = cand_esc.reshape(-1)
    (order2,) = jnp.nonzero(flat_esc, size=esc_cap, fill_value=-1)
    is_esc = order2 >= 0
    order2c = jnp.maximum(order2, 0)
    esc_out = jnp.where(is_esc, rows_c[order2c // 27], -1)
    esc_k = jnp.where(is_esc, (order2c % 27).astype(jnp.int32), 0)
    esc_src = jnp.where(is_esc, cand_nbr.reshape(-1)[order2c], 0)

    n_esc = jnp.sum(esc.astype(jnp.int32))
    captured = jnp.sum(is_esc.astype(jnp.int32))
    # truncation at either compaction stage shows up as captured < n_esc
    overflow = jnp.maximum(n_esc - captured, 0)
    return WindowTables(
        win_lo=win_lo,
        local_idx=jnp.transpose(local_idx),  # [27, V]
        esc_out=esc_out.astype(jnp.int32),
        esc_src=esc_src.astype(jnp.int32),
        esc_k=esc_k,
        esc_count=captured.astype(jnp.int32),
        esc_overflow=overflow.astype(jnp.int32),
        tile=tile,
        window=window,
    )


def _gather_tile(lidx_ref, win, k, rpack, cin, tile, window):
    """Local one-hot gather of `tile` rows from a packed [W/L, L*Cin] window.

    Row j of the logical [W, Cin] window lives at packed row j//L, lane
    block j%L.  One [W/L, T] one-hot per sub-slot keeps every memref
    access full-lane-width (Mosaic tiling); total FLOPs equal the unpacked
    [W, T] @ [W, Cin] form.  (A single full-width one-hot matmul with a
    VPU sub-slot select was measured SLOWER — the per-row lane extracts
    cost more than the extra MXU tiles save.)  Missing neighbors
    (idx = -1): lax.rem gives r = -1, matching no sub-slot.
    """
    idx = lidx_ref[k : k + 1, :]  # [1, T]
    colq = jax.lax.broadcasted_iota(jnp.int32, (window // rpack, tile), 0)
    q = jax.lax.div(idx, rpack)
    r = jax.lax.rem(idx, rpack)
    gath = None
    for s in range(rpack):
        p = ((colq == q) & (r == s)).astype(win.dtype)  # [W/L, T]
        win_s = win[:, s * cin : (s + 1) * cin]  # [W/L, Cin] value slice
        t = jax.lax.dot_general(
            p, win_s, _CONTRACT_00, preferred_element_type=jnp.float32
        )  # [T, Cin]
        gath = t if gath is None else gath + t
    return gath


def _fwd_kernel(win_lo_ref, lidx_ref, table_hbm, wblk_ref, out_ref,
                *scratch, rpack, cin, cout, blockdiag, tile, window):
    """One grid step = TILE output rows, transposed [Cout, T] accumulator.

    Full-MXU formulation: per offset k the window is first contracted with
    a block-diagonal weight (win4 [W/L, L*Cin] @ Wblk_k [L*Cin, L*Cout] —
    all dims >= 128), then gathered with ONE packed-row one-hot
    (dot_general over W/L -> G [L*Cout, T]), and the output sub-slot is
    selected by cheap sublane slices of G with [1, T]-oriented masks.
    The v1 per-sub-slot one-hot form had N = Cin = 32 (quarter-full MXU
    tiles) and measured ~2x slower.

    win_lo_ref: [9, n_tiles] SMEM; lidx_ref: [27, T] VMEM;
    table_hbm: [Vp/L, L*Cin] HBM; wblk_ref: [27*L*Cin, L*Cout] VMEM
    (block-diagonal per offset); out_ref: [Cout, T] block of a [Cout, V]
    output (transposed back by XLA outside); scratch: nbuf [W/L, L*Cin]
    window buffers + one DMA semaphore array (pipeline depth nbuf - 1).
    """
    i = pl.program_id(0)
    *bufs, sem = scratch
    nbuf = len(bufs)
    lcin = rpack * cin
    lcout = rpack * cout

    def dma(slot, g, ii):
        base = pl.multiple_of(win_lo_ref[g, ii] // rpack, 16)
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(base, window // rpack), :],
            bufs[slot],
            sem.at[slot],
        )

    _pipe_prologue(dma, i, nbuf)
    colq = jax.lax.broadcasted_iota(jnp.int32, (window // rpack, tile), 0)
    fused = _FUSED_MASKS and blockdiag

    acc = jnp.zeros((cout, tile), jnp.float32)
    for g in range(N_GROUPS):  # static unroll: Mosaic needs static slices
        slot = g % nbuf
        _pipe_start(dma, g, i, nbuf)
        dma(slot, g, i).wait()
        win = bufs[slot][:]  # [W/L, L*Cin]
        if fused:
            # per-GROUP issue hoisting (GAPRO_WINDOW_FUSED_MASKS): the 3
            # dx offsets share one wide [W/L, 3T] one-hot compare, one
            # div/rem pair, and one [L*Cin, 3*L*Cout] weight matmul —
            # the kernel is issue-bound, not FLOP-bound (docs/PERF.md),
            # so fewer/wider VPU-MXU alternations are the lever. The gt
            # contraction stays per-dx (a single [.,3LCout]x[.,3T]
            # dot_general would compute 9 blocks for its 3 diagonal ones).
            idx3 = lidx_ref[3 * g : 3 * g + 3, :]  # [3, T]
            q3 = jax.lax.div(idx3, rpack).reshape(1, 3 * tile)
            r3 = jax.lax.rem(idx3, rpack)  # [3, T]
            colq3 = jax.lax.broadcasted_iota(
                jnp.int32, (window // rpack, 3 * tile), 0)
            p43 = (colq3 == q3).astype(win.dtype)  # [W/L, 3T]
            # fused layout (prepared by the dispatcher): row block g is
            # [L*Cin, 3*L*Cout] with the 3 dx offsets side by side
            win_w3 = jnp.dot(
                win, wblk_ref[g * lcin : (g + 1) * lcin, :],
                preferred_element_type=jnp.float32,
            )  # [W/L, 3*L*Cout]
            for dx in range(3):
                gt = jax.lax.dot_general(
                    win_w3[:, dx * lcout : (dx + 1) * lcout].astype(win.dtype),
                    p43[:, dx * tile : (dx + 1) * tile],
                    _CONTRACT_00,
                    preferred_element_type=jnp.float32,
                )  # [L*Cout, T]
                for s in range(rpack):
                    m = (r3[dx : dx + 1, :] == s).astype(jnp.float32)
                    acc = acc + m * gt[s * cout : (s + 1) * cout, :]
            continue
        for dx in range(3):
            k = g * 3 + dx
            if blockdiag:
                win_w = jnp.dot(
                    win, wblk_ref[k * lcin : (k + 1) * lcin, :],
                    preferred_element_type=jnp.float32,
                )  # [W/L, L*Cout]
            else:
                # wide channels: the block-diagonal weight would not fit
                # VMEM (27*(L*Cin)*(L*Cout) floats); per-sub-slot matmuls
                # against the plain [Cin, Cout] weight keep dims >= Cin
                wk = wblk_ref[k * cin : (k + 1) * cin, :]  # [Cin, Cout]
                win_w = jnp.concatenate(
                    [jnp.dot(win[:, s * cin : (s + 1) * cin], wk,
                             preferred_element_type=jnp.float32)
                     for s in range(rpack)], axis=1)  # [W/L, L*Cout]
            idx = lidx_ref[k : k + 1, :]  # [1, T]
            q = jax.lax.div(idx, rpack)
            r = jax.lax.rem(idx, rpack)  # -1 for missing -> no sub-slot
            p4 = (colq == q).astype(win.dtype)  # [W/L, T]
            gt = jax.lax.dot_general(
                win_w.astype(win.dtype), p4, _CONTRACT_00,
                preferred_element_type=jnp.float32,
            )  # [L*Cout, T]
            for s in range(rpack):
                m = (r == s).astype(jnp.float32)  # [1, T]
                acc = acc + m * gt[s * cout : (s + 1) * cout, :]
    out_ref[:] = acc


def _dw_kernel(win_lo_ref, lidx_ref, table_hbm, dout_ref, dw_ref,
               *scratch, rpack, cin, tile, window):
    """d(weights)[k] += gathered_k^T @ dout, accumulated over the grid."""
    i = pl.program_id(0)
    *bufs, sem = scratch
    nbuf = len(bufs)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def dma(slot, g, ii):
        base = pl.multiple_of(win_lo_ref[g, ii] // rpack, 16)
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(base, window // rpack), :],
            bufs[slot],
            sem.at[slot],
        )

    _pipe_prologue(dma, i, nbuf)

    for g in range(N_GROUPS):  # static unroll: Mosaic needs static slices
        slot = g % nbuf
        _pipe_start(dma, g, i, nbuf)
        dma(slot, g, i).wait()
        win = bufs[slot][:]
        for dx in range(3):
            k = g * 3 + dx
            gath = _gather_tile(lidx_ref, win, k, rpack, cin, tile, window)
            dwk = jax.lax.dot_general(
                gath.astype(win.dtype),
                dout_ref[:].astype(win.dtype),
                _CONTRACT_00,
                preferred_element_type=jnp.float32,
            )  # [Cin, Cout]
            dw_ref[k * cin : (k + 1) * cin, :] += dwk


def _bwd_fused_kernel(win_lo_ref, lidx_ref, feats_hbm, dout_hbm, wrevblk_ref,
                      dout_tile_ref, dfeats_ref, dw_ref,
                      *scratch, rpack_in, rpack_out, cin, cout, blockdiag,
                      tile, window):
    """Fused backward: ONE window-DMA chain per tile computes BOTH
    d(feats) and d(weights).

    The two backward contractions share everything latency-bound about a
    tile: the 9-group serial DMA-wait chain, the per-offset local index
    loads, and (when Cin == Cout) the one-hot gather masks. PERF.md's
    roofline analysis shows the kernel is per-tile-latency bound, not
    FLOP bound, so running the chain once instead of twice (separate
    dfeats + dW passes) is nearly 2x on the backward.

      * d(feats) tile  = fwd-form gather of the DOUT table with
        offset-reversed transposed weights (same math as
        `_apply(dout, w_rev, tabs)` — see `_window_conv_bwd`);
      * d(weights)[k] += gathered-feats_k^T @ dout_tile, grid-accumulated
        (same math as `_dw_kernel`).
    """
    i = pl.program_id(0)
    *bufs, sem = scratch
    nbuf = len(bufs) // 2
    fbufs, dbufs = bufs[:nbuf], bufs[nbuf:]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    lcout = rpack_out * cout

    def fdma(slot, g, ii):
        base = pl.multiple_of(win_lo_ref[g, ii] // rpack_in, 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(base, window // rpack_in), :],
            fbufs[slot], sem.at[slot])

    def ddma(slot, g, ii):
        base = pl.multiple_of(win_lo_ref[g, ii] // rpack_out, 16)
        return pltpu.make_async_copy(
            dout_hbm.at[pl.ds(base, window // rpack_out), :],
            dbufs[slot], sem.at[nbuf + slot])

    _pipe_prologue(fdma, i, nbuf)
    _pipe_prologue(ddma, i, nbuf)
    colq_out = jax.lax.broadcasted_iota(
        jnp.int32, (window // rpack_out, tile), 0)
    fused = _FUSED_MASKS and blockdiag
    lcin_o = rpack_out * cin

    acc = jnp.zeros((cin, tile), jnp.float32)  # d(feats), transposed
    for g in range(N_GROUPS):  # static unroll: Mosaic needs static slices
        slot = g % nbuf
        _pipe_start(fdma, g, i, nbuf)
        _pipe_start(ddma, g, i, nbuf)
        fdma(slot, g, i).wait()
        ddma(slot, g, i).wait()
        fwin = fbufs[slot][:]  # [W/Li, Li*Cin]
        dwin = dbufs[slot][:]  # [W/Lo, Lo*Cout]
        if fused:
            # per-group issue hoisting, mirroring the forward kernel: the
            # 3 dx offsets share one wide one-hot compare per packing and
            # one reversed-weight matmul (see _fwd_kernel / PERF.md)
            idx3 = lidx_ref[3 * g : 3 * g + 3, :]  # [3, T]
            q3o = jax.lax.div(idx3, rpack_out).reshape(1, 3 * tile)
            r3o = jax.lax.rem(idx3, rpack_out)  # [3, T]
            colq3o = jax.lax.broadcasted_iota(
                jnp.int32, (window // rpack_out, 3 * tile), 0)
            p43 = (colq3o == q3o).astype(dwin.dtype)  # [W/Lo, 3T]
            win_w3 = jnp.dot(
                dwin, wrevblk_ref[g * lcout : (g + 1) * lcout, :],
                preferred_element_type=jnp.float32,
            )  # [W/Lo, 3*Lo*Cin]
            # dW gather masks: wide q-compare once, sub-slot ANDs per s
            q3i = jax.lax.div(idx3, rpack_in).reshape(1, 3 * tile)
            r3i = jax.lax.rem(idx3, rpack_in).reshape(1, 3 * tile)
            colq3i = jax.lax.broadcasted_iota(
                jnp.int32, (window // rpack_in, 3 * tile), 0)
            pq3 = colq3i == q3i  # [W/Li, 3T]
            ps3 = [
                (pq3 & (r3i == s)).astype(fwin.dtype)
                for s in range(rpack_in)
            ]
            for dx in range(3):
                k = g * 3 + dx
                gt = jax.lax.dot_general(
                    win_w3[:, dx * lcin_o : (dx + 1) * lcin_o]
                    .astype(dwin.dtype),
                    p43[:, dx * tile : (dx + 1) * tile],
                    _CONTRACT_00,
                    preferred_element_type=jnp.float32,
                )  # [Lo*Cin, T]
                for s in range(rpack_out):
                    m = (r3o[dx : dx + 1, :] == s).astype(jnp.float32)
                    acc = acc + m * gt[s * cin : (s + 1) * cin, :]
                gath = None
                for s in range(rpack_in):
                    t = jax.lax.dot_general(
                        ps3[s][:, dx * tile : (dx + 1) * tile],
                        fwin[:, s * cin : (s + 1) * cin],
                        _CONTRACT_00,
                        preferred_element_type=jnp.float32,
                    )  # [T, Cin]
                    gath = t if gath is None else gath + t
                dwk = jax.lax.dot_general(
                    gath.astype(fwin.dtype),
                    dout_tile_ref[:].astype(fwin.dtype),
                    _CONTRACT_00,
                    preferred_element_type=jnp.float32,
                )  # [Cin, Cout]
                dw_ref[k * cin : (k + 1) * cin, :] += dwk
            continue
        for dx in range(3):
            k = g * 3 + dx
            idx = lidx_ref[k : k + 1, :]  # [1, T]

            # ---- d(feats): fwd-form gather of the dout window --------
            q_o = jax.lax.div(idx, rpack_out)
            r_o = jax.lax.rem(idx, rpack_out)
            if blockdiag:
                win_w = jnp.dot(
                    dwin, wrevblk_ref[k * lcout : (k + 1) * lcout, :],
                    preferred_element_type=jnp.float32,
                )  # [W/Lo, Lo*Cin]
            else:
                wk = wrevblk_ref[k * cout : (k + 1) * cout, :]  # [Cout, Cin]
                win_w = jnp.concatenate(
                    [jnp.dot(dwin[:, s * cout : (s + 1) * cout], wk,
                             preferred_element_type=jnp.float32)
                     for s in range(rpack_out)], axis=1)  # [W/Lo, Lo*Cin]
            p4 = (colq_out == q_o).astype(dwin.dtype)  # [W/Lo, T]
            gt = jax.lax.dot_general(
                win_w.astype(dwin.dtype), p4, _CONTRACT_00,
                preferred_element_type=jnp.float32,
            )  # [Lo*Cin, T]
            for s in range(rpack_out):
                m = (r_o == s).astype(jnp.float32)  # [1, T]
                acc = acc + m * gt[s * cin : (s + 1) * cin, :]

            # ---- d(weights): gathered feats ^T @ dout tile ----------
            # (recomputing the one-hot masks here measured FASTER than
            # sharing p4 via a float multiply: bool-AND compares are the
            # cheaper VPU op)
            gath = _gather_tile(lidx_ref, fwin, k, rpack_in, cin, tile, window)
            dwk = jax.lax.dot_general(
                gath.astype(fwin.dtype),
                dout_tile_ref[:].astype(fwin.dtype),
                _CONTRACT_00,
                preferred_element_type=jnp.float32,
            )  # [Cin, Cout]
            dw_ref[k * cin : (k + 1) * cin, :] += dwk
    dfeats_ref[:] = acc


def _pallas_bwd_fused(feats_table, dout_table, win_lo, local_idx, w_rev,
                      dout, cin_p, cout_p, tile, window):
    """Dispatch the fused backward kernel.

    feats_table: padded packed-able [Vp, Cin_p]; dout_table: [Vp, Cout_p];
    w_rev: [27, Cout_p, Cin_p] (offset-reversed transposed weights);
    dout: [V, Cout_p] (tile stream for dW).
    Returns (dfeats_t [Cin_p, V], dw [27 * Cin_p, Cout_p]).
    """
    vp = feats_table.shape[0]
    rpack_in = _row_pack(cin_p)
    rpack_out = _row_pack(cout_p)
    nbuf = _nbuf_for(cin_p, cout_p)
    v = local_idx.shape[1]
    n_tiles = v // tile
    feats_p = feats_table.reshape(vp // rpack_in, rpack_in * cin_p)
    dout_p = dout_table.reshape(vp // rpack_out, rpack_out * cout_p)
    blockdiag = (rpack_out * cout_p) * (rpack_out * cin_p) <= 128 * 128
    if blockdiag:
        wblk = _block_diag_weights(w_rev.astype(dout_p.dtype), rpack_out)
        if _FUSED_MASKS:
            # fused-mask kernel layout (see _pallas_gather_gemm)
            lco, lci = rpack_out * cout_p, rpack_out * cin_p
            wblk = (wblk.reshape(9, 3, lco, lci)
                    .transpose(0, 2, 1, 3)
                    .reshape(9 * lco, 3 * lci))
    else:
        wblk = w_rev.astype(dout_p.dtype).reshape(27 * cout_p, cin_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((27, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats table, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # dout table, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # reversed weights
            pl.BlockSpec((tile, cout_p), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # dout tile (for dW)
        ],
        out_specs=[
            pl.BlockSpec((cin_p, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * cin_p, cout_p), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((window // rpack_in, rpack_in * cin_p),
                       feats_p.dtype)
            for _ in range(nbuf)
        ] + [
            pltpu.VMEM((window // rpack_out, rpack_out * cout_p),
                       dout_p.dtype)
            for _ in range(nbuf)
        ] + [pltpu.SemaphoreType.DMA((2 * nbuf,))],
    )
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, rpack_in=rpack_in,
                          rpack_out=rpack_out, cin=cin_p, cout=cout_p,
                          blockdiag=blockdiag, tile=tile, window=window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cin_p, v), jnp.float32),
            jax.ShapeDtypeStruct((27 * cin_p, cout_p), jnp.float32),
        ],
        interpret=_interpret(),
    )(win_lo, local_idx, feats_p, dout_p, wblk, dout)


def _row_pack(cin: int) -> int:
    """L table rows packed per memref row so L*Cin is lane-aligned (128)."""
    return 128 // math.gcd(cin, 128)


def _block_diag_weights(weights, rpack):
    """[27, Cin, Cout] -> [27 * L*Cin, L*Cout] with W_k on the L diagonal
    blocks (sub-slot s of a packed row maps to output sub-slot s)."""
    k, cin, cout = weights.shape
    wblk = jnp.zeros((k, rpack * cin, rpack * cout), weights.dtype)
    for s in range(rpack):
        wblk = wblk.at[:, s * cin : (s + 1) * cin,
                       s * cout : (s + 1) * cout].set(weights)
    return wblk.reshape(k * rpack * cin, rpack * cout)


def _pallas_gather_gemm(table, win_lo, local_idx, weights, cout, tile, window):
    vp, cin = table.shape
    rpack = _row_pack(cin)
    nbuf = _nbuf_for(cin, cout)
    v = local_idx.shape[1]
    n_tiles = v // tile
    table_p = table.reshape(vp // rpack, rpack * cin)
    # block-diag weights are full-MXU but O(L^2 * Cin * Cout) VMEM; cap at
    # ~1.8 MB (16 KB/offset) — beyond that pass the plain per-offset weight
    blockdiag = (rpack * cin) * (rpack * cout) <= 128 * 128
    if blockdiag:
        wblk = _block_diag_weights(weights.astype(table.dtype), rpack)
        if _FUSED_MASKS:
            # fused-mask kernel layout: the 3 dx offsets of each (dz, dy)
            # group side by side -> [9 * L*Cin, 3 * L*Cout]
            lcin, lcout = rpack * cin, rpack * cout
            wblk = (wblk.reshape(9, 3, lcin, lcout)
                    .transpose(0, 2, 1, 3)
                    .reshape(9 * lcin, 3 * lcout))
    else:
        wblk = weights.astype(table.dtype).reshape(27 * cin, cout)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((27, tile), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # block-diag weights
        ],
        out_specs=pl.BlockSpec(
            (cout, tile), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((window // rpack, rpack * cin), table.dtype)
            for _ in range(nbuf)
        ] + [pltpu.SemaphoreType.DMA((nbuf,))],
    )
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, rpack=rpack, cin=cin, cout=cout,
                          blockdiag=blockdiag, tile=tile, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cout, v), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * v * 27 * cin * (window // 27 + cout),
            bytes_accessed=N_GROUPS * v * 2 * cin * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(win_lo, local_idx, table_p, wblk)
    return jnp.transpose(out_t)  # [v, cout] (XLA fuses the relayout)


def _pallas_dw(table, win_lo, local_idx, dout, cout, tile, window):
    vp, cin = table.shape
    rpack = _row_pack(cin)
    nbuf = _nbuf_for(cin, cout)
    v = local_idx.shape[1]
    n_tiles = v // tile
    table_p = table.reshape(vp // rpack, rpack * cin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((27, tile), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, cout), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (27 * cin, cout), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((window // rpack, rpack * cin), table.dtype)
            for _ in range(nbuf)
        ] + [pltpu.SemaphoreType.DMA((nbuf,))],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, rpack=rpack, cin=cin, tile=tile,
                          window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((27 * cin, cout), jnp.float32),
        interpret=_interpret(),
    )(win_lo, local_idx, table_p, dout)


def _escape_correction(table, tabs: WindowTables, weights, v, cout):
    """XLA fix-up: out[esc_out] += table[esc_src] @ W[esc_k] for the ~0.4%
    of neighbor entries outside their window (27 tiny masked GEMMs)."""
    live = tabs.esc_out >= 0
    g = jnp.where(live[:, None], table[tabs.esc_src], 0.0)  # [E, Cin]
    y = jnp.zeros((g.shape[0], cout), jnp.float32)
    for k in range(27):
        sel = (tabs.esc_k == k)[:, None]
        y = y + jnp.dot(
            jnp.where(sel, g, 0.0),
            weights[k].astype(table.dtype),
            preferred_element_type=jnp.float32,
        )
    rows = jnp.where(live, tabs.esc_out, v)
    return jnp.zeros((v + 1, cout), jnp.float32).at[rows].add(y)[:v]


_REV = tuple(range(26, -1, -1))  # offset k -> 26-k (mirror through center)


def _pad_table(feats, valid, v, window):
    vp = max(_round_up(v, window), window)
    return jnp.zeros((vp, feats.shape[1]), feats.dtype).at[:v].set(
        jnp.where(valid[:, None], feats, 0.0)
    )


def _pad_channels(feats, weights):
    """Pad Cin to a multiple of 32 so the packed table is lane-alignable
    (only the stem's Cin=6 needs it; backbone channels are 32k)."""
    cin = feats.shape[1]
    cin_p = _round_up(cin, 32)
    if cin_p != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_p - cin)))
        weights = jnp.pad(weights, ((0, 0), (0, cin_p - cin), (0, 0)))
    return feats, weights


def _apply(feats, weights, tabs: WindowTables, valid):
    from .conv import _compute_dtype

    feats = feats.astype(_compute_dtype())  # bf16 via GAPRO_CONV_DTYPE
    feats, weights = _pad_channels(feats, weights)
    cout0 = weights.shape[-1]
    cout_p = _round_up(cout0, 8)  # sublane-aligned G slices in the kernel
    if cout_p != cout0:
        weights = jnp.pad(weights, ((0, 0), (0, 0), (0, cout_p - cout0)))
    v, cin = feats.shape
    table = _pad_table(feats, valid, v, tabs.window)
    out = _pallas_gather_gemm(table, tabs.win_lo, tabs.local_idx,
                              weights, cout_p, tabs.tile, tabs.window)[:, :cout0]
    out = out + _escape_correction(table, tabs, weights[..., :cout0], v, cout0)
    return jnp.where(valid[:, None], out, 0.0)


@jax.custom_vjp
def _window_conv_core(feats, weights, tabs, valid):
    return _apply(feats, weights, tabs, valid)


def _window_conv_fwd(feats, weights, tabs, valid):
    return _apply(feats, weights, tabs, valid), (feats, weights, tabs, valid)


def _fused_bwd_enabled() -> bool:
    """Fused dfeats+dW backward kernel (one DMA chain per tile instead of
    two passes). GAPRO_WINDOW_FUSED=0 falls back to the two-pass path."""
    return os.environ.get("GAPRO_WINDOW_FUSED", "1") == "1"


def _window_conv_bwd(res, dout):
    feats, weights, tabs, valid = res
    v, cin = feats.shape
    cout = weights.shape[-1]
    dout = jnp.where(valid[:, None], dout, 0.0).astype(feats.dtype)

    # d(feats): the transposed scatter IS a windowed gather over dout with
    # offset-reversed transposed weights (nbr_k[i]=j <=> nbr_{26-k}[j]=i; the
    # reversal maps (dz,dy) groups to (−dz,−dy) groups, so the same window
    # tables apply).
    w_rev = jnp.transpose(weights[jnp.asarray(_REV)], (0, 2, 1))  # [27,Cout,Cin]

    if _fused_bwd_enabled():
        # one fused kernel pass computes dfeats AND dw; both channel dims
        # pad to 32-multiples (both tables get lane-packed)
        cin_p, cout_p = _round_up(cin, 32), _round_up(cout, 32)
        feats_pd = jnp.pad(feats.astype(dout.dtype),
                           ((0, 0), (0, cin_p - cin)))
        dout_pd = jnp.pad(dout, ((0, 0), (0, cout_p - cout)))
        w_rev_pd = jnp.pad(w_rev, ((0, 0), (0, cout_p - cout),
                                   (0, cin_p - cin)))
        ftable = _pad_table(feats_pd, valid, v, tabs.window)
        dtable = _pad_table(dout_pd, valid, v, tabs.window)
        dfeats_t, dw = _pallas_bwd_fused(ftable, dtable, tabs.win_lo,
                                         tabs.local_idx, w_rev_pd,
                                         dout_pd, cin_p, cout_p,
                                         tabs.tile, tabs.window)
        dfeats = jnp.transpose(dfeats_t)[:, :cin]
        dfeats = dfeats + _escape_correction(
            dtable[:, :cout], tabs, w_rev, v, cin)
        dfeats = jnp.where(valid[:, None], dfeats, 0.0)
        dw = dw.reshape(27, cin_p, cout_p)[:, :cin, :cout]
        table = ftable[:, :cin]
    else:
        dfeats = _apply(dout, w_rev, tabs, valid)
        # d(weights)[k] = gathered_k^T @ dout (grid-accumulated kernel)
        feats_p, _ = _pad_channels(feats, weights)
        cin_p = feats_p.shape[1]
        table = _pad_table(feats_p, valid, v, tabs.window)
        dw = _pallas_dw(table, tabs.win_lo, tabs.local_idx, dout,
                        cout, tabs.tile, tabs.window
                        ).reshape(27, cin_p, cout)[:, :cin, :]
        table = table[:, :cin]
    # escapee contribution to both dw and (via _apply's own escapees) dfeats:
    # _apply(dout, w_rev) already fixes dfeats escapees because the reversed
    # relation's escapee list equals the forward one's with (out, src)
    # swapped and k reversed — which build_window_tables computed from the
    # same nbr table.  dw still needs the forward escapee entries:
    live = tabs.esc_out >= 0
    g = jnp.where(live[:, None], table[tabs.esc_src], 0.0)  # [E, Cin]
    dout_e = jnp.where(live[:, None], dout[jnp.minimum(tabs.esc_out, v - 1)], 0.0)
    # 27 masked [E,Cin]x[E,Cout] contractions — an [E,Cin,Cout] einsum +
    # scatter would materialize hundreds of MB at the deeper widths
    dw_e = jnp.stack([
        jax.lax.dot_general(
            jnp.where((tabs.esc_k == k)[:, None], g, 0.0).astype(jnp.float32),
            dout_e.astype(jnp.float32),
            _CONTRACT_00,
            preferred_element_type=jnp.float32,
        )
        for k in range(27)
    ])
    return (
        dfeats.astype(feats.dtype),
        (dw + dw_e).astype(weights.dtype),
        None,
        None,
    )


_window_conv_core.defvjp(_window_conv_fwd, _window_conv_bwd)


def subm_conv_window(feats, tabs: WindowTables, weights, valid):
    """Submanifold 3x3x3 conv via the windowed monotone-gather kernel.

    Args:
      feats: [V, Cin] (V a multiple of 256).
      tabs: WindowTables from build_window_tables (level geometry).
      weights: [27, Cin, Cout];  valid: [V] bool.
    Returns [V, Cout] float32.
    """
    return _window_conv_core(feats, weights, tabs, valid)
