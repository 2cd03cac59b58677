"""Ball query: fixed-K radius neighbors (masked, dense-batch).

Replaces the reference CUDA kernels
(ISBNet/isbnet/ops/src/ballquery/ballquery_cuda_kernel.cu:26-60 — batch-flat
— and pointnet2 ``ball_query_gpu.cu`` — dense).  Semantics match: for each
query, the K lowest-index points within ``radius`` (scan order == index
order); remaining slots repeat the first hit; a query with no hits (cannot
happen when the query is among the points, since distance 0 counts) yields
index 0.

Two TPU formulations:
  * ``ball_query_grid`` (default for large N): sort points by radius-sized
    grid cell; the 27 neighbor cells collapse into 9 CONTIGUOUS key runs
    (the 3 dz cells of one (dx, dy) column are consecutive integers in the
    z-minor cell key), so each query searchsorts 9 run starts AND ends and
    compacts the runs' exact extents into one 4 x cell_cap candidate
    budget per query (the gather is the dominant cost and is row-RATE
    bound on TPU — cost tracks gathered rows, not bytes — so compaction
    beats fixed per-run windows: 9 x 128 fixed slots -> <= 512 live slots,
    measured 16.5 -> ~9 ms at 2048 x 32k; the round-1 fixed-window form
    measured 88 -> 44 ms at 2048 x 262k vs the 490 ms tiled-scan).  The
    packed gather table is int32: see the denormal-flush note at the
    packing site.
    Deviation from CUDA: a query whose 9 runs hold > 4 x cell_cap
    candidates examines only the first 4 x cell_cap in (dx, dy)-column
    order (deterministic; the reference caps at nsample scanning index
    order — keep the budget >= a few x expected 3x3x3 occupancy to make
    differences rare).
  * ``ball_query_tiled``: chunked distance tiles + running ``lax.top_k``
    merge (exact; the scan serializes — kept for small N and as oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)
_CELL_BITS = 10  # 1024 cells per axis; scene extent <= 1024 * radius


def ball_query_masked(queries, points, q_valid, p_valid, radius, k: int,
                      chunk: int = 8192):
    """Dispatch: grid algorithm for large point sets, tiled scan for small.

    Returns neighbor indices [B, Q, K] int32 (into N) and counts [B, Q].
    """
    if points.shape[1] >= 4 * chunk:
        return ball_query_grid(queries, points, q_valid, p_valid, radius, k)
    return ball_query_tiled(queries, points, q_valid, p_valid, radius, k, chunk)


@partial(jax.jit, static_argnums=(5, 6))
def ball_query_grid(
    queries: jax.Array,  # [B, Q, 3]
    points: jax.Array,  # [B, N, 3]
    q_valid: jax.Array,  # [B, Q] bool
    p_valid: jax.Array,  # [B, N] bool
    radius,  # float
    k: int,
    cell_cap: int = 128,
):
    """Grid-bucketed ball query (see module docstring).

    ``cell_cap`` is the candidate window per 3-cell (dx, dy) key run
    (9 runs per query)."""
    r2 = jnp.float32(radius) ** 2
    inv_cell = 1.0 / jnp.float32(radius)
    mask_axis = (1 << _CELL_BITS) - 1

    def cell_coords(xyz, origin):
        c = jnp.floor((xyz - origin) * inv_cell).astype(jnp.int32)
        return jnp.clip(c, 0, mask_axis)

    def pack_key(c):
        return (c[..., 0] << (2 * _CELL_BITS)) | (c[..., 1] << _CELL_BITS) | c[..., 2]

    def single(q_b, p_b, qv_b, pv_b):
        nq = q_b.shape[0]
        n = p_b.shape[0]
        origin = jnp.min(jnp.where(pv_b[:, None], p_b, jnp.inf), axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - radius

        # invalid points sink to the sentinel cell (also covers validity)
        key = jnp.where(pv_b, pack_key(cell_coords(p_b, origin)), jnp.int32(2**30))
        order = jnp.argsort(key)
        skey = key[order]

        # ONE packed sorted table [N, 5]: xyz + key + original index — a
        # single candidate gather instead of four (gathers here are
        # row-rate-bound, docs/PERF.md).  The table MUST be int32 with the
        # coords bitcast in, not float32 with the ints bitcast in: ints
        # < 2**23 are denormal float bit patterns and the TPU float path
        # flushes denormals to zero, silently zeroing keys and indices
        # (observed on chip; CPU preserves them, so only on-chip runs see
        # it).  Genuine float coord patterns survive the int gather.
        packed = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(p_b[order], jnp.int32),
                skey[:, None],
                order.astype(jnp.int32)[:, None],
            ],
            axis=1,
        )

        # 9 neighbor (dx, dy) columns per query; each column's 3 dz cells
        # are CONSECUTIVE keys -> one contiguous sorted-array run
        d = jnp.arange(-1, 2, dtype=jnp.int32)
        col_offs = (
            (d[:, None] << (2 * _CELL_BITS)) + (d[None, :] << _CELL_BITS)
        ).reshape(9)
        qc = cell_coords(q_b, origin)  # [Q, 3]
        qcol = (qc[:, 0] << (2 * _CELL_BITS)) | (qc[:, 1] << _CELL_BITS)
        # clamp the dz range at the grid border so a run never wraps into a
        # neighboring (dx, dy) column
        z_lo = jnp.maximum(qc[:, 2] - 1, 0)
        z_hi = jnp.minimum(qc[:, 2] + 1, mask_axis)
        run_lo = (qcol[:, None] + col_offs[None, :]) + z_lo[:, None]  # [Q, 9]
        run_hi = (qcol[:, None] + col_offs[None, :]) + z_hi[:, None]

        # drop columns whose (x, y) cell falls outside the grid: their
        # packed key range can collide with other columns or the invalid-
        # point sentinel at the 10-bit border
        dxy = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), -1).reshape(9, 2)
        cxy = qc[:, None, :2] + dxy[None, :, :]  # [Q, 9, 2]
        col_ok = jnp.all((cxy >= 0) & (cxy <= mask_axis), axis=-1)

        starts = jnp.searchsorted(skey, run_lo, side="left")
        ends = jnp.searchsorted(skey, run_hi + 1, side="left")
        # run-compacted candidate window: the gather is row-rate-bound on
        # TPU (cost ~ gathered ROWS, independent of row width — measured
        # 2.4/4.8/9.5 ms at 0.6/1.2/2.4M rows), so instead of a fixed
        # cell_cap window per run (9 x cap rows per query, mostly dead),
        # pack the 9 runs' EXACT extents into one budget of
        # total_cap = 4 * cell_cap candidate slots per query. Slot s maps
        # to run r(s) = #(cum <= s) at offset s - cum[r(s)-1]; the
        # per-run-start/offset lookups are one-hot sums (a 9-wide gather
        # per slot would itself be row-rate-bound).
        total_cap = 4 * cell_cap
        length = jnp.where(col_ok, jnp.maximum(ends - starts, 0), 0)  # [Q,9]
        cum = jnp.cumsum(jnp.minimum(length, total_cap), axis=1)  # [Q,9] incl
        cum_excl = cum - jnp.minimum(length, total_cap)
        s_iota = jnp.arange(total_cap, dtype=jnp.int32)  # [S]
        in_seg = ((s_iota[:, None] >= cum_excl[:, None, :])
                  & (s_iota[:, None] < cum[:, None, :]))  # [Q, S, 9]
        segf = in_seg.astype(jnp.int32)
        pos = (jnp.sum(segf * (starts - cum_excl)[:, None, :], axis=2)
               + s_iota[None, :])  # [Q, S]
        slot_ok = jnp.any(in_seg, axis=2)  # s < total demand
        pos_c = jnp.clip(pos, 0, n - 1)
        g = packed[pos_c]  # [Q, S, 5] int32
        cand = g[..., 4]

        diff = jax.lax.bitcast_convert_type(g[..., :3], jnp.float32) - q_b[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        hit = slot_ok & (d2 <= r2)

        prio = jnp.where(hit, cand, _BIG)  # [Q, S]
        neg_topk, _ = jax.lax.top_k(-prio, k)
        best = -neg_topk
        found = best < _BIG
        counts = jnp.sum(found.astype(jnp.int32), axis=1)
        first = jnp.where(counts > 0, best[:, 0], 0)
        out = jnp.where(found, best, first[:, None])
        out = jnp.where(qv_b[:, None], out, 0)
        return out, jnp.where(qv_b, counts, 0)

    return jax.vmap(single)(queries, points, q_valid, p_valid)


@partial(jax.jit, static_argnums=(5, 6))
def ball_query_tiled(
    queries: jax.Array,  # [B, Q, 3]
    points: jax.Array,  # [B, N, 3]
    q_valid: jax.Array,  # [B, Q] bool
    p_valid: jax.Array,  # [B, N] bool
    radius,  # float
    k: int,
    chunk: int = 8192,
):
    """Returns neighbor indices [B, Q, K] int32 (into N) and counts [B, Q]."""
    r2 = jnp.float32(radius) ** 2
    # never pad a small point set up to the full chunk: at N=2048 the
    # padded [Q, 8192+K] top_k was 15 ms/call on chip vs ~1.5 ms at the
    # tight width (the top_k, not the distance matmul, is the cost)
    chunk = min(chunk, max((points.shape[1] + 511) // 512 * 512, 512))

    def single(q_b, p_b, qv_b, pv_b):
        nq = q_b.shape[0]
        n = p_b.shape[0]
        pad_n = (-n) % chunk
        p_pad = jnp.pad(p_b, ((0, pad_n), (0, 0)))
        pv_pad = jnp.pad(pv_b, (0, pad_n))
        n_chunks = (n + pad_n) // chunk

        def body(carry, c):
            best = carry  # [Q, K] candidate indices (as priorities), ascending
            start = c * chunk
            pts = jax.lax.dynamic_slice_in_dim(p_pad, start, chunk, axis=0)
            pvm = jax.lax.dynamic_slice_in_dim(pv_pad, start, chunk, axis=0)
            d2 = (
                jnp.sum(q_b * q_b, -1)[:, None]
                + jnp.sum(pts * pts, -1)[None, :]
                - 2.0 * jnp.dot(q_b, pts.T, precision=jax.lax.Precision.HIGHEST)
            )
            within = (d2 <= r2) & pvm[None, :]
            idx = start + jnp.arange(chunk, dtype=jnp.int32)[None, :]
            cand = jnp.where(within, idx, _BIG)  # [Q, chunk]
            merged = jnp.concatenate([best, cand], axis=1)
            # k smallest indices == top_k of negated values
            neg_topk, _ = jax.lax.top_k(-merged, k)
            return -neg_topk, None

        best0 = jnp.full((nq, k), _BIG, jnp.int32)
        best, _ = jax.lax.scan(body, best0, jnp.arange(n_chunks, dtype=jnp.int32))
        found = best < _BIG
        counts = jnp.sum(found.astype(jnp.int32), axis=1)
        first = jnp.where(counts > 0, best[:, 0], 0)
        out = jnp.where(found, best, first[:, None])
        out = jnp.where(qv_b[:, None], out, 0)
        counts = jnp.where(qv_b, counts, 0)
        return out, counts

    return jax.vmap(single)(queries, points, q_valid, p_valid)
