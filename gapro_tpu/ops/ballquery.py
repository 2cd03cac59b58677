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
    grid cell, searchsorted the 27 neighbor cells per query, examine only a
    bounded candidate window per cell. Measured 490 ms -> ~10 ms at
    2048 queries x 262144 points on TPU v5e vs the tiled-scan variant.
    Deviation from CUDA: cells holding > cell_cap points contribute only
    their first cell_cap (deterministic; the reference caps at nsample
    scanning index order — set cell_cap >= 2k to make differences rare).
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
    cell_cap: int = 64,
):
    """Grid-bucketed ball query (see module docstring)."""
    r2 = jnp.float32(radius) ** 2
    inv_cell = 1.0 / jnp.float32(radius)
    mask_axis = (1 << _CELL_BITS) - 1

    def cell_key(xyz, origin):
        c = jnp.floor((xyz - origin) * inv_cell).astype(jnp.int32)
        c = jnp.clip(c, 0, mask_axis)
        return (c[..., 0] << (2 * _CELL_BITS)) | (c[..., 1] << _CELL_BITS) | c[..., 2]

    def single(q_b, p_b, qv_b, pv_b):
        nq = q_b.shape[0]
        n = p_b.shape[0]
        origin = jnp.min(jnp.where(pv_b[:, None], p_b, jnp.inf), axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - radius

        # invalid points sink to the sentinel cell (also covers validity)
        key = jnp.where(pv_b, cell_key(p_b, origin), jnp.int32(2**30))
        order = jnp.argsort(key)
        skey = key[order]

        # ONE packed sorted table [N, 5]: xyz + key + original index
        # (bitcast int32 lanes) — a single candidate gather instead of four
        # (gathers here are row-rate-bound, docs/PERF.md)
        packed = jnp.concatenate(
            [
                p_b[order],
                jax.lax.bitcast_convert_type(skey, jnp.float32)[:, None],
                jax.lax.bitcast_convert_type(order.astype(jnp.int32), jnp.float32)[:, None],
            ],
            axis=1,
        )

        # 27 neighbor cells per query
        d = jnp.arange(-1, 2, dtype=jnp.int32)
        offs = (
            (d[:, None, None] << (2 * _CELL_BITS))
            + (d[None, :, None] << _CELL_BITS)
            + d[None, None, :]
        ).reshape(27)
        qcell = cell_key(q_b, origin)  # [Q]
        qkeys = qcell[:, None] + offs[None, :]  # [Q, 27]

        starts = jnp.searchsorted(skey, qkeys, side="left")
        pos = starts[..., None] + jnp.arange(cell_cap, dtype=jnp.int32)  # [Q,27,cap]
        pos_c = jnp.clip(pos, 0, n - 1)
        g = packed[pos_c]  # [Q, 27, cap, 5]
        gkey = jax.lax.bitcast_convert_type(g[..., 3], jnp.int32)
        cand = jax.lax.bitcast_convert_type(g[..., 4], jnp.int32)
        # run membership = key equality (no second search needed)
        in_run = (gkey == qkeys[..., None]) & (pos < n)

        diff = g[..., :3] - q_b[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        hit = in_run & (d2 <= r2)

        prio = jnp.where(hit, cand, _BIG).reshape(nq, 27 * cell_cap)
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
