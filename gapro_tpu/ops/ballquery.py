"""Ball query: fixed-K radius neighbors (masked, dense-batch).

Replaces the reference CUDA kernels
(ISBNet/isbnet/ops/src/ballquery/ballquery_cuda_kernel.cu:26-60 — batch-flat
— and pointnet2 ``ball_query_gpu.cu`` — dense).  Semantics match: for each
query, the K lowest-index points within ``radius`` (scan order == index
order); remaining slots repeat the first hit; a query with no hits (cannot
happen when the query is among the points, since distance 0 counts) yields
index 0.

TPU formulation: chunked distance tiles + running ``lax.top_k`` merge of the
smallest candidate indices, so memory stays at [Q, chunk] instead of [Q, N].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


@partial(jax.jit, static_argnums=(5, 6))
def ball_query_masked(
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
