"""Flat <-> dense batch layout conversion.

The reference keeps everything "batch-flat" (concatenated scenes + offset
arrays, e.g. ISBNet/isbnet/model/model_utils.py:558-563 get_batch_offsets).
On TPU the natural layout for per-scene work (FPS, ball query, attention,
dynamic conv) is dense padded [B, Nmax, ...] with validity masks; flat
layouts remain for voxel-level pointwise work.  These helpers convert
between the two with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2, 3))
def flat_to_dense_index(batch_idx, valid, batch_size: int, n_max: int):
    """Positions of flat rows inside dense [B, n_max] slots.

    Returns:
      pos: [N] int32 position within the row's batch (-1 for invalid/overflow)
      dense_idx: [B, n_max] int32 flat index filling each slot (-1 empty)
      dense_valid: [B, n_max] bool
    """
    n = batch_idx.shape[0]
    b = jnp.where(valid, batch_idx, batch_size)
    # rank within batch = exclusive cumulative count of equal batch ids
    onehot = jax.nn.one_hot(b, batch_size + 1, dtype=jnp.int32)  # [N, B+1]
    pos_all = jnp.cumsum(onehot, axis=0) - onehot  # counts before row i
    pos = jnp.sum(pos_all * onehot, axis=1)
    pos = jnp.where(valid & (pos < n_max), pos, -1)

    dense_idx = jnp.full((batch_size, n_max), -1, jnp.int32)
    flat_ids = jnp.arange(n, dtype=jnp.int32)
    ok = pos >= 0
    # invalid rows write to batch row `batch_size` -> out of bounds -> dropped
    dense_idx = dense_idx.at[
        jnp.where(ok, batch_idx, batch_size), jnp.where(ok, pos, 0)
    ].set(flat_ids, mode="drop")
    dense_valid = dense_idx >= 0
    return pos, dense_idx, dense_valid


def gather_dense(values, dense_idx, fill=0.0):
    """values [N, ...] + dense_idx [B, M] -> [B, M, ...] (fill for empty)."""
    out = values[jnp.maximum(dense_idx, 0)]
    mask_shape = dense_idx.shape + (1,) * (out.ndim - dense_idx.ndim)
    return jnp.where((dense_idx >= 0).reshape(mask_shape), out, fill)


def random_downsample(rng_key, valid, n_subsample: int):
    """Random fixed-size subsample of valid rows (model_utils.py:566-586),
    static-shape: returns indices [n_subsample] and a validity mask (when
    fewer valid rows exist, the tail repeats the first pick and is masked).
    """
    n = valid.shape[0]
    scores = jax.random.uniform(rng_key, (n,))
    scores = jnp.where(valid, scores, -1.0)
    _, idx = jax.lax.top_k(scores, n_subsample)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ok = jnp.arange(n_subsample) < n_valid
    return jnp.where(ok, idx, idx[0]), ok
