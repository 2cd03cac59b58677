"""Coordinate key packing and sorted-key lookup.

The reference voxelizes and builds sparse-conv "rulebooks" with CPU hash maps
(ISBNet/isbnet/ops/src/voxelize/voxelize.cpp, google dense_hash_map keyed by
int3).  On TPU we replace hashing with *sorting*: pack (batch, z, y, x) into
an ordered key, sort once, and answer membership queries with binary search.
Everything is static-shape and jit-friendly.

JAX runs with 32-bit ints (x64 disabled), and 4 coordinates can exceed 31
bits, so keys are a lexicographic (hi, lo) int32 pair:

  hi = batch * Z + z          (batch < 2^8, z < 2^15  -> hi < 2^23)
  lo = y * X + x              (y, x < 2^15           -> lo < 2^30)

``pair_searchsorted`` does a vectorized binary search over the pair ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel key that sorts after all real keys.
KEY_MAX = jnp.iinfo(jnp.int32).max


def pack_coords(coords: jax.Array, extents, valid=None):
    """Pack [N, 4] int coords (b, z, y, x ordering per `extents`) to (hi, lo).

    Args:
      coords: [N, 4] int32, columns (batch, z, y, x), all non-negative.
      extents: (Z, Y, X) static python ints (upper bounds, exclusive).
      valid: optional [N] bool; invalid rows get the sentinel KEY_MAX pair.

    Returns:
      (hi, lo): two [N] int32 arrays forming a lexicographic key.
    """
    Z, Y, X = (int(e) for e in extents)
    b = coords[:, 0].astype(jnp.int32)
    z = coords[:, 1].astype(jnp.int32)
    y = coords[:, 2].astype(jnp.int32)
    x = coords[:, 3].astype(jnp.int32)
    hi = b * Z + z
    lo = y * X + x
    if valid is not None:
        hi = jnp.where(valid, hi, KEY_MAX)
        lo = jnp.where(valid, lo, KEY_MAX)
    return hi, lo


def unpack_coords(hi: jax.Array, lo: jax.Array, extents):
    """Inverse of :func:`pack_coords` (valid keys only)."""
    Z, Y, X = (int(e) for e in extents)
    b = hi // Z
    z = hi % Z
    y = lo // X
    x = lo % X
    return jnp.stack([b, z, y, x], axis=-1)


def pair_less(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def pair_lexsort(hi: jax.Array, lo: jax.Array):
    """argsort by (hi, lo) lexicographic order. Stable."""
    # jnp.lexsort sorts by last key primarily.
    return jnp.lexsort((lo, hi))


def pair_searchsorted(s_hi: jax.Array, s_lo: jax.Array, q_hi: jax.Array, q_lo: jax.Array):
    """For each query pair, the index of the first sorted key >= query.

    Args:
      s_hi, s_lo: [M] sorted (lexicographically by (hi, lo)) key arrays.
      q_hi, q_lo: [Q] query keys (any shape, flattened internally).

    Returns:
      [Q] int32 insertion indices in [0, M].
    """
    m = s_hi.shape[0]
    # interval [0, m] has m+1 candidate positions; bit_length(m) halvings
    # always reach width 0 (bit_length(m-1) is one short when m is a pow2).
    steps = max(int(m).bit_length(), 1)
    lop = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    hip = jnp.full(q_hi.shape, m, dtype=jnp.int32)

    def body(_, carry):
        lop, hip = carry
        mid = (lop + hip) // 2
        mid_c = jnp.minimum(mid, m - 1)
        mhi = s_hi[mid_c]
        mlo = s_lo[mid_c]
        go_right = pair_less(mhi, mlo, q_hi, q_lo)  # s[mid] < q
        lop = jnp.where(go_right, mid + 1, lop)
        hip = jnp.where(go_right, hip, mid)
        return lop, hip

    lop, hip = jax.lax.fori_loop(0, steps, body, (lop, hip))
    return lop


def pair_lookup(s_hi, s_lo, q_hi, q_lo):
    """Exact-match lookup: index of query in sorted keys, or -1.

    Returns (idx [Q] int32 with -1 for missing, found [Q] bool).
    """
    m = s_hi.shape[0]
    pos = pair_searchsorted(s_hi, s_lo, q_hi, q_lo)
    pos_c = jnp.minimum(pos, m - 1)
    found = (s_hi[pos_c] == q_hi) & (s_lo[pos_c] == q_lo) & (pos < m) & (q_hi != KEY_MAX)
    return jnp.where(found, pos_c, -1), found
