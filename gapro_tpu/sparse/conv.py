"""Sparse convolution compute ops: gather-GEMM formulations.

Each op is a pure function of (features, rulebook, weights) designed so XLA
sees dense, MXU-friendly contractions:

  * ``subm_conv``: ONE fused gather-GEMM — gather [V, 27, Cin] neighborhoods
    (zero sentinel row for missing neighbors) and contract over (27*Cin) in
    one matmul: a large-K contraction instead of 27 skinny ones.
  * ``down_conv``: the scatter-free child-table gather-GEMM;
    ``inverse_conv``: parent gather + 8 per-offset GEMMs (the stride-2
    kernel-2 pair sharing one rulebook).

Replaces spconv's SubMConv3d / SparseConv3d / SparseInverseConv3d CUDA
engines (ISBNet/isbnet/model/blocks.py:183-233 usage).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp



def _compute_dtype():
    """GAPRO_CONV_DTYPE=bf16 runs the gather+GEMM in bfloat16 (half the HBM
    bytes moved + MXU-native; fp32 accumulation via preferred_element_type).
    The conv itself is gather-row-rate-bound (docs/PERF.md) so bf16 mainly
    helps the GEMM-heavy deep levels; the reference trains with AMP fp16
    (ISBNet/tools/train.py:79-82), so bf16 training is the like-for-like
    setting. Default fp32 for parity tests."""
    return jnp.bfloat16 if os.environ.get("GAPRO_CONV_DTYPE") == "bf16" else jnp.float32


def subm_conv(feats, nbr_idx, weights, valid, chunk: int | None = None):
    """Submanifold 3x3x3 convolution.

    One fused gather+GEMM: a zero sentinel row absorbs missing neighbors so
    no [V, 27, Cin]-sized mask is needed; XLA fuses the row gather into the
    MXU contraction. (Measured on TPU v5e at V=262144, C=32: single-shot
    ~22 ms vs 42 ms for a lax.map-chunked serial variant; the remaining
    cost is XLA's row-rate-bound gather — see docs/PERF.md.)

    Args:
      feats: [V, Cin].
      nbr_idx: [V, 27] int32 neighbor table (-1 = missing).
      weights: [27, Cin, Cout].
      valid: [V] bool.
      chunk: optional static tile size; only for memory-constrained cases
        (unrolled, still one XLA program).

    Returns [V, Cout].
    """
    v, cin = feats.shape
    k, _, cout = weights.shape

    from .pallas_conv import fits_vmem, pallas_enabled, subm_conv_pallas

    if pallas_enabled() and fits_vmem(v, cin, cout):
        return subm_conv_pallas(feats, nbr_idx, weights, valid)

    dt = _compute_dtype()
    w2 = weights.reshape(k * cin, cout).astype(dt)
    table = jnp.concatenate(
        [feats.astype(dt), jnp.zeros((1, cin), dt)], axis=0
    )  # sentinel row v = zeros
    idx = jnp.where(nbr_idx >= 0, nbr_idx, v)

    if chunk is None:
        g = table[idx.reshape(-1)].reshape(v, k * cin)
        out = jnp.dot(g, w2, preferred_element_type=jnp.float32)
    else:
        outs = []
        for s in range(0, v, chunk):
            e = min(s + chunk, v)
            g = table[idx[s:e].reshape(-1)].reshape(e - s, k * cin)
            outs.append(jnp.dot(g, w2, preferred_element_type=jnp.float32))
        out = jnp.concatenate(outs, axis=0)
    return jnp.where(valid[:, None], out, 0.0)


def down_conv(feats, child_idx, weights, out_valid=None):
    """Stride-2 kernel-2 sparse conv: gather each coarse voxel's (up to 8)
    children and contract in one GEMM — the scatter-free formulation
    (offset within a parent is unique, so the child table is dense [Vc, 8]).

    out[p] = sum_kk table[child_idx[p, kk]] @ W[kk]

    Args:
      feats: [V, Cin]; child_idx: [Vc, 8] int32 input index per kernel
      offset (-1 = absent); weights: [8, Cin, Cout].
    (Measured on TPU v5e at V=262144: ~1 ms vs 36 ms for the 8x masked-GEMM
    + segment_sum scatter variant.)
    """
    v, cin = feats.shape
    k, _, cout = weights.shape
    dt = _compute_dtype()
    w2 = weights.reshape(k * cin, cout).astype(dt)
    table = jnp.concatenate([feats.astype(dt), jnp.zeros((1, cin), dt)], axis=0)
    idx = jnp.where(child_idx >= 0, child_idx, v)
    vc = child_idx.shape[0]
    g = table[idx.reshape(-1)].reshape(vc, k * cin)
    out = jnp.dot(g, w2, preferred_element_type=jnp.float32)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0.0)
    return out


def inverse_conv(coarse_feats, parent, offset_id, weights, valid):
    """Inverse (transposed) of ``down_conv`` on the shared rulebook.

    fine[i] = coarse[parent(i)] @ W[offset(i)].
    """
    dt = _compute_dtype()
    w = weights.astype(dt)
    gathered = coarse_feats.astype(dt)[jnp.maximum(parent, 0)]  # [V, Cin]
    gathered = jnp.where((parent >= 0)[:, None], gathered, jnp.zeros((), dt))
    out = None
    for kk in range(8):
        sel = offset_id == kk
        yk = jnp.dot(
            jnp.where(sel[:, None], gathered, jnp.zeros((), dt)),
            w[kk],
            preferred_element_type=jnp.float32,
        )
        out = yk if out is None else out + yk
    return jnp.where(valid[:, None], out, 0.0)
