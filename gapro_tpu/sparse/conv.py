"""Sparse convolution compute ops: gather-GEMM formulations.

Each op is a pure function of (features, rulebook, weights) designed so XLA
sees dense, MXU-friendly contractions:

  * ``subm_conv``: chunked fused gather-GEMM — gather a [tile, 27, Cin]
    neighborhood block and contract over (27*Cin) in one matmul, giving a
    large-K contraction instead of 27 skinny ones.
  * ``down_conv`` / ``inverse_conv``: 8 per-offset GEMMs + segment-sum /
    gather (the stride-2 kernel-2 pair sharing one rulebook).

Replaces spconv's SubMConv3d / SparseConv3d / SparseInverseConv3d CUDA
engines (ISBNet/isbnet/model/blocks.py:183-233 usage).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core.segment import segment_sum


def _compute_dtype():
    """GAPRO_CONV_DTYPE=bf16 runs the gather+GEMM in bfloat16 (half the HBM
    bytes moved + MXU-native; fp32 accumulation via preferred_element_type).
    Measured 1.6x on TPU v5e at the 32-channel level. The reference trains
    with AMP fp16 (ISBNet/tools/train.py:79-82), so bf16 training is the
    like-for-like setting; default fp32 for parity tests."""
    return jnp.bfloat16 if os.environ.get("GAPRO_CONV_DTYPE") == "bf16" else jnp.float32


def subm_conv(feats, nbr_idx, weights, valid, chunk: int = 16384):
    """Submanifold 3x3x3 convolution.

    Args:
      feats: [V, Cin].
      nbr_idx: [V, 27] int32 neighbor table (-1 = missing).
      weights: [27, Cin, Cout].
      valid: [V] bool.
      chunk: static tile size for the fused gather-GEMM.

    Returns [V, Cout].
    """
    v, cin = feats.shape
    k, _, cout = weights.shape

    from .pallas_conv import fits_vmem, pallas_enabled, subm_conv_pallas

    if pallas_enabled() and fits_vmem(v, cin, cout):
        return subm_conv_pallas(feats, nbr_idx, weights, valid)

    dt = _compute_dtype()
    w2 = weights.reshape(k * cin, cout).astype(dt)
    feats_c = feats.astype(dt)

    # never pad a small grid up to a huge chunk (8-sublane VPU alignment)
    chunk = min(chunk, max(8, -(-v // 8) * 8))
    pad_v = (-v) % chunk
    nbr = jnp.pad(nbr_idx, ((0, pad_v), (0, 0)), constant_values=-1)
    n_chunks = (v + pad_v) // chunk

    def one_chunk(nbr_c):
        # nbr_c: [chunk, 27]
        safe = jnp.maximum(nbr_c, 0)
        g = feats_c[safe]  # [chunk, 27, Cin]
        g = jnp.where((nbr_c >= 0)[..., None], g, jnp.zeros((), dt))
        return jnp.dot(
            g.reshape(chunk, k * cin), w2, preferred_element_type=jnp.float32
        )

    out = jax.lax.map(one_chunk, nbr.reshape(n_chunks, chunk, k))
    out = out.reshape(v + pad_v, cout)[:v]
    return jnp.where(valid[:, None], out, 0.0)


def down_conv(feats, parent, offset_id, weights, out_capacity: int):
    """Stride-2 kernel-2 sparse conv: scatter-accumulate into the coarse grid.

    out[p] = sum_i x[i] @ W[offset(i)]  over inputs with parent(i) == p.

    Args:
      feats: [V, Cin]; parent: [V] int32 (-1 invalid); offset_id: [V] in [0,8).
      weights: [8, Cin, Cout]; out_capacity: static coarse capacity.
    """
    cout = weights.shape[-1]
    dt = _compute_dtype()
    w = weights.astype(dt)
    f = feats.astype(dt)
    out = jnp.zeros((out_capacity, cout), jnp.float32)
    for kk in range(8):
        sel = (offset_id == kk) & (parent >= 0)
        xk = jnp.where(sel[:, None], f, jnp.zeros((), dt))
        yk = jnp.dot(xk, w[kk], preferred_element_type=jnp.float32)
        out = out + segment_sum(yk, jnp.where(sel, parent, -1), out_capacity)
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
