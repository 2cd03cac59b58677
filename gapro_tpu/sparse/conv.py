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
import numpy as np



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


def _packed_kmap():
    """Static [4, 12, 4] map (output parity p, neighbor block j, slot s) ->
    3x3x3 kernel-offset index (27 = the zero slot).

    Block j enumerates (tz, ty, dx) in ``zy_pack_tables`` loop order; slot
    s = zbit*2 + ybit is the position inside a 2(z) x 2(y) block.  For an
    output voxel with parity bits (pz, py), the neighbor at block offset
    (tz, ty) slot (zbit, ybit) sits at kernel offset dz = 2*tz + zbit - 2
    + pz (and same in y) — 27 of the 48 (j, s) pairs land inside the
    kernel, the rest get the zero weight.
    """
    kmap = np.full((4, 12, 4), 27, np.int32)
    for p in range(4):
        pz, py = p >> 1, p & 1
        for tz in (0, 1):
            for ty in (0, 1):
                for dxi in range(3):
                    j = tz * 6 + ty * 3 + dxi
                    for zbit in (0, 1):
                        for ybit in (0, 1):
                            dz = 2 * tz + zbit - 2 + pz
                            dy = 2 * ty + ybit - 2 + py
                            if -1 <= dz <= 1 and -1 <= dy <= 1:
                                kmap[p, j, zbit * 2 + ybit] = (
                                    (dz + 1) * 9 + (dy + 1) * 3 + dxi
                                )
    return kmap


_PACKED_KMAP = _packed_kmap()


def packed_profitable(cin: int, cout: int) -> bool:
    """Whether to use the z/y-packed conv (GAPRO_PACKED_CONV=1 only).

    Measured on TPU v5e at V=262k, C=32 (docs/PERF.md): the packed form's
    12x512B gather IS ~2.8x faster per row than the 27x128B one, but the
    V-row scatter that builds the packed table costs 38 ms and the parity
    take_along_axis 17 ms — 62 ms total vs 21 ms plain.  Kept as an
    opt-in experiment; the windowed monotone-gather Pallas kernel is the
    production fix.
    """
    return os.environ.get("GAPRO_PACKED_CONV", "0") == "1"


def subm_conv_packed(feats, pack_parent, pack_parity, pack_nbr, weights, valid):
    """Submanifold 3x3x3 conv over z/y-packed block rows.

    Voxels are scattered into [blocks, 4*Cin] rows (2z x 2y voxels per
    block); each output voxel gathers its <= 12 neighbor block rows and
    contracts against a [12*4*Cin, 4*Cout] weight whose extra parity axis
    encodes all 4 output-parity kernel alignments at once; the right Cout
    column block is then selected per voxel.  One V-row scatter + 12V-row
    gather replaces the 27V-row gather of ``subm_conv``.

    Args:
      feats: [V, Cin].
      pack_parent/pack_parity/pack_nbr: tables from
        :func:`~gapro_tpu.sparse.plan.zy_pack_tables`.
      weights: [27, Cin, Cout];  valid: [V] bool.
    """
    v, cin = feats.shape
    k, _, cout = weights.shape
    assert k == 27
    dt = _compute_dtype()

    # block table: rows [0, v) real blocks, row v = junk (invalid voxels),
    # row v+1 = zeros (missing neighbors)
    rows = jnp.where(pack_parent >= 0, pack_parent, v)
    lin = rows * 4 + pack_parity
    tbl = jnp.zeros(((v + 2) * 4, cin), dt).at[lin].set(feats.astype(dt))
    tbl = tbl.reshape(v + 2, 4 * cin)

    wpad = jnp.concatenate([weights.astype(dt), jnp.zeros((1, cin, cout), dt)], 0)
    w_all = wpad[jnp.asarray(_PACKED_KMAP)]  # [4, 12, 4, Cin, Cout]
    w_all = jnp.transpose(w_all, (1, 2, 3, 0, 4)).reshape(12 * 4 * cin, 4 * cout)

    idx = jnp.where(pack_nbr >= 0, pack_nbr, v + 1)
    g = tbl[idx.reshape(-1)].reshape(v, 12 * 4 * cin)
    out_all = jnp.dot(g, w_all, preferred_element_type=jnp.float32)
    out = jnp.take_along_axis(
        out_all.reshape(v, 4, cout), pack_parity[:, None, None], axis=1
    )[:, 0]
    return jnp.where(valid[:, None], out, 0.0)


def subm_conv_auto(feats, level_plan, weights, chunk: int | None = None):
    """Dispatch a 3x3x3 subm conv: windowed Pallas kernel when the plan
    carries window tables (default on TPU), else packed/plain gather-GEMM."""
    lp = level_plan
    if lp.wtab is not None:
        from .window_conv import subm_conv_window

        return subm_conv_window(feats, lp.wtab, weights, lp.grid.valid)
    if lp.pack_nbr is not None and packed_profitable(
        feats.shape[-1], weights.shape[-1]
    ):
        return subm_conv_packed(
            feats, lp.pack_parent, lp.pack_parity, lp.pack_nbr, weights,
            lp.grid.valid,
        )
    return subm_conv(feats, lp.subm_nbr, weights, lp.grid.valid, chunk)


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
