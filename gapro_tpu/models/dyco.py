"""Dynamic-conv mask head (dyco) — fused Pallas kernel + XLA reference.

The reference applies per-query 3-layer MLP "dynamic filters" to superpoint
mask features (ISBNet parse_dynamic_params + mask_heads_forward,
isbnet/model/isbnet.py:834-885), chunking queries to bound memory. The XLA
batched-einsum formulation (``dyco_mlp_xla``) is exact but writes the
[B, Q, S, m] hidden activations to HBM between layers — ~134 MB per layer
at Q=256, S=4096, m=32 — so the op is HBM-round-trip-bound, not FLOP-bound
(useful FLOPs are only ~3.7 GFLOP).

The Pallas kernel fuses all three layers in VMEM. Orientation follows the
window-conv v2 lesson (docs/PERF.md): compute TRANSPOSED, with superpoints
on lanes and (query-group x channel) on sublanes, so every matmul dim is
MXU-sized and the per-query output lands on a sublane row (cheap), never a
lane column (the trap):

  * queries are processed in groups of Qc=8 with BLOCK-DIAGONAL weights:
    Wt0 [Qc*m, Qc*(m+8)] @ X [Qc*(m+8), St] -> [Qc*m, St] — one full-MXU
    matmul applies 8 different queries' filters at once;
  * X stacks Qc copies of the feature tile with the per-query relative-geo
    rows ([qloc - sp_coord; |qdim - sp_dim|]), built by one vectorized
    broadcast-subtract (no per-row stores);
  * layers 1/2 are the same shape-shrinking matmuls ([Qc*h, Qc*m] and
    [Qc, Qc*h]); the [Qc, St] result is written directly as 8 sublane rows
    of the [B, G, Qc, S] output.

HBM traffic per forward drops from ~3 x 134 MB of activations to the
feature tile re-reads (m*S floats per query group) + the [Q, S] output.
The block-diagonal zeros cost ~8x structural MXU FLOPs — the same trade
the window conv makes, and the total is still < 30 GFLOP.

Backward: ``jax.custom_vjp`` recomputes through the XLA formulation
(rematerialization — no transposed kernel needed; training's dyco backward
is unchanged, only its forward uses the kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QC = 8  # queries per block-diagonal group
_ST = 512  # superpoint lane tile
_NEG = -1e4  # invalid-superpoint logit fill (matches the XLA path)


def dyco_pallas_enabled() -> bool:
    # default "0" (opt-in), unlike the fps/window kernels' auto-on:
    # chip-validated (Mosaic compiles; parity 1.2e-4 under fp32 matmul
    # precision) but measured at NO end-to-end win at Q=256, S=4096 —
    # full ISBNet forward 346.8 vs 347.2 ms (docs/PERF.md round-3
    # roadmap #2). Kept as the VMEM-resident formulation for larger
    # Q*S regimes where the XLA path's [B,Q,S,m] HBM activations bind.
    mode = os.environ.get("GAPRO_DYCO_PALLAS", "0")
    if mode in ("0", "1"):
        return mode == "1"
    return jax.default_backend() not in ("cpu", "gpu")


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


# --------------------------------------------------------------------- #
# XLA reference formulation (also the custom-VJP backward)
# --------------------------------------------------------------------- #

def dyco_mlp_xla(w0, w1, w2, b0, b1, q_locs, q_dims,
                 sp_feats, sp_coords, sp_dims, sp_valid):
    """Batched-einsum dyco: w0 [B,Q,m+6,m] (rows 0-5 geo, 6: feats),
    w1 [B,Q,m,h], w2 [B,Q,h,1], b0 [B,Q,m], b1 [B,Q,h];
    q_locs/q_dims [B,Q,3]; sp_feats [B,S,m]; sp_coords/sp_dims [B,S,3];
    sp_valid [B,S] -> mask logits [B,Q,S]."""
    rel_coords = q_locs[:, :, None, :] - sp_coords[:, None, :, :]  # [B,Q,S,3]
    rel_dims = jnp.abs(q_dims[:, :, None, :] - sp_dims[:, None, :, :])
    rel_geo = jnp.concatenate([rel_coords, rel_dims], axis=-1)  # [B,Q,S,6]

    # first layer split: concat([rel_geo, feats]) @ w0 ==
    # rel_geo @ w0[:6] + feats @ w0[6:] — avoids materializing the
    # [B,Q,S,m+6] concat and the Q-broadcast copy of sp_mask_feats
    x = jax.nn.relu(
        jnp.einsum("bqsc,bqcd->bqsd", rel_geo, w0[:, :, :6, :])
        + jnp.einsum("bsc,bqcd->bqsd", sp_feats, w0[:, :, 6:, :])
        + b0[:, :, None, :]
    )
    x = jax.nn.relu(jnp.einsum("bqsc,bqcd->bqsd", x, w1) + b1[:, :, None, :])
    x = jnp.einsum("bqsc,bqcd->bqsd", x, w2)[..., 0]  # no bias on last layer
    return jnp.where(sp_valid[:, None, :], x, _NEG)


# --------------------------------------------------------------------- #
# Pallas kernel
# --------------------------------------------------------------------- #

def _dyco_kernel(qgeo_ref, featsT_ref, spg_ref, valid_ref,
                 wt0_ref, wt1_ref, wt2_ref, b0_ref, b1_ref, out_ref,
                 *, qc, st):
    feats = featsT_ref[...]  # [m, St]
    mrep = jnp.tile(feats, (qc, 1))  # [qc*m, St]
    sp_rep = jnp.tile(spg_ref[...], (qc, 1))  # [qc*8, St] (rows 6,7 zero)
    diff = qgeo_ref[...] - sp_rep  # qgeo [qc*8, 1] broadcasts over lanes
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (qc * 8, st), 0) % 8
    geo = jnp.where(rowmod < 3, diff,
                    jnp.where(rowmod < 6, jnp.abs(diff), 0.0))
    x = jnp.concatenate([mrep, geo], axis=0)  # [qc*(m+8), St]
    x0 = jax.nn.relu(
        jnp.dot(wt0_ref[...], x, preferred_element_type=jnp.float32)
        + b0_ref[...])
    x1 = jax.nn.relu(
        jnp.dot(wt1_ref[...], x0, preferred_element_type=jnp.float32)
        + b1_ref[...])
    o = jnp.dot(wt2_ref[...], x1, preferred_element_type=jnp.float32)  # [qc, St]
    out_ref[...] = jnp.where(valid_ref[...] > 0.5, o, _NEG)


def _blockdiag(w, eye):
    """w [B, G, Qc, d, c] -> block-diagonal [B, G, Qc*d, Qc*c]."""
    b, g, qc, d, c = w.shape
    big = jnp.einsum("bgqdc,qp->bgqdpc", w, eye)
    return big.reshape(b, g, qc * d, qc * c)


def _pallas_forward(w0, w1, w2, b0, b1, q_locs, q_dims,
                    sp_feats, sp_coords, sp_dims, sp_valid):
    B, Q, m6, m = w0.shape
    h = w1.shape[-1]
    S = sp_feats.shape[1]
    qc = _QC

    # pad queries to the group size, superpoints to the lane tile
    qp = -(-Q // qc) * qc
    st = min(_ST, -(-S // 128) * 128)
    sp = -(-S // st) * st
    g = qp // qc
    padq = [(0, 0), (0, qp - Q)]
    w0 = jnp.pad(w0, padq + [(0, 0), (0, 0)])
    w1 = jnp.pad(w1, padq + [(0, 0), (0, 0)])
    w2 = jnp.pad(w2, padq + [(0, 0), (0, 0)])
    b0 = jnp.pad(b0, padq + [(0, 0)])
    b1 = jnp.pad(b1, padq + [(0, 0)])
    q_locs = jnp.pad(q_locs, padq + [(0, 0)])
    q_dims = jnp.pad(q_dims, padq + [(0, 0)])
    pads = [(0, 0), (0, sp - S)]
    sp_feats = jnp.pad(sp_feats, pads + [(0, 0)])
    sp_coords = jnp.pad(sp_coords, pads + [(0, 0)])
    sp_dims = jnp.pad(sp_dims, pads + [(0, 0)])
    sp_valid = jnp.pad(sp_valid, pads)

    f32 = jnp.float32
    eye = jnp.eye(qc, dtype=f32)
    # weights, transposed per layer and laid out block-diagonally per group
    w0fT = jnp.swapaxes(w0[:, :, 6:, :], -1, -2).reshape(B, g, qc, m, m)
    w0gT = jnp.swapaxes(w0[:, :, :6, :], -1, -2)  # [B,Qp,m,6]
    w0gT = jnp.pad(w0gT, [(0, 0), (0, 0), (0, 0), (0, 2)]).reshape(B, g, qc, m, 8)
    wt0 = jnp.concatenate(
        [_blockdiag(w0fT.astype(f32), eye), _blockdiag(w0gT.astype(f32), eye)],
        axis=-1)  # [B, G, qc*m, qc*(m+8)]
    wt1 = _blockdiag(
        jnp.swapaxes(w1, -1, -2).reshape(B, g, qc, h, m).astype(f32), eye)
    wt2 = _blockdiag(
        w2[..., 0].reshape(B, g, qc, 1, h).astype(f32), eye)  # [B,G,qc,qc*h]
    b0v = b0.astype(f32).reshape(B, g, qc * m, 1)
    b1v = b1.astype(f32).reshape(B, g, qc * h, 1)
    qgeo = jnp.concatenate(
        [q_locs, q_dims, jnp.zeros((B, qp, 2), f32)], axis=-1
    ).astype(f32).reshape(B, g, qc * 8, 1)

    featsT = jnp.swapaxes(sp_feats.astype(f32), 1, 2)  # [B, m, Sp]
    spg = jnp.concatenate(
        [sp_coords, sp_dims, jnp.zeros((B, sp, 2), f32)], axis=-1)
    spgT = jnp.swapaxes(spg.astype(f32), 1, 2)  # [B, 8, Sp]
    validT = sp_valid.astype(f32)[:, None, :]  # [B, 1, Sp]

    grid = (B, g, sp // st)  # s innermost: weight blocks stay resident per group
    const = lambda blk: pl.BlockSpec(blk, lambda b, gi, s: (b, gi, 0, 0),
                                     memory_space=pltpu.VMEM)
    tile = lambda rows: pl.BlockSpec((None, rows, st),
                                     lambda b, gi, s: (b, 0, s),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dyco_kernel, qc=qc, st=st),
        grid=grid,
        in_specs=[
            const((None, None, qc * 8, 1)),     # qgeo
            tile(m),                            # featsT
            tile(8),                            # spgT
            tile(1),                            # validT
            const((None, None, qc * m, qc * (m + 8))),  # wt0
            const((None, None, qc * h, qc * m)),        # wt1
            const((None, None, qc, qc * h)),            # wt2
            const((None, None, qc * m, 1)),             # b0
            const((None, None, qc * h, 1)),             # b1
        ],
        out_specs=pl.BlockSpec((None, None, qc, st),
                               lambda b, gi, s: (b, gi, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, g, qc, sp), f32),
        interpret=_interpret(),
    )(qgeo, featsT, spgT, validT, wt0, wt1, wt2, b0v, b1v)
    return out.reshape(B, qp, sp)[:, :Q, :S]


@jax.custom_vjp
def _dyco_pallas(w0, w1, w2, b0, b1, q_locs, q_dims,
                 sp_feats, sp_coords, sp_dims, sp_valid):
    return _pallas_forward(w0, w1, w2, b0, b1, q_locs, q_dims,
                           sp_feats, sp_coords, sp_dims, sp_valid)


def _dyco_fwd(*args):
    return _pallas_forward(*args), args


def _dyco_bwd(res, ct):
    # rematerialize through the XLA formulation; its VJP is exact for the
    # same math (the kernel computes the identical function)
    _, vjp = jax.vjp(dyco_mlp_xla, *res)
    return vjp(ct)


_dyco_pallas.defvjp(_dyco_fwd, _dyco_bwd)


def dyco_mlp(w0, w1, w2, b0, b1, q_locs, q_dims,
             sp_feats, sp_coords, sp_dims, sp_valid):
    """Dispatch: fused Pallas kernel on TPU (GAPRO_DYCO_PALLAS=auto/1),
    batched-einsum XLA elsewhere. Identical math either way."""
    if dyco_pallas_enabled():
        return _dyco_pallas(w0, w1, w2, b0, b1, q_locs, q_dims,
                            sp_feats, sp_coords, sp_dims, sp_valid)
    return dyco_mlp_xla(w0, w1, w2, b0, b1, q_locs, q_dims,
                        sp_feats, sp_coords, sp_dims, sp_valid)
