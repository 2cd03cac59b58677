"""Pallas TPU kernel for the submanifold gather-GEMM convolution.

The hot op of the framework (~90% of backbone FLOPs, SURVEY.md §3.2): for
each active voxel, gather its 27 neighbors' features and contract against
the [27, Cin, Cout] kernel.

Design (per pallas_guide.md):
  * The whole feature table stays resident in VMEM — at every U-Net level
    V*Cin*4B <= ~8MB (V shrinks 2x per level while Cin grows +32), so the
    gather is VMEM-local instead of random HBM access.
  * Grid over row tiles of TILE voxels; each program gathers [TILE, 27, Cin]
    with vector loads and issues ONE [TILE, 27*Cin] x [27*Cin, Cout] MXU
    contraction (large-K beats 27 skinny GEMMs).
  * Neighbor ids < 0 (missing) are clamped and their rows zeroed on the VPU.

Falls back to the XLA chunked formulation (sparse/conv.py) off-TPU or when
the table exceeds the VMEM budget.

STATUS (measured on TPU v5e): Mosaic rejects arbitrary int row-gathers from
VMEM ("Cannot do int indexing on TPU"), so this kernel only runs in
interpret mode today. The XLA production path is row-rate-bound in the
neighbor gather (~330M rows/s; see docs/PERF.md) — this kernel is exactly
the fix once Mosaic grows dynamic-gather support; keep GAPRO_SUBM_IMPL=xla
until then.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feats + gathered tile + weights must fit VMEM (~16MB); leave headroom
_VMEM_BUDGET_BYTES = int(os.environ.get("GAPRO_SUBM_VMEM_BUDGET", 10 * 2**20))


def _kernel(nbr_ref, feats_ref, w_ref, out_ref):
    """One row tile: gather neighbors from the resident table + fused GEMM."""
    nbr = nbr_ref[:]  # [TILE, 27] int32
    t, k = nbr.shape
    cin = feats_ref.shape[1]
    safe = jnp.maximum(nbr, 0)
    g = feats_ref[safe.reshape(-1)]  # [TILE*27, Cin] VMEM row gather
    g = g.reshape(t, k, cin)
    g = jnp.where((nbr >= 0)[..., None], g, 0.0)
    out_ref[:] = jnp.dot(
        g.reshape(t, k * cin), w_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def subm_conv_pallas(feats, nbr_idx, weights, valid, tile: int = 256,
                     interpret: bool = False):
    """Pallas submanifold conv: [V, Cin] x [V, 27] x [27, Cin, Cout] -> [V, Cout]."""
    v, cin = feats.shape
    k, _, cout = weights.shape
    w2 = weights.reshape(k * cin, cout)

    tile = min(tile, max(8, -(-v // 8) * 8))
    pad = (-v) % tile
    nbr = jnp.pad(nbr_idx, ((0, pad), (0, 0)), constant_values=-1)
    grid = (v + pad) // tile

    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full feature table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full [27*Cin, Cout]
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v + pad, cout), jnp.float32),
        interpret=interpret,
    )(nbr, feats, w2)
    out = out[:v]
    return jnp.where(valid[:, None], out, 0.0)


def fits_vmem(v: int, cin: int, cout: int, tile: int = 256) -> bool:
    table = v * cin * 4
    w = 27 * cin * cout * 4
    work = tile * 27 * cin * 4 * 2 + tile * cout * 4
    return table + w + work <= _VMEM_BUDGET_BYTES


def pallas_enabled() -> bool:
    """Opt-in via GAPRO_SUBM_IMPL=pallas (or 'auto' = pallas on TPU)."""
    mode = os.environ.get("GAPRO_SUBM_IMPL", "xla")
    if mode == "pallas":
        return True
    if mode == "auto":
        try:
            return jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            return False
    return False
