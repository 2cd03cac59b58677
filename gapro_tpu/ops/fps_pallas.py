"""Furthest-point sampling as a single Pallas kernel (VMEM-resident loop).

The XLA formulation (ops/fps.py) dispatches n_sample dependent
argmax+update steps; each round-trips HBM and the scheduler, costing
~60 us/step => 125 ms for 2048 samples at 262k points (docs/PERF.md) —
pure latency, ~200x over the arithmetic cost.  Here the whole loop runs
inside one kernel with coords + running distances resident in VMEM
([N/128, 128] fp32 tiles: 262k points = 4 x 1 MB), so each iteration is a
handful of VPU passes with no dispatch boundary.

Semantics match ops/fps.py:fps_masked exactly (start at first valid
point, min-distance update, first-index tie-break) — the parity test vmaps
both over random masked batches.  Replaces the reference CUDA kernels
(ISBNet/isbnet/ops/src/sampling/sampling_cuda_kernel.cu,
pointnet2/_ext_src/src/sampling_gpu.cu).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def fps_pallas_enabled() -> bool:
    mode = os.environ.get("GAPRO_FPS_PALLAS", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return jax.default_backend() not in ("cpu", "gpu")


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _fps_kernel(xyz_ref, valid_ref, out_ref, *, n_sample, rows):
    """One grid step = one batch item.

    xyz_ref: [3*R, 128] (x rows | y rows | z rows); valid_ref: [R, 128]
    float (1/0); out_ref: [n_sample, 1] int32.
    """
    x = xyz_ref[0:rows, :]
    y = xyz_ref[rows : 2 * rows, :]
    z = xyz_ref[2 * rows :, :]
    valid = valid_ref[:] > 0.5
    big = jnp.float32(1e10)

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )
    # first valid index (min lin over valid)
    first = jnp.min(jnp.where(valid, lin, jnp.iinfo(jnp.int32).max))

    def coords_at(idx):
        onehot = lin == idx
        sel = lambda a: jnp.sum(jnp.where(onehot, a, 0.0))
        return sel(x), sel(y), sel(z)

    dist0 = jnp.where(valid, big, -1.0)

    def body(i, carry):
        dist, last = carry
        out_ref[pl.ds(i, 1), :] = jnp.full((1, 1), last, jnp.int32)
        lx, ly, lz = coords_at(last)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dist = jnp.where(valid, jnp.minimum(dist, d), -1.0)
        m = jnp.max(dist)
        nxt = jnp.min(jnp.where(dist >= m, lin, jnp.iinfo(jnp.int32).max))
        return dist, nxt

    jax.lax.fori_loop(0, n_sample, body, (dist0, first))


@functools.partial(jax.jit, static_argnums=(2,))
def fps_masked_pallas(xyz: jax.Array, valid: jax.Array, n_sample: int):
    """[B, N, 3] + [B, N] bool -> (indices [B, n_sample] int32, sample_valid).

    Drop-in for ops/fps.py:fps_masked on TPU backends.
    """
    b, n, _ = xyz.shape
    n_pad = (n + _LANES - 1) // _LANES * _LANES
    rows = n_pad // _LANES
    xyz_p = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    valid_p = jnp.pad(valid, ((0, 0), (0, n_pad - n)))
    # [B, 3*R, 128]: x rows, then y rows, then z rows
    xyz_t = jnp.transpose(xyz_p, (0, 2, 1)).reshape(b, 3 * rows, _LANES)
    valid_t = valid_p.astype(jnp.float32).reshape(b, rows, _LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_sample=n_sample, rows=rows),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 3 * rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n_sample, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_sample, 1), jnp.int32),
        interpret=_interpret(),
    )(xyz_t, valid_t)
    idx = out[..., 0]

    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    sample_valid = jnp.arange(n_sample)[None, :] < n_valid[:, None]
    first = jnp.argmax(valid, axis=1).astype(jnp.int32)
    idx = jnp.where(sample_valid, idx, first[:, None])
    return idx.astype(jnp.int32), sample_valid
