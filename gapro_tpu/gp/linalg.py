"""Matmul-based triangular inverse for the SVGP's M=128 systems.

XLA's `solve_triangular` lowers to a block-SEQUENTIAL loop on TPU; at the
SVGP's sizes it dominated the fit step (ablated on chip: the solve is
~59 ms of a 91 ms 50-iteration 32-lane vmapped fit batch, and its cost is
nearly independent of the rhs width — it's latency, not FLOPs). Computing
L^{-1} explicitly and applying it as one MXU matmul removes the
sequential chain from every Adam step, and the inverse's VJP is more
matmuls rather than more solves.

`tri_inv_mm` uses iterative BLOCK DOUBLING (compile-friendly: a naive
divide-and-conquer recursion to 1x1 traced ~1000 HLOs and tripled test
compile times):

  1. invert all 8x8 diagonal blocks with an unrolled, fully-batched
     forward substitution (one vectorized step per row);
  2. for block sizes s = 8, 16, ... combine adjacent pairs
     inv([[A, 0], [C, B]]) = [[iA, 0], [-iB C iA, iB]] with the pair axis
     BATCHED — two batched matmuls per doubling level.

Sizes must be multiples of a power-of-2 block count; callers pad with an
identity block (exact: inv(blockdiag(L, I)) = blockdiag(inv(L), I)).
Residual ||inv(L) L - I|| measured at the 1e-7 level for the SVGP's
jittered RBF Gram matrices (tests/test_gp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_BASE = 8


@jax.custom_vjp
def cholesky_mm(k):
    """`jnp.linalg.cholesky` with a MATMUL-ONLY reverse pass.

    The stock VJP performs two sequential triangular solves per backward —
    inside the SVGP's 50-step Adam scan that sequential chain costs more
    than the Cholesky itself. Murray (2016, "Differentiation of the
    Cholesky decomposition"): Kbar = L^{-T} sym(Phi(L^T Lbar)) L^{-1}
    with Phi = lower triangle with halved diagonal — pure matmuls given
    the block-doubling `tri_inv_mm`. Verified against jax.grad of the
    stock cholesky to ~6e-8 (tests/test_gp_linalg.py)."""
    return jnp.linalg.cholesky(k)


def _chol_fwd(k):
    low = jnp.linalg.cholesky(k)
    return low, low


def _chol_bwd(low, dl):
    n = low.shape[-1]
    eye = jnp.eye(n, dtype=low.dtype)
    il = tri_inv_mm(low)
    p = jnp.tril(jnp.matmul(jnp.swapaxes(low, -1, -2), dl, precision=_HI))
    p = p - 0.5 * eye * p
    sym = 0.5 * (p + jnp.swapaxes(p, -1, -2))
    kbar = jnp.matmul(jnp.swapaxes(il, -1, -2),
                      jnp.matmul(sym, il, precision=_HI), precision=_HI)
    return (kbar,)


cholesky_mm.defvjp(_chol_fwd, _chol_bwd)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _base_inv(d):
    """Batched inverse of lower-triangular [..., B, 8, 8] blocks via
    unrolled forward substitution (row i of X = (e_i - L[i,:i] X[:i]) /
    L[i,i]), fully vectorized over the block axes."""
    rows = []
    for i in range(_BASE):
        e_i = jnp.zeros((_BASE,), d.dtype).at[i].set(1.0)
        acc = e_i
        for j in range(i):
            acc = acc - d[..., i, j, None] * rows[j]
        rows.append(acc / d[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def tri_inv_mm(l):
    """Inverse of lower-triangular [..., N, N] (N a multiple of 8 up to a
    power-of-2 block count; pad otherwise) via batched block doubling."""
    n = l.shape[-1]
    p = max(_next_pow2(n), _BASE)
    if p != n:
        pad = [(0, 0)] * (l.ndim - 2) + [(0, p - n), (0, p - n)]
        lp = jnp.pad(l, pad) + jnp.eye(p, dtype=l.dtype) * (jnp.arange(p) >= n)
        return tri_inv_mm(lp)[..., :n, :n]

    nb = p // _BASE
    # [..., nb, nb, B, B] block view: blocks[..., r, c] = l[rB:(r+1)B, cB:(c+1)B]
    blocks = l.reshape(l.shape[:-2] + (nb, _BASE, nb, _BASE))
    blocks = jnp.swapaxes(blocks, -3, -2)  # [..., nb(row), nb(col), B, B]

    # invert the nb diagonal base blocks, batched
    diag = jnp.diagonal(blocks, axis1=-4, axis2=-3)  # [..., B, B, nb]
    diag = jnp.moveaxis(diag, -1, -3)  # [..., nb, B, B]
    inv = _base_inv(diag)  # [..., nb, B, B] inverses of size-8 blocks

    s = _BASE
    while s < p:
        ns = p // s  # current number of s-blocks
        # pair up: A = even diagonal inverses, B = odd, C = lower-left
        ia = inv[..., 0::2, :, :]  # [..., ns/2, s, s]
        ib = inv[..., 1::2, :, :]
        # lower-left s-block of each pair from the original matrix
        c = _lower_left_blocks(l, s)  # [..., ns/2, s, s]
        low = -jnp.matmul(ib, jnp.matmul(c, ia, precision=_HI), precision=_HI)
        z = jnp.zeros_like(low)
        top = jnp.concatenate([ia, z], -1)  # [..., ns/2, s, 2s]
        bot = jnp.concatenate([low, ib], -1)
        inv = jnp.concatenate([top, bot], -2)  # [..., ns/2, 2s, 2s]
        s *= 2
    return inv[..., 0, :, :]


def _lower_left_blocks(l, s: int):
    """[..., npairs, s, s] lower-left sub-blocks l[(2i+1)s:(2i+2)s,
    2is:(2i+1)s] for each adjacent pair of s-blocks."""
    n = l.shape[-1]
    npairs = n // (2 * s)
    view = l.reshape(l.shape[:-2] + (npairs, 2 * s, n))
    rows = view[..., s : 2 * s, :]  # [..., npairs, s, n]
    rows = rows.reshape(l.shape[:-2] + (npairs, s, npairs, 2 * s))
    idx = jnp.arange(npairs)
    # take the diagonal (pair i row-block with pair i column-block), col 0..s
    out = jnp.diagonal(rows[..., :s], axis1=-4, axis2=-2)  # [..., s, s, npairs]
    return jnp.moveaxis(out, -1, -3)
