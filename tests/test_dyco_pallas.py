"""Fused dyco Pallas kernel vs the XLA batched-einsum reference.

The kernel (models/dyco.py) computes the identical function with
block-diagonal per-query-group weights in a transposed VMEM-resident
layout; on CPU it runs in interpret mode, so fp32 agreement should be to
reassociation-level tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapro_tpu.models.dyco import _dyco_pallas, dyco_mlp_xla


def _problem(rng, B, Q, S, m=32, h=16):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    w0 = f(B, Q, m + 6, m)
    w1 = f(B, Q, m, h)
    w2 = f(B, Q, h, 1)
    b0 = f(B, Q, m)
    b1 = f(B, Q, h)
    q_locs = f(B, Q, 3)
    q_dims = jnp.abs(f(B, Q, 3))
    sp_feats = f(B, S, m)
    sp_coords = f(B, S, 3)
    sp_dims = jnp.abs(f(B, S, 3))
    sp_valid = jnp.asarray(rng.random((B, S)) > 0.2)
    return (w0, w1, w2, b0, b1, q_locs, q_dims,
            sp_feats, sp_coords, sp_dims, sp_valid)


@pytest.mark.parametrize("B,Q,S", [
    (1, 256, 4096),   # full-size train shapes
    (2, 64, 600),     # batch, iterative-inference Q, ragged S (pad path)
    (1, 12, 130),     # Q not a multiple of the group size
])
def test_dyco_pallas_matches_xla(B, Q, S):
    rng = np.random.default_rng(0)
    args = _problem(rng, B, Q, S)
    ref = dyco_mlp_xla(*args)
    out = _dyco_pallas(*args)
    assert out.shape == ref.shape == (B, Q, S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_dyco_pallas_grad_matches_xla():
    rng = np.random.default_rng(1)
    args = _problem(rng, 1, 16, 256)

    def loss_pallas(*a):
        return jnp.sum(jnp.tanh(_dyco_pallas(*a, args[-1]) * 1e-2))

    def loss_xla(*a):
        return jnp.sum(jnp.tanh(dyco_mlp_xla(*a, args[-1]) * 1e-2))

    gp = jax.grad(loss_pallas, argnums=tuple(range(10)))(*args[:-1])
    gx = jax.grad(loss_xla, argnums=tuple(range(10)))(*args[:-1])
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-4)
