"""gp/linalg.py: block-doubling triangular inverse (the matmul-only
replacement for XLA's sequential solve_triangular in the SVGP fit step —
docs/PERF.md round 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gapro_tpu.gp.linalg import tri_inv_mm


@pytest.mark.parametrize("n", [3, 8, 16, 64, 90, 128])
def test_tri_inv_residual(n):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, n, n)).astype(np.float32)
    k = a @ np.transpose(a, (0, 2, 1)) / n + 0.1 * np.eye(n, dtype=np.float32)
    low = np.linalg.cholesky(k).astype(np.float32)
    inv = np.asarray(jax.jit(tri_inv_mm)(jnp.asarray(low)))
    # strictly lower-triangular output
    assert np.allclose(inv * (np.arange(n)[None, :] > np.arange(n)[:, None]),
                       0.0)
    resid = np.max(np.abs(inv @ low - np.eye(n, dtype=np.float32)))
    assert resid < 5e-6, resid
    ref = np.linalg.inv(low.astype(np.float64))
    assert np.max(np.abs(inv - ref)) < 5e-5


def test_tri_inv_grad_matches_solve():
    """d/dL of sum(L^{-1} B) must agree with the solve_triangular VJP."""
    from jax.scipy.linalg import solve_triangular

    rng = np.random.default_rng(1)
    n, q = 32, 12
    a = rng.standard_normal((n, n)).astype(np.float32)
    k = a @ a.T / n + 0.1 * np.eye(n, dtype=np.float32)
    low = jnp.asarray(np.linalg.cholesky(k).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, q)).astype(np.float32))

    g1 = jax.grad(lambda l: jnp.sum(jnp.tanh(tri_inv_mm(l) @ b)))(low)
    g2 = jax.grad(lambda l: jnp.sum(jnp.tanh(
        solve_triangular(l, b, lower=True))))(low)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-4)


def test_cholesky_mm_grad_matches_stock():
    from gapro_tpu.gp.linalg import cholesky_mm

    rng = np.random.default_rng(2)
    n = 24
    a = rng.standard_normal((n, n)).astype(np.float32)
    k = jnp.asarray(a @ a.T / n + 0.5 * np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    g1 = jax.grad(lambda kk: jnp.sum(jnp.tanh(
        jnp.linalg.cholesky(kk) * 0.3) * c))(k)
    g2 = jax.grad(lambda kk: jnp.sum(jnp.tanh(cholesky_mm(kk) * 0.3) * c))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)
