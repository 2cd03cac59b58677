import jax.numpy as jnp
import numpy as np

from gapro_tpu.gp import fit_gp, fit_gp_batch
import pytest


def _make_problem(rng, n1=20, n2=20, sep=4.0, d=3):
    a = rng.normal(size=(n1, d)).astype(np.float32)
    b = rng.normal(size=(n2, d)).astype(np.float32) + sep
    x = np.concatenate([a, b], 0)
    y = np.concatenate([-np.ones(n1), np.ones(n2)]).astype(np.float32)
    return x, y


def test_gp_separates_blobs():
    rng = np.random.default_rng(0)
    x, y = _make_problem(rng)
    mask = np.ones(len(x), bool)
    # test points: near each blob center and in the middle
    test_x = np.array(
        [[0, 0, 0], [4, 4, 4], [2, 2, 2]], dtype=np.float32
    )
    tmask = np.ones(3, bool)
    res = fit_gp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), jnp.asarray(test_x), jnp.asarray(tmask)
    )
    probs = np.asarray(res.probs)
    assert probs[0] < 0.2, probs  # clearly class -1 (b1)
    assert probs[1] > 0.8, probs  # clearly class +1 (b2)
    assert bool(res.labels[1]) and not bool(res.labels[0])
    # confidence = max(p, 1-p)
    pn = np.asarray(res.probs_new)
    assert pn[0] > 0.8 and pn[1] > 0.8
    # midpoint is the least certain of the three
    assert pn[2] == min(pn)
    # latent mean sign agrees with labels
    assert float(res.mu[0]) < 0 < float(res.mu[1])
    # ELBO is finite and sane
    assert np.isfinite(float(res.elbo))


@pytest.mark.slow
def test_gp_padding_invariance():
    rng = np.random.default_rng(1)
    x, y = _make_problem(rng, n1=12, n2=15)
    n = len(x)
    test_x = rng.normal(size=(5, 3)).astype(np.float32) + 2.0

    res_a = fit_gp(
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.ones(n, bool),
        jnp.asarray(test_x),
        jnp.ones(5, bool),
    )

    # pad train to 48 and test to 8 with garbage rows
    pad_t, pad_q = 48, 8
    xp = np.concatenate([x, rng.normal(size=(pad_t - n, 3)).astype(np.float32) * 100], 0)
    yp = np.concatenate([y, np.ones(pad_t - n, np.float32)], 0)
    mp = np.arange(pad_t) < n
    qp = np.concatenate([test_x, np.full((pad_q - 5, 3), 7.7, np.float32)], 0)
    qm = np.arange(pad_q) < 5
    res_b = fit_gp(
        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mp), jnp.asarray(qp), jnp.asarray(qm)
    )
    np.testing.assert_allclose(
        np.asarray(res_a.probs), np.asarray(res_b.probs)[:5], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_a.mu), np.asarray(res_b.mu)[:5], rtol=1e-3, atol=2e-3
    )


@pytest.mark.slow
def test_gp_batch_matches_single():
    rng = np.random.default_rng(2)
    T, Q, D, B = 32, 4, 3, 3
    txs, tys, qxs = [], [], []
    singles = []
    for i in range(B):
        x, y = _make_problem(rng, n1=16, n2=16)
        q = rng.normal(size=(Q, D)).astype(np.float32) + 2.0
        txs.append(x)
        tys.append(y)
        qxs.append(q)
        singles.append(
            fit_gp(
                jnp.asarray(x), jnp.asarray(y), jnp.ones(T, bool), jnp.asarray(q), jnp.ones(Q, bool)
            )
        )
    batch = fit_gp_batch(
        jnp.asarray(np.stack(txs)),
        jnp.asarray(np.stack(tys)),
        jnp.ones((B, T), bool),
        jnp.asarray(np.stack(qxs)),
        jnp.ones((B, Q), bool),
        50,
        0.1,
        None,
    )
    for i in range(B):
        # fp reorder across 50 optimization steps -> small drift is expected
        np.testing.assert_allclose(
            np.asarray(singles[i].probs), np.asarray(batch.probs[i]), rtol=2e-3, atol=2e-3
        )


@pytest.mark.slow
def test_gp_inducing_cap_quality():
    """Sparse inducing set (M << T) separates the blobs like the full GP."""
    rng = np.random.default_rng(3)
    x, y = _make_problem(rng, n1=64, n2=64)
    q = np.concatenate([
        rng.normal(size=(8, 3)).astype(np.float32),          # near blob 1
        rng.normal(size=(8, 3)).astype(np.float32) + 4.0,    # near blob 2
    ])
    T = len(x)
    full = fit_gp(jnp.asarray(x), jnp.asarray(y), jnp.ones(T, bool),
                  jnp.asarray(q), jnp.ones(16, bool))
    sparse = fit_gp(jnp.asarray(x), jnp.asarray(y), jnp.ones(T, bool),
                    jnp.asarray(q), jnp.ones(16, bool), n_inducing=16)
    np.testing.assert_array_equal(np.asarray(full.labels), np.asarray(sparse.labels))
    np.testing.assert_allclose(np.asarray(full.probs), np.asarray(sparse.probs), atol=0.1)
