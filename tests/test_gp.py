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


def test_fit_gp_ensemble_separates_blobs():
    """The ensemble solver (gaussian_process_utils.py:119-251 behind the
    same API): two well-separated blobs as b1/b2, intersection points near
    each blob must get the matching label; channel blocks ([0,3] xyz,
    [3,6] xyz-copy) must agree with each other."""
    from gapro_tpu.gp import fit_gp_ensemble

    rng = np.random.default_rng(0)
    n = 120
    b1_xyz = rng.normal(0.0, 0.15, (n, 3)).astype(np.float32)
    b2_xyz = (rng.normal(0.0, 0.15, (n, 3)) + np.array([2.0, 0, 0])).astype(np.float32)
    q1 = b1_xyz[:20] + 0.05
    q2 = b2_xyz[:20] + 0.05
    xyz = np.concatenate([b1_xyz, b2_xyz, q1, q2]).astype(np.float32)
    feats = np.concatenate([xyz, xyz], axis=1)  # two identical blocks
    spp = np.arange(len(xyz))  # one spp per point (pooling no-op)
    b1 = np.arange(n)
    b2 = np.arange(n, 2 * n)
    inter = np.arange(2 * n, 2 * n + 40)

    probs, labels, var = fit_gp_ensemble(
        xyz, feats, spp, b1, b2, inter, channel_dims=[0, 3, 6],
        training_iter=50, npoint_nearest=800, spp_pool=True)
    assert probs.shape == labels.shape == var.shape == (40,)
    assert not labels[:20].any(), labels[:20]  # near b1 -> class 0
    assert labels[20:].all(), labels[20:]  # near b2 -> class 1
    assert (probs >= 0.5).all() and (probs <= 1.0).all()
    assert (var >= 0.0).all()


def test_fit_gp_ensemble_subsample_and_pool_paths():
    """npoint_nearest subsampling + spp pooling paths execute and expand
    results back to intersection rows."""
    from gapro_tpu.gp import fit_gp_ensemble

    rng = np.random.default_rng(1)
    n = 300
    b1_xyz = rng.normal(0.0, 0.2, (n, 3)).astype(np.float32)
    b2_xyz = (rng.normal(0.0, 0.2, (n, 3)) + np.array([1.5, 0, 0])).astype(np.float32)
    # 12+12 queries: groups of 4 align with the b1/b2 boundary, so every
    # query superpoint is pure
    q = np.concatenate([b1_xyz[:12], b2_xyz[:12]]) + 0.02
    xyz = np.concatenate([b1_xyz, b2_xyz, q]).astype(np.float32)
    spp = (np.arange(len(xyz)) // 4)  # 4 points per superpoint
    probs, labels, var = fit_gp_ensemble(
        xyz, xyz, spp, np.arange(n), np.arange(n, 2 * n),
        np.arange(2 * n, 2 * n + 24), channel_dims=[0, 3],
        training_iter=30, npoint_nearest=64, spp_pool=True)
    assert probs.shape == (24,)
    # rows sharing a superpoint share the pooled prediction
    assert labels[0] == labels[1] == labels[2] == labels[3]
    assert not labels[:12].any() and labels[12:].all()


def test_logreg_fallback_separates_blobs():
    """fit_logreg_batch is the reference fit_regression_model estimator
    (gaussian_process_utils.py:332: a single Linear trained with BCE +
    AdamW(0.1) — logistic regression; the SimpleModel MLP at :254-278 is
    dead code). Separable box-pair task -> confident correct labels;
    masked query rows stay neutral at 0.5."""
    import numpy as np
    from gapro_tpu.gp import fit_logreg_batch

    rng = np.random.default_rng(0)
    B, T, Q, D = 3, 64, 32, 6
    tx = np.zeros((B, T, D), np.float32)
    ty = np.zeros((B, T), np.float32)
    qx = np.zeros((B, Q, D), np.float32)
    want = np.zeros((B, Q), bool)
    for b in range(B):
        c1, c2 = rng.normal(0, 1, D), rng.normal(0, 1, D)
        c2 = c1 + 3.0 * (c2 - c1) / np.linalg.norm(c2 - c1)
        half = T // 2
        tx[b, :half] = c1 + rng.normal(0, 0.3, (half, D))
        tx[b, half:] = c2 + rng.normal(0, 0.3, (half, D))
        ty[b, :half], ty[b, half:] = -1, 1
        w2 = rng.random(Q) < 0.5
        qx[b] = np.where(w2[:, None], c2, c1) + rng.normal(0, 0.3, (Q, D))
        want[b] = w2
    tm = np.ones((B, T), bool)
    qm = np.ones((B, Q), bool)
    qm[:, -4:] = False

    r = fit_logreg_batch(jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tm),
                         jnp.asarray(qx), jnp.asarray(qm))
    labels = np.asarray(r.labels)
    assert (labels[:, :-4] == want[:, :-4]).mean() > 0.97
    np.testing.assert_allclose(np.asarray(r.probs)[:, -4:], 0.5)
    assert np.asarray(r.probs_new)[:, :-4].mean() > 0.9
    assert (np.asarray(r.var) == 0).all()
