"""SVGP numerics parity: gapro_tpu/gp/variational.py vs the independent
plain-torch oracle tools/baseline_gp_torch.py:fit_gp_torch.

Both implement the reference's gpytorch configuration from scratch
(gapro/gaussian_process_utils.py:11-25 GPClassificationModel + :382-445
fit_gp_spp): whitened SVGP, inducing = all train points (learned),
ConstantMean + Scale*RBF (scalar lengthscale), probit Bernoulli with
20-node Gauss-Hermite ELBO (VariationalELBO: both terms / num_data),
50 x Adam(0.1).  The labeler parity tests deliberately inject a fake
posterior to isolate *resolution* logic; THIS file checks the actual
solver numerics against an implementation that shares no code with it
(different AD, different linalg stack, different optimizer code).

The GP posterior mu/var feed the KL training loss downstream
(criterion.py kl_loss; ref gaussian_process_utils.py:382-445 ->
ISBNet criterion.py:440-463), so solver drift propagates into training.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from gapro_tpu.gp.variational import fit_gp  # noqa: E402


def _problem(seed, n1=40, n2=50, q=30, d=6, aniso=False, sep=1.2):
    """Two labeled clusters + query points between them (a box-pair fit).

    `aniso` stretches one axis 8x — the elongated wall/shelf geometry the
    RBF finds hardest (VERDICT r2 weak #3).
    """
    rng = np.random.default_rng(seed)
    c1 = rng.normal(size=d).astype(np.float32)
    c2 = c1 + (sep * rng.normal(size=d) / np.sqrt(d)).astype(np.float32)
    scale = np.ones(d, np.float32)
    if aniso:
        scale[0] = 8.0
    x1 = c1 + rng.normal(size=(n1, d)).astype(np.float32) * 0.3 * scale
    x2 = c2 + rng.normal(size=(n2, d)).astype(np.float32) * 0.3 * scale
    tx = np.concatenate([x1, x2]).astype(np.float32)
    ty = np.concatenate([-np.ones(n1), np.ones(n2)]).astype(np.float32)
    qx = (0.5 * (c1 + c2)
          + rng.normal(size=(q, d)).astype(np.float32) * 0.4 * scale)
    return tx, ty, qx.astype(np.float32)


def _fit_jax(tx, ty, qx, n_inducing=None):
    t, q = len(tx), len(qx)
    res = fit_gp(
        jnp.asarray(tx), jnp.asarray(ty), jnp.ones((t,), bool),
        jnp.asarray(qx), jnp.ones((q,), bool), n_inducing=n_inducing,
    )
    return (np.asarray(res.probs), np.asarray(res.mu), np.asarray(res.var),
            np.asarray(res.labels))


def _fit_torch(tx, ty, qx):
    from tools.baseline_gp_torch import fit_gp_torch

    torch.manual_seed(0)
    return fit_gp_torch(
        torch.from_numpy(tx), torch.from_numpy(ty), torch.from_numpy(qx)
    )


CASES = [
    dict(seed=0),
    dict(seed=1, n1=12, n2=90, sep=0.8),     # imbalanced, heavy overlap
    dict(seed=2, aniso=True),                # elongated (wall-like)
    dict(seed=3, n1=80, n2=80, sep=2.5),     # well separated
    dict(seed=4, aniso=True, n1=25, n2=120, sep=0.6),  # hard: aniso+overlap
    dict(seed=5, n1=5, n2=7, q=4),           # tiny problem
]


@pytest.mark.parametrize("case", CASES, ids=[f"case{c['seed']}" for c in CASES])
def test_svgp_matches_torch_oracle(case):
    tx, ty, qx = _problem(**case)
    probs_t, mu_t, var_t = _fit_torch(tx, ty, qx)
    probs_j, mu_j, var_j, _ = _fit_jax(tx, ty, qx)

    # Tolerance calibration: 50 Adam(0.1) steps in fp32 amplify rounding —
    # the ORACLE vs ITSELF in fp64 drifts up to |dmu| 0.025, |dp| 0.006 on
    # the heavy-overlap case (measured), so two independent fp32
    # implementations cannot be expected closer than that floor.  Easy
    # cases pass at a few 1e-3.
    np.testing.assert_allclose(mu_j, mu_t, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(var_j, var_t, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(probs_j, probs_t, atol=0.015)


def test_svgp_padding_invariance_vs_oracle():
    """A padded (masked) problem must match the oracle on the real rows."""
    tx, ty, qx = _problem(seed=7, n1=20, n2=30, q=10)
    probs_t, mu_t, var_t = _fit_torch(tx, ty, qx)

    pad_t, pad_q = 14, 6
    txp = np.concatenate([tx, np.full((pad_t, tx.shape[1]), 99.0, np.float32)])
    typ = np.concatenate([ty, np.zeros(pad_t, np.float32)])
    qxp = np.concatenate([qx, np.full((pad_q, qx.shape[1]), -99.0, np.float32)])
    res = fit_gp(
        jnp.asarray(txp), jnp.asarray(typ),
        jnp.asarray(np.arange(len(txp)) < len(tx)),
        jnp.asarray(qxp), jnp.asarray(np.arange(len(qxp)) < len(qx)),
    )
    np.testing.assert_allclose(np.asarray(res.mu)[: len(qx)], mu_t,
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(res.probs)[: len(qx)], probs_t,
                               atol=2e-3)


@pytest.mark.slow
def test_inducing_cap_drift_quantified():
    """Battery 2 (VERDICT r2 #3): measure the M=128 inducing-cap
    approximation's mu/var drift vs the exact all-train fit on problems
    that exceed the cap, including anisotropic geometry.

    The cap is a documented approximation (labeler/pipeline.py M=128);
    this pins its cost: labels must agree on confident points and the
    drift printed here is recorded in docs/PERF.md.
    """
    drifts_mu, drifts_var, label_flips = [], [], []
    for seed in range(4):
        aniso = seed % 2 == 1
        tx, ty, qx = _problem(seed=10 + seed, n1=96, n2=110, q=40,
                              aniso=aniso)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(tx))  # callers shuffle before capping
        tx, ty = tx[perm], ty[perm]
        p_full, mu_full, var_full, lab_full = _fit_jax(tx, ty, qx)
        p_cap, mu_cap, var_cap, lab_cap = _fit_jax(tx, ty, qx, n_inducing=128)
        drifts_mu.append(np.max(np.abs(mu_cap - mu_full)))
        drifts_var.append(np.max(np.abs(var_cap - var_full)))
        confident = np.abs(p_full - 0.5) > 0.1
        flips = np.mean(lab_cap[confident] != lab_full[confident]) \
            if confident.any() else 0.0
        label_flips.append(flips)

    print(f"\nM=128 cap drift over {len(drifts_mu)} problems (T=206): "
          f"max|dmu| {max(drifts_mu):.4f}, max|dvar| {max(drifts_var):.4f}, "
          f"confident-label flip rate {max(label_flips):.4f}")
    # the cap is an approximation: bound it, don't pretend it's exact
    assert max(label_flips) <= 0.05
    assert max(drifts_mu) < 2.0
