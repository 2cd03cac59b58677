"""Auction LSAP vs scipy exact solutions."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from gapro_tpu.losses.matcher import _INVALID_COST, lsap_auction


def _total(cost, assign):
    s = 0.0
    for j, i in enumerate(assign):
        if i >= 0:
            s += cost[i, j]
    return s


def test_auction_matches_scipy_cost():
    rng = np.random.default_rng(0)
    for trial in range(6):
        q, i = 64, 24
        cost = rng.uniform(0, 3, (q, i)).astype(np.float32)
        got = np.asarray(lsap_auction(jnp.asarray(cost[None])))[0]
        rows, cols = linear_sum_assignment(cost)
        want = np.full(i, -1)
        want[cols] = rows
        assert len(np.unique(got[got >= 0])) == (got >= 0).sum()  # one-to-one
        assert (got >= 0).all()
        # auction is eps-optimal: totals must agree within I * eps
        eps_tol = 3.0 / 64.0 / (i + 1) * i + 1e-4
        assert _total(cost, got) <= _total(cost, want) + eps_tol


def test_auction_with_padding_columns():
    rng = np.random.default_rng(1)
    q, i_real, i = 16, 5, 32  # more columns than rows, most infeasible
    cost = np.full((q, i), _INVALID_COST, np.float32)
    cost[:, :i_real] = rng.uniform(0, 1, (q, i_real))
    got = np.asarray(lsap_auction(jnp.asarray(cost[None])))[0]
    assert (got[:i_real] >= 0).all()
    assert (got[i_real:] == -1).all()
    rows, cols = linear_sum_assignment(cost[:, :i_real])
    want = np.full(i_real, -1)
    want[cols] = rows
    assert abs(_total(cost, got) - _total(cost[:, :i_real], want)) < 0.05
