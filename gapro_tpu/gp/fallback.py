"""Non-GP classifier fallbacks for the labeler (batched, pure JAX).

The reference ships two alternatives to the variational GP
(gapro/gaussian_process_utils.py): `fit_regression_model` (:254-379), a
small torch classifier trained on the same b1-vs-b2 binary task, and the
`fit_gp_ensemble` preprocessing (:119-251) that subsamples each box's
points to the `npoint_nearest` closest to the intersection centroid.

Estimator fidelity note: `fit_regression_model` instantiates
`RegressionModel()` — a single `nn.Linear(32, 1)` trained with
BCEWithLogitsLoss + AdamW(0.1) (:332-340) — i.e. LOGISTIC REGRESSION.
The `SimpleModel` 2-hidden-layer MLP defined alongside (:254-278) is
dead code: nothing in the reference constructs it. `fit_logreg_batch`
is therefore the faithful estimator, trained full-batch with AdamW
matching the reference's optimizer (the reference shuffles minibatches
of 256 and early-stops at mean loss < 1e-3; at the <=512-row problems
this path sees, full-batch for the full budget is the same task — and
the gen path never calls this fallback at all, gen_ps_utils.py:390-448
always fits the GP).

Here both are batched to match `fit_gp_batch`'s (tx, ty, tm, qx, qm) API so
the labeler can swap solvers without touching the pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FallbackResult(NamedTuple):
    probs: jax.Array
    probs_new: jax.Array
    labels: jax.Array
    mu: jax.Array  # logits (stand-in for latent mean)
    var: jax.Array  # zeros (no uncertainty from a point classifier)


@partial(jax.jit, static_argnums=(5,))
def fit_logreg_batch(tx, ty, tm, qx, qm, iters: int = 50, lr: float = 0.1):
    """Batched logistic regression on the box-pair task.

    tx [B,T,D] features; ty [B,T] in {-1,+1} (b1 = -1, b2 = +1); tm [B,T]
    valid; qx [B,Q,D]; qm [B,Q]. Returns FallbackResult with [B,Q] fields.
    """
    B, T, D = tx.shape

    def single(tx_b, ty_b, tm_b, qx_b, qm_b):
        params = dict(w=jnp.zeros((D,), jnp.float32), b=jnp.zeros((), jnp.float32))
        y01 = (ty_b > 0).astype(jnp.float32)
        # torch.optim.AdamW defaults (wd 0.01), lr as the reference :340
        opt = optax.adamw(lr, weight_decay=0.01)
        opt_state = opt.init(params)

        def loss_fn(p):
            logits = tx_b @ p["w"] + p["b"]
            ll = optax.sigmoid_binary_cross_entropy(logits, y01)
            return jnp.sum(ll * tm_b) / jnp.maximum(jnp.sum(tm_b), 1.0)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)  # adamw: decay needs params
            return (optax.apply_updates(p, updates), s), None

        (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=iters)
        logits = qx_b @ params["w"] + params["b"]
        probs = jax.nn.sigmoid(logits)
        probs = jnp.where(qm_b, probs, 0.5)
        return FallbackResult(
            probs=probs,
            probs_new=jnp.maximum(probs, 1.0 - probs),
            labels=probs >= 0.5,
            mu=jnp.where(qm_b, logits, 0.0),
            var=jnp.zeros_like(probs),
        )

    return jax.vmap(single)(tx, ty.astype(jnp.float32), tm.astype(jnp.float32), qx, qm)


def nearest_subsample(coords, member_idx, centroid, k):
    """`fit_gp_ensemble`'s npoint_nearest selection (:146-158): keep the k
    members closest to the intersection centroid. Host-side numpy."""
    import numpy as np

    if len(member_idx) <= k:
        return member_idx
    d = np.sum((np.asarray(coords)[member_idx] - np.asarray(centroid)[None]) ** 2, 1)
    return member_idx[np.argpartition(d, k)[:k]]
