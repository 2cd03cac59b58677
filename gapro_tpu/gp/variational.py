"""Batched whitened variational GP binary classification, pure JAX.

TPU-native replacement for the reference's gpytorch pipeline
(gapro/gaussian_process_utils.py:11-25 `GPClassificationModel`,
:382-445 `fit_gp_spp`): a variational GP with

  * ScaleKernel(RBFKernel) covariance + ConstantMean (softplus-raw params,
    initialized like gpytorch: softplus(0) ~ 0.693 scales, constant 0),
  * CholeskyVariationalDistribution (mean 0, Cholesky = I at init),
  * whitened VariationalStrategy with learned inducing locations
    (initialized at the train inputs) and 1e-4 Cholesky jitter,
  * Bernoulli (probit) likelihood with Gauss-Hermite quadrature for the
    expected log-likelihood,
  * 50 Adam(lr=0.1) steps on -ELBO.

Where the reference fits one GP at a time in a serial Python loop
(gapro/gen_ps_utils.py:390-448), everything here is shape-static and masked,
so whole batches of box-pair problems run as one `vmap` on the MXU — the
core throughput win of the rebuild.

Math (whitened strategy):
  L = chol(K_zz + jitter I)
  interp A = L^{-1} K_zx                                 [M, N]
  q(f(x)) mean  = mu(x) + A^T m
  q(f(x)) var   = k(x,x) + diag(A^T (S - I) A),  S = L_s L_s^T
  KL(q(u)||p(u)) = 0.5 (tr S + m^T m - M - log det S)
  ELBO = mean_i E_{q(f_i)}[log Phi(y_i f_i)] - KL / N_valid,  y in {-1, +1}
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.scipy.linalg import solve_triangular  # noqa: F401 (fallback path)
from jax.scipy.stats import norm

from .linalg import cholesky_mm, tri_inv_mm

_JITTER = 1e-4
_GH_POINTS = 20
_GH_X, _GH_W = np.polynomial.hermite.hermgauss(_GH_POINTS)


class GPParams(NamedTuple):
    inducing: jax.Array  # [M, D] learned inducing locations
    var_mean: jax.Array  # [M] whitened variational mean
    var_chol: jax.Array  # [M, M] whitened variational Cholesky (lower)
    raw_lengthscale: jax.Array  # scalar, softplus
    raw_outputscale: jax.Array  # scalar, softplus
    mean_const: jax.Array  # scalar constant mean


class GPFitResult(NamedTuple):
    probs: jax.Array  # [Q] marginal p(y=+1)
    probs_new: jax.Array  # [Q] confidence max(p, 1-p)
    labels: jax.Array  # [Q] bool, probs >= 0.5
    mu: jax.Array  # [Q] latent posterior mean
    var: jax.Array  # [Q] latent posterior variance
    elbo: jax.Array  # scalar final ELBO (diagnostics)


def _softplus(x):
    return jax.nn.softplus(x)


def rbf_scaled(x1, x2, lengthscale, outputscale):
    """outputscale * exp(-0.5 ||(x1-x2)/lengthscale||^2).

    Uses the direct pairwise-difference form: the |a|^2+|b|^2-2ab expansion
    loses the zero diagonal to matmul rounding (default TPU matmul precision
    is bf16-class), which makes the Gram matrix non-PSD and the Cholesky NaN.
    Problem sizes here are <= a few hundred, so O(N^2 D) differences are cheap.
    """
    x1s = x1 / lengthscale
    x2s = x2 / lengthscale
    diff = x1s[:, None, :] - x2s[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return outputscale * jnp.exp(-0.5 * d2)


def init_params(train_x: jax.Array) -> GPParams:
    m = train_x.shape[0]
    return GPParams(
        inducing=train_x,
        var_mean=jnp.zeros((m,), jnp.float32),
        var_chol=jnp.eye(m, dtype=jnp.float32),
        raw_lengthscale=jnp.zeros((), jnp.float32),
        raw_outputscale=jnp.zeros((), jnp.float32),
        mean_const=jnp.zeros((), jnp.float32),
    )


def _masked_params(params: GPParams, z_mask):
    """Pin padded inducing dims to the whitened prior N(0, I).

    Padded rows/cols then contribute exactly 0 to KL and predictions, so a
    padded problem is bit-equivalent to its unpadded version.
    """
    m = params.var_mean.shape[0]
    eye = jnp.eye(m, dtype=params.var_chol.dtype)
    mask2 = z_mask[:, None] & z_mask[None, :]
    var_mean = jnp.where(z_mask, params.var_mean, 0.0)
    var_chol = jnp.where(mask2, jnp.tril(params.var_chol), eye)
    return params._replace(var_mean=var_mean, var_chol=var_chol)


def _predict_latent(params: GPParams, z_mask, x, x_mask):
    """q(f(x)) mean/variance under the whitened strategy. Masked."""
    p = _masked_params(params, z_mask)
    ls = _softplus(p.raw_lengthscale)
    os_ = _softplus(p.raw_outputscale)
    m = p.inducing.shape[0]
    eye = jnp.eye(m, dtype=jnp.float32)
    mask2 = z_mask[:, None] & z_mask[None, :]

    k_zz = rbf_scaled(p.inducing, p.inducing, ls, os_)
    k_zz = jnp.where(mask2, k_zz, eye)
    # cholesky_mm = stock forward + matmul-only VJP (gp/linalg.py): the
    # stock VJP's two sequential triangular solves per backward dominated
    # what was left of the fit step after the interp solve was removed
    chol = cholesky_mm(k_zz + _JITTER * eye)

    k_zx = rbf_scaled(p.inducing, x, ls, os_)
    k_zx = jnp.where(z_mask[:, None] & x_mask[None, :], k_zx, 0.0)
    hi = jax.lax.Precision.HIGHEST
    # interp = L^{-1} K_zx via the explicit block-doubling inverse
    # (gp/linalg.py): XLA's sequential solve_triangular dominated the fit
    # step on TPU and its cost is rhs-width-independent (pure latency);
    # the inverse is ~1e-7-exact at these jittered-RBF sizes and its VJP
    # is matmuls instead of more solves
    interp = jnp.matmul(tri_inv_mm(chol), k_zx, precision=hi)  # [M, Q]
    mean = p.mean_const + jnp.matmul(interp.T, p.var_mean, precision=hi)
    s = jnp.matmul(p.var_chol, p.var_chol.T, precision=hi)
    middle = s - eye
    var_diag = os_ + jnp.einsum("mq,mn,nq->q", interp, middle, interp, precision=hi)
    var_diag = jnp.maximum(var_diag, 1e-10)
    mean = jnp.where(x_mask, mean, 0.0)
    var_diag = jnp.where(x_mask, var_diag, 1.0)
    return mean, var_diag


def _kl(params: GPParams, z_mask):
    p = _masked_params(params, z_mask)
    lchol = jnp.tril(p.var_chol)
    s_diag = jnp.sum(lchol * lchol, axis=1)
    trace = jnp.sum(jnp.where(z_mask, s_diag, 1.0))
    quad = jnp.sum(p.var_mean * p.var_mean)
    diag = jnp.abs(jnp.diagonal(lchol))
    logdet = 2.0 * jnp.sum(jnp.where(z_mask, jnp.log(jnp.maximum(diag, 1e-20)), 0.0))
    mdim = jnp.sum(z_mask.astype(jnp.float32))
    return 0.5 * (trace + quad - mdim - logdet)


def _expected_log_probit(mean, var, y):
    """E_{f~N(mean,var)}[log Phi(y f)] via Gauss-Hermite quadrature.

    y in {-1, +1}. Same quadrature scheme gpytorch uses for non-conjugate
    likelihoods (20 nodes).
    """
    gx = jnp.asarray(_GH_X, jnp.float32)
    gw = jnp.asarray(_GH_W, jnp.float32)
    std = jnp.sqrt(var)
    f = mean[..., None] + jnp.sqrt(2.0) * std[..., None] * gx  # [N, GH]
    ll = norm.logcdf(y[..., None] * f)
    return (ll @ gw) / jnp.sqrt(jnp.pi)


def elbo(params: GPParams, z_mask, train_x, train_y, train_mask):
    mean, var = _predict_latent(params, z_mask, train_x, train_mask)
    ell = _expected_log_probit(mean, var, train_y)
    ell = jnp.where(train_mask, ell, 0.0)
    n = jnp.maximum(jnp.sum(train_mask.astype(jnp.float32)), 1.0)
    return jnp.sum(ell) / n - _kl(params, z_mask) / n


def fit_gp(
    train_x,
    train_y,
    train_mask,
    test_x,
    test_mask,
    iters: int = 50,
    lr: float = 0.1,
    n_inducing: int | None = None,
) -> GPFitResult:
    """Fit one masked variational GP and evaluate the posterior on test_x.

    Mirrors gapro/gaussian_process_utils.py:382-445 (`fit_gp_spp`): returns
    marginal probs p(y=+1), confidences max(p, 1-p), labels, and the latent
    posterior mean/variance used downstream by the KL training loss.

    `n_inducing` caps the inducing set at the first M train rows (callers
    shuffle rows so this is a random subset). The reference uses inducing ==
    all train points; the cap is the sparse-SVGP approximation — the
    Cholesky is O(M^3) while the ELBO still sums over every train point.

    Shapes: train_x [T, D], train_y [T] in {-1,+1}, test_x [Q, D]; masks bool.
    """
    train_x = train_x.astype(jnp.float32)
    test_x = test_x.astype(jnp.float32)
    train_y = train_y.astype(jnp.float32)
    m = train_x.shape[0] if n_inducing is None else min(n_inducing, train_x.shape[0])
    params = init_params(train_x[:m])
    z_mask0 = train_mask[:m]
    grad_fn = jax.grad(lambda p: -elbo(p, z_mask0, train_x, train_y, train_mask))

    # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8), lr as reference.
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def step(carry, _):
        p, s = carry
        g = grad_fn(p)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=iters)

    mu, var = _predict_latent(params, z_mask0, test_x, test_mask)
    probs = norm.cdf(mu / jnp.sqrt(1.0 + var))
    labels = probs >= 0.5
    probs_new = jnp.where(labels, probs, 1.0 - probs)
    final_elbo = elbo(params, z_mask0, train_x, train_y, train_mask)
    return GPFitResult(
        probs=probs, probs_new=probs_new, labels=labels, mu=mu, var=var, elbo=final_elbo
    )


# Batched over independent box-pair problems: the TPU throughput showcase.
fit_gp_batch = jax.vmap(fit_gp, in_axes=(0, 0, 0, 0, 0, None, None, None))


def fit_gp_batch_jit(iters: int = 50, lr: float = 0.1, n_inducing=None):
    """jit-compiled batched fit with static iteration count."""
    return jax.jit(
        lambda tx, ty, tm, qx, qm: fit_gp_batch(tx, ty, tm, qx, qm, iters, lr, n_inducing)
    )
