"""TPU-native full-covariance Gaussian-mixture fit (EM) and sampling.

Device-side counterpart of the reference's host sklearn fit
(``src/multivae/samplers/gaussian_mixture/gaussian_mixture_sampler.py:89-96``:
``mixture.GaussianMixture(n_components, covariance_type='full',
max_iter=2000, tol=1e-3)``). Same algorithm — k-means initial
responsibilities, EM to a mean-log-likelihood tolerance, ``reg_covar``
jitter on covariance diagonals — but expressed as one XLA program:

- the E-step is a batched Cholesky + triangular solve over the
  ``(K, D, D)`` covariance stack (``vmap`` over components; the
  ``N x D x D`` work lands on the MXU as batched matmuls);
- the M-step is two einsums (weighted means / scatter matrices);
- the outer loop is a ``lax.while_loop`` on the lower-bound delta, so
  the whole fit — k-means seeding included — compiles once and runs
  without host round trips (one scalar fetch at the end).

Everything is float32: the lower-bound convergence test uses an
absolute tolerance on the MEAN per-sample log-likelihood (sklearn's
semantics), well inside f32 resolution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class GMMParams(NamedTuple):
    """Fitted mixture: ``weights (K,)``, ``means (K, D)``,
    ``covariances (K, D, D)`` and their Cholesky factors ``chol``
    (lower), kept so sampling and scoring skip the refactorization."""

    weights: jnp.ndarray
    means: jnp.ndarray
    covariances: jnp.ndarray
    chol: jnp.ndarray
    lower_bound: jnp.ndarray
    n_iter: jnp.ndarray


def _log_gaussian_prob(X, means, chol):
    """``(N, K)`` log N(x | mu_k, Sigma_k) from Cholesky factors.

    One triangular solve per component over the whole batch
    (``cho_solve``-free: only the forward substitution is needed for
    the quadratic form).
    """
    d = X.shape[-1]

    def per_comp(mu, L):
        diff = (X - mu).astype(jnp.float32)
        y = jax.scipy.linalg.solve_triangular(L, diff.T, lower=True)
        quad = jnp.sum(y * y, axis=0, dtype=jnp.float32)
        logdet = jnp.sum(jnp.log(jnp.diagonal(L)), dtype=jnp.float32)
        return -0.5 * (d * jnp.log(2.0 * jnp.pi) + quad) - logdet

    return jax.vmap(per_comp, in_axes=(0, 0), out_axes=1)(means, chol)


def _m_step(X, log_resp, reg_covar):
    """Means / covariances / weights from responsibilities (f32
    accumulation on every N-reduction)."""
    n, d = X.shape
    resp = jnp.exp(log_resp).astype(jnp.float32)
    nk = jnp.sum(resp, axis=0, dtype=jnp.float32) + 10 * jnp.finfo(
        jnp.float32).eps
    means = jnp.einsum("nk,nd->kd", resp, X,
                       preferred_element_type=jnp.float32) / nk[:, None]
    # Scatter matrices: sum_n r_nk (x_n - mu_k)(x_n - mu_k)^T developed
    # as E[xx^T] - mu mu^T would lose precision; keep the centered
    # einsum (K small — the (K, N, D) intermediate is fused by XLA).
    diff = X[None, :, :] - means[:, None, :]
    covs = jnp.einsum("nk,knd,kne->kde", resp, diff, diff,
                      preferred_element_type=jnp.float32) / nk[:, None, None]
    covs = covs + reg_covar * jnp.eye(d, dtype=jnp.float32)
    weights = nk / n
    return weights, means, covs


def _kmeans_pp_init(X, k, rng):
    """k-means++ seeding (distance-weighted sequential center draws)."""
    n = X.shape[0]
    x2 = jnp.sum(X * X, axis=1, dtype=jnp.float32)

    def sq_dist_to(c):
        return jnp.maximum(
            x2 - 2.0 * (X @ c) + jnp.dot(c, c), 0.0)

    rng, sub = jax.random.split(rng)
    first = X[jax.random.randint(sub, (), 0, n)]
    centers = jnp.zeros((k, X.shape[1]), jnp.float32).at[0].set(first)
    min_d = sq_dist_to(first)

    def body(i, carry):
        centers, min_d, rng = carry
        rng, sub = jax.random.split(rng)
        # Distance-weighted categorical; guards the all-zero case
        # (duplicate points) with a uniform fallback.
        tot = jnp.sum(min_d, dtype=jnp.float32)
        logits = jnp.where(tot > 0, jnp.log(min_d + 1e-30),
                           jnp.zeros_like(min_d))
        idx = jax.random.categorical(sub, logits)
        c = X[idx]
        centers = centers.at[i].set(c)
        min_d = jnp.minimum(min_d, sq_dist_to(c))
        return centers, min_d, rng

    centers, _, _ = lax.fori_loop(1, k, body, (centers, min_d, rng))
    return centers


def _kmeans(X, k, rng, n_iters=50):
    """Lloyd iterations from a k-means++ seed; returns hard labels."""
    centers = _kmeans_pp_init(X, k, rng)
    x2 = jnp.sum(X * X, axis=1, dtype=jnp.float32)

    def assign(centers):
        c2 = jnp.sum(centers * centers, axis=1, dtype=jnp.float32)
        d = x2[:, None] - 2.0 * (X @ centers.T) + c2[None, :]
        return jnp.argmin(d, axis=1)

    def body(_, centers):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=0, dtype=jnp.float32)
        sums = jnp.einsum("nk,nd->kd", onehot, X,
                          preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous center.
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = lax.fori_loop(0, n_iters, body, centers)
    return assign(centers)


def fit_gmm(X, n_components: int, rng, max_iter: int = 2000,
            tol: float = 1e-3, reg_covar: float = 1e-6) -> GMMParams:
    """Fit a full-covariance GMM to ``X (N, D)`` — one compiled program.

    Matches sklearn's ``GaussianMixture`` procedure (kmeans-seeded
    responsibilities, EM until the mean log-likelihood moves < ``tol``)
    without bit-matching its RNG; quality parity is pinned by
    ``tests/test_samplers.py`` against the sklearn fit.
    """
    return _fit_gmm_jit(X, n_components, rng, max_iter, tol, reg_covar)


@partial(jax.jit, static_argnames=("n_components", "max_iter"))
def _fit_gmm_jit(X, n_components, rng, max_iter, tol, reg_covar):
    X = jnp.asarray(X, jnp.float32)
    k = n_components
    labels = _kmeans(X, k, rng)
    log_resp = jnp.log(jax.nn.one_hot(labels, k, dtype=jnp.float32) + 1e-37)

    def e_step(weights, means, covs):
        chol = jnp.linalg.cholesky(covs)
        log_prob = _log_gaussian_prob(X, means, chol)
        weighted = log_prob + jnp.log(weights)[None, :]
        norm = jax.scipy.special.logsumexp(weighted, axis=1, keepdims=True)
        return weighted - norm, jnp.mean(norm, dtype=jnp.float32), chol

    def cond(carry):
        _, _, _, _, lb, prev_lb, it = carry
        return jnp.logical_and(it < max_iter,
                               jnp.abs(lb - prev_lb) >= tol)

    def body(carry):
        log_resp, _, _, _, lb, _, it = carry
        weights, means, covs = _m_step(X, log_resp, reg_covar)
        log_resp, new_lb, chol = e_step(weights, means, covs)
        return (log_resp, weights, means, covs, new_lb, lb, it + 1)

    weights, means, covs = _m_step(X, log_resp, reg_covar)
    log_resp, lb, chol = e_step(weights, means, covs)
    init = (log_resp, weights, means, covs, lb,
            lb - 2 * tol - 1.0, jnp.int32(1))
    log_resp, weights, means, covs, lb, _, it = lax.while_loop(
        cond, body, init)
    return GMMParams(weights=weights, means=means, covariances=covs,
                     chol=jnp.linalg.cholesky(covs), lower_bound=lb,
                     n_iter=it)


def sample_gmm(params: GMMParams, rng, n_samples: int):
    """Draw ``(n_samples, D)`` from the fitted mixture on device."""
    return _sample_gmm_jit(params, rng, n_samples)


@partial(jax.jit, static_argnames=("n_samples",))
def _sample_gmm_jit(params, rng, n_samples):
    rng_c, rng_e = jax.random.split(rng)
    comps = jax.random.categorical(
        rng_c, jnp.log(params.weights), shape=(n_samples,))
    eps = jax.random.normal(
        rng_e, (n_samples, params.means.shape[1]), jnp.float32)
    mu = params.means[comps]
    L = params.chol[comps]
    return mu + jnp.einsum("nde,ne->nd", L, eps,
                           preferred_element_type=jnp.float32)


def score_samples(params: GMMParams, X):
    """Per-sample log-likelihood under the mixture (sklearn
    ``score_samples`` counterpart, used by tests)."""
    log_prob = _log_gaussian_prob(jnp.asarray(X, jnp.float32),
                                  params.means, params.chol)
    return jax.scipy.special.logsumexp(
        log_prob + jnp.log(params.weights)[None, :], axis=1)
