"""Fixed-means Gaussian-mixture EM in JAX.

Rebuild of the reference's GMM analysis (``summer_clip/clip_em/fixed_em.py``
+ ``train_em.py``): fit a GMM over image features whose component means are
FIXED to the class text features — the M-step updates only mixture weights
and covariances. Instead of patching sklearn internals, the whole EM loop is
a jitted ``lax`` iteration over jnp arrays (full or diagonal covariance),
so it runs on TPU at matmul speed.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FixedMeansGMM"]


def _log_gauss_full(x: jax.Array, means: jax.Array, chol: jax.Array) -> jax.Array:
    """log N(x | mu_k, Sigma_k) for all k. x (N, D), means (K, D), chol (K, D, D)."""
    n, d = x.shape

    def per_k(mu, L):
        diff = x - mu[None]
        sol = jax.scipy.linalg.solve_triangular(L, diff.T, lower=True)  # (D, N)
        maha = jnp.sum(sol ** 2, axis=0)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (d * jnp.log(2 * jnp.pi) + logdet + maha)

    return jax.vmap(per_k)(means, chol).T  # (N, K)


def _log_gauss_diag(x: jax.Array, means: jax.Array, var: jax.Array) -> jax.Array:
    d = x.shape[1]
    diff2 = (x[:, None, :] - means[None]) ** 2
    maha = jnp.sum(diff2 / var[None], axis=-1)
    logdet = jnp.sum(jnp.log(var), axis=-1)
    return -0.5 * (d * jnp.log(2 * jnp.pi) + logdet[None] + maha)


class FixedMeansGMM:
    """EM with component means pinned to provided vectors.

    ``covariance_type``: 'full' (reference default) or 'diag' (cheaper at
    CLIP dims). ``fit`` runs ``max_iter`` jitted EM steps; ``predict_proba``
    returns responsibilities, ``predict_log_proba`` the joint log-densities
    (used as logits like the reference's ``predict_proba``).
    """

    def __init__(self, means_init: np.ndarray, covariance_type: str = "full",
                 reg_covar: float = 1e-6, max_iter: int = 100, tol: float = 1e-3,
                 n_components: tp.Optional[int] = None):
        self.means = jnp.asarray(np.asarray(means_init, np.float32))
        if n_components is not None:
            assert n_components == self.means.shape[0], "n_components must match means_init"
        self.k, self.d = self.means.shape
        self.covariance_type = covariance_type
        self.reg_covar = reg_covar
        self.max_iter = max_iter
        self.tol = tol
        self.weights_: tp.Optional[jax.Array] = None
        self.covariances_: tp.Optional[jax.Array] = None
        self.lower_bound_: float = -np.inf

    # -- internals ---------------------------------------------------------------
    def _e_step(self, x, weights, cov):
        if self.covariance_type == "full":
            chol = jax.vmap(jnp.linalg.cholesky)(cov)
            logp = _log_gauss_full(x, self.means, chol)
        else:
            logp = _log_gauss_diag(x, self.means, cov)
        weighted = logp + jnp.log(weights)[None]
        norm = jax.scipy.special.logsumexp(weighted, axis=1, keepdims=True)
        return weighted - norm, jnp.mean(norm)

    def _m_step(self, x, log_resp):
        resp = jnp.exp(log_resp)
        nk = resp.sum(axis=0) + 10 * jnp.finfo(resp.dtype).eps
        weights = nk / jnp.sum(nk)
        diff = x[:, None, :] - self.means[None]  # (N, K, D)
        if self.covariance_type == "full":
            cov = jnp.einsum("nk,nkd,nke->kde", resp, diff, diff) / nk[:, None, None]
            cov = cov + self.reg_covar * jnp.eye(self.d)[None]
        else:
            cov = jnp.einsum("nk,nkd->kd", resp, diff ** 2) / nk[:, None] + self.reg_covar
        return weights, cov

    # -- public API -----------------------------------------------------------------
    def fit(self, x: np.ndarray) -> "FixedMeansGMM":
        x = jnp.asarray(np.asarray(x, np.float32))
        weights = jnp.full((self.k,), 1.0 / self.k)
        if self.covariance_type == "full":
            cov = jnp.broadcast_to(jnp.eye(self.d)[None], (self.k, self.d, self.d))
        else:
            cov = jnp.ones((self.k, self.d))

        # x rides as a jit ARG: a closure-captured data matrix embeds as an
        # MLIR constant (200MB at 50k x 1024) and inflates the remote
        # compile payload (tools/attr_grid_variants.py).
        @jax.jit
        def em_step(x, weights, cov):
            log_resp, lb = self._e_step(x, weights, cov)
            weights, cov = self._m_step(x, log_resp)
            return weights, cov, lb

        prev = -jnp.inf
        for _ in range(self.max_iter):
            weights, cov, lb = em_step(x, weights, cov)
            if bool(jnp.abs(lb - prev) < self.tol):
                prev = lb
                break
            prev = lb
        self.weights_, self.covariances_, self.lower_bound_ = weights, cov, float(prev)
        return self

    def score_samples_per_component(self, x: np.ndarray) -> jax.Array:
        assert self.weights_ is not None, "fit first"
        x = jnp.asarray(np.asarray(x, np.float32))
        if self.covariance_type == "full":
            chol = jax.vmap(jnp.linalg.cholesky)(self.covariances_)
            logp = _log_gauss_full(x, self.means, chol)
        else:
            logp = _log_gauss_diag(x, self.means, self.covariances_)
        return logp + jnp.log(self.weights_)[None]

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        joint = self.score_samples_per_component(x)
        return np.asarray(jax.nn.softmax(joint, axis=1))

    def predict_log_proba(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.score_samples_per_component(x))
