"""Linear-algebra analysis methods: Mahalanobis classifier + PCA projection.

Rebuilds the reference side-quests TPU-natively:

- :func:`maha_logits` (``summer_clip/clip_searcher/maha_distance.py:17-41``):
  covariance of [cache image features; text features], inverse, and the
  quadratic form ``(x - t) Sigma^-1 (x - t)`` for every (test, class) pair.
  Implemented without the reference's (Nt, C, D) broadcast blowup: with
  ``M = Sigma^-1``, the quadratic form expands to
  ``xMx + tMt - 2 xMt`` — three matmuls.
- :class:`PCA` (``class_projector.py:14-69``): SVD-based fit on text
  features, shared projection of image features.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["maha_logits", "PCA"]


def maha_logits(test_features: jax.Array, text_features: jax.Array,
                cache_features: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Negative Mahalanobis distances as logits (Nt, C); higher = closer.

    All features row-major (N, D), L2-normalized by the caller.
    """
    x = jnp.asarray(test_features, jnp.float32)
    t = jnp.asarray(text_features, jnp.float32)
    cache = jnp.asarray(cache_features, jnp.float32)

    stacked = jnp.concatenate([cache, t], axis=0)
    n = stacked.shape[0]
    mean = stacked.mean(axis=0, keepdims=True)
    centered = stacked - mean
    # reference multiplies torch.cov by (n-1): an UNNORMALIZED scatter matrix
    cov = centered.T @ centered
    cov = cov + eps * jnp.eye(cov.shape[0])
    m = jnp.linalg.inv(cov)

    xm = x @ m
    tm = t @ m
    xmx = jnp.sum(xm * x, axis=1)            # (Nt,)
    tmt = jnp.sum(tm * t, axis=1)            # (C,)
    cross = xm @ t.T                          # (Nt, C)
    dist = xmx[:, None] + tmt[None, :] - 2.0 * cross
    return -dist


class PCA:
    """Minimal SVD PCA with the sklearn fit/transform surface."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: tp.Optional[jax.Array] = None
        self.components_: tp.Optional[jax.Array] = None

    def fit(self, x: np.ndarray) -> "PCA":
        x = jnp.asarray(np.asarray(x, np.float32))
        self.mean_ = x.mean(axis=0)
        _, _, vt = jnp.linalg.svd(x - self.mean_[None], full_matrices=False)
        self.components_ = vt[: self.n_components]
        return self

    def transform(self, x: np.ndarray) -> jax.Array:
        assert self.components_ is not None, "fit first"
        x = jnp.asarray(np.asarray(x, np.float32))
        return (x - self.mean_[None]) @ self.components_.T

    def fit_transform(self, x: np.ndarray) -> jax.Array:
        return self.fit(x).transform(x)
