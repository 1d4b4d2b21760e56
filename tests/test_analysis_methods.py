"""Unit tests for the analysis methods: fixed-means EM, Mahalanobis, PCA."""

import jax.numpy as jnp
import numpy as np
import pytest

from summer_clip_tpu.methods.em import FixedMeansGMM
from summer_clip_tpu.methods.linalg import PCA, maha_logits


def _mixture(seed=0, n_per=200, d=4):
    rng = np.random.RandomState(seed)
    means = np.array([[3.0] + [0.0] * (d - 1),
                      [-3.0] + [0.0] * (d - 1)], np.float32)
    x0 = rng.randn(n_per, d).astype(np.float32) * 0.5 + means[0]
    x1 = rng.randn(n_per, d).astype(np.float32) * 1.5 + means[1]
    x = np.concatenate([x0, x1])
    y = np.concatenate([np.zeros(n_per, np.int64), np.ones(n_per, np.int64)])
    return x, y, means


@pytest.mark.full
class TestFixedMeansGMM:
    def test_classifies_separated_mixture(self):
        x, y, means = _mixture()
        for cov in ("diag", "full"):
            gm = FixedMeansGMM(means_init=means, covariance_type=cov, max_iter=30)
            gm.fit(x)
            preds = gm.predict_log_proba(x).argmax(axis=1)
            assert (preds == y).mean() > 0.98, cov

    def test_means_stay_fixed_weights_update(self):
        x, y, means = _mixture(n_per=50)
        gm = FixedMeansGMM(means_init=means, covariance_type="diag", max_iter=10).fit(x)
        np.testing.assert_array_equal(np.asarray(gm.means), means)
        w = np.asarray(gm.weights_)
        assert abs(w.sum() - 1.0) < 1e-5
        # covariances reflect the differing spreads (cluster 1 is wider)
        c = np.asarray(gm.covariances_)
        assert c[1].mean() > c[0].mean()

    def test_predict_proba_normalized(self):
        x, _, means = _mixture(n_per=20)
        gm = FixedMeansGMM(means_init=means, covariance_type="diag", max_iter=5).fit(x)
        p = gm.predict_proba(x)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


class TestPCA:
    def test_matches_svd_reconstruction(self):
        rng = np.random.RandomState(0)
        # low-rank data: components must capture nearly all variance
        basis = rng.randn(3, 16).astype(np.float32)
        x = rng.randn(50, 3).astype(np.float32) @ basis
        pca = PCA(3)
        z = np.asarray(pca.fit_transform(x))
        recon = z @ np.asarray(pca.components_) + np.asarray(pca.mean_)
        np.testing.assert_allclose(recon, x, atol=1e-3)

    def test_transform_consistency(self):
        rng = np.random.RandomState(1)
        x = rng.randn(40, 8).astype(np.float32)
        pca = PCA(4)
        z1 = np.asarray(pca.fit_transform(x))
        z2 = np.asarray(pca.transform(x))
        np.testing.assert_allclose(z1, z2, atol=1e-5)


class TestMaha:
    def test_matches_dense_quadratic_form(self):
        rng = np.random.RandomState(0)
        nt, c, d, nc = 10, 4, 6, 30
        x = rng.randn(nt, d).astype(np.float32)
        t = rng.randn(c, d).astype(np.float32)
        cache = rng.randn(nc, d).astype(np.float32)

        got = np.asarray(maha_logits(x, t, cache, eps=1e-4))

        stacked = np.concatenate([cache, t])
        centered = stacked - stacked.mean(0, keepdims=True)
        cov = centered.T @ centered + 1e-4 * np.eye(d)
        m = np.linalg.inv(cov)
        expected = np.zeros((nt, c), np.float32)
        for i in range(nt):
            for j in range(c):
                diff = x[i] - t[j]
                expected[i, j] = -diff @ m @ diff
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-3)

    def test_identity_cov_reduces_to_euclidean(self):
        rng = np.random.RandomState(2)
        x = rng.randn(5, 3).astype(np.float32)
        t = rng.randn(2, 3).astype(np.float32)
        # huge eps makes Sigma ~ eps*I -> ranking equals negative euclidean
        got = np.asarray(maha_logits(x, t, x, eps=1e6))
        eucl = -((x[:, None, :] - t[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(got.argmax(1), eucl.argmax(1))
