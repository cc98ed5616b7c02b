"""Unit tests for hidvae_tpu.ops: normalization, gumbel, distances, k-means."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.ops.distances import (
    DistanceMode,
    cosine_distance,
    l2_distance,
    nearest_code,
)
from hidvae_tpu.ops.gumbel import gumbel_softmax_sample, sample_gumbel
from hidvae_tpu.ops.kmeans import kmeans
from hidvae_tpu.ops.normalize import l2norm, rms_norm


class TestNormalize:
    def test_l2norm_unit_norm(self):
        x = jax.random.normal(jax.random.key(0), (8, 16))
        y = l2norm(x)
        np.testing.assert_allclose(np.linalg.norm(y, axis=-1), 1.0, rtol=1e-5)

    def test_l2norm_zero_safe(self):
        y = l2norm(jnp.zeros((4, 8)))
        assert np.all(np.isfinite(np.asarray(y)))

    def test_l2norm_matches_manual(self):
        x = np.array([[3.0, 4.0]])
        np.testing.assert_allclose(np.asarray(l2norm(jnp.array(x))), [[0.6, 0.8]], rtol=1e-6)

    def test_rms_norm_manual(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        expected = np.asarray(x) / np.sqrt(np.mean(np.asarray(x) ** 2) + 1e-6)
        np.testing.assert_allclose(np.asarray(rms_norm(x)), expected, rtol=1e-5)

    def test_rms_norm_weight(self):
        x = jnp.ones((2, 4))
        w = 2.0 * jnp.ones((4,))
        np.testing.assert_allclose(np.asarray(rms_norm(x, w)), 2.0 * np.asarray(rms_norm(x)), rtol=1e-5)


class TestGumbel:
    def test_gumbel_mean(self):
        # Gumbel(0,1) mean is Euler-Mascheroni ~ 0.5772.
        g = sample_gumbel(jax.random.key(0), (200_000,))
        assert abs(float(jnp.mean(g)) - 0.5772) < 0.02

    def test_softmax_sample_simplex(self):
        logits = jax.random.normal(jax.random.key(1), (32, 10))
        w = gumbel_softmax_sample(jax.random.key(2), logits, temperature=0.5)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0, rtol=1e-5)
        assert np.all(np.asarray(w) >= 0)

    def test_low_temperature_approaches_argmax(self):
        logits = jnp.array([[10.0, 0.0, -10.0]])
        w = gumbel_softmax_sample(jax.random.key(3), logits, temperature=0.01)
        assert int(jnp.argmax(w)) == 0


class TestDistances:
    def test_l2_matches_naive(self):
        x = np.random.RandomState(0).randn(16, 8).astype(np.float32)
        cb = np.random.RandomState(1).randn(32, 8).astype(np.float32)
        naive = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        got = np.asarray(l2_distance(jnp.array(x), jnp.array(cb)))
        np.testing.assert_allclose(got, naive, rtol=1e-3, atol=1e-3)

    def test_cosine_matches_naive(self):
        x = np.random.RandomState(0).randn(16, 8).astype(np.float32)
        cb = np.random.RandomState(1).randn(32, 8).astype(np.float32)
        xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
        cn = cb / np.linalg.norm(cb, axis=-1, keepdims=True)
        naive = -(xn @ cn.T)
        got = np.asarray(cosine_distance(jnp.array(x), jnp.array(cb)))
        np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-5)

    def test_nearest_code_exact_match(self):
        cb = jnp.eye(4, dtype=jnp.float32)
        x = cb[jnp.array([2, 0, 3, 1])]
        ids = nearest_code(x, cb, DistanceMode.L2)
        np.testing.assert_array_equal(np.asarray(ids), [2, 0, 3, 1])


class TestKmeans:
    def test_recovers_separated_clusters(self):
        # Plain Lloyd's with random init (parity with ref init/kmeans.py) can
        # hit local optima; accept success on any of a few seeds.
        rng = np.random.RandomState(0)
        centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]], np.float32)
        x = np.concatenate([c + 0.1 * rng.randn(50, 2).astype(np.float32) for c in centers])
        want = np.sort(centers, axis=0)
        errs = []
        for seed in range(5):
            out = kmeans(jax.random.key(seed), jnp.array(x), k=3, max_iters=50)
            got = np.sort(np.asarray(out.centroids), axis=0)
            err = np.abs(got - want).max()
            errs.append(err)
            if err < 0.2:
                return
        raise AssertionError(f"kmeans failed to recover clusters on all seeds: {errs}")

    def test_assignment_is_nearest(self):
        x = jax.random.normal(jax.random.key(1), (100, 4))
        out = kmeans(jax.random.key(2), x, k=8, max_iters=30)
        dist = np.asarray(l2_distance(x, out.centroids))
        np.testing.assert_array_equal(np.asarray(out.assignment), dist.argmin(-1))

    def test_jittable(self):
        x = jax.random.normal(jax.random.key(1), (64, 4))
        f = jax.jit(lambda r, x: kmeans(r, x, k=4, max_iters=10))
        out = f(jax.random.key(0), x)
        assert out.centroids.shape == (4, 4)

    def test_k_equals_n(self):
        x = jax.random.normal(jax.random.key(1), (8, 4))
        out = kmeans(jax.random.key(0), x, k=8, max_iters=10)
        # Every point is its own centroid (up to permutation).
        got = np.sort(np.asarray(out.centroids), axis=0)
        want = np.sort(np.asarray(x), axis=0)
        np.testing.assert_allclose(got, want, atol=1e-4)
