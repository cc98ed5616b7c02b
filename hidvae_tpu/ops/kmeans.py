"""Fully-jittable batched Lloyd's k-means for codebook initialization.

Parity: reference init/kmeans.py (random-choice centroid init, squared-L2
assignment, empty-cluster reseeding from random points, run-to-convergence with
threshold 1e-10). TPU redesign: fixed iteration cap with a `lax.while_loop`
(convergence checked on-device), assignment via one [B, K] distance matmul, and
centroid update via a segment-sum matmul (one-hot^T @ x) instead of the
reference's per-cluster Python loop (init/kmeans.py:52-58) — the whole init runs
as a single XLA program on up to 20k items (train_hidvae.py:692-694).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidvae_tpu.ops.distances import l2_distance


class KmeansOutput(NamedTuple):
    centroids: jax.Array   # [K, D]
    assignment: jax.Array  # [B]


def kmeans(
    rng,
    x,
    k: int,
    max_iters: int = 100,
    stop_threshold: float = 1e-10,
) -> KmeansOutput:
    """Run Lloyd's algorithm on x: [B, D] -> KmeansOutput.

    Empty clusters are re-seeded from uniformly random data points each
    iteration (ref init/kmeans.py:52-58).
    """
    b = x.shape[0]
    init_rng, loop_rng = jax.random.split(rng)
    init_idx = jax.random.choice(init_rng, b, shape=(k,), replace=False)
    centroids0 = x[init_idx]

    def assign(centroids):
        dist = l2_distance(x, centroids)               # [B, K]
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)

    def update(carry):
        centroids, _, it, _ = carry
        assignment = assign(centroids)
        one_hot = jax.nn.one_hot(assignment, k, dtype=x.dtype)       # [B, K]
        counts = jnp.sum(one_hot, axis=0)                            # [K]
        sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)  # [K, D]
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # Reseed empty clusters from random points.
        it_rng = jax.random.fold_in(loop_rng, it)
        reseed_idx = jax.random.randint(it_rng, (k,), 0, b)
        reseed = x[reseed_idx]
        new_centroids = jnp.where((counts > 0)[:, None], means, reseed)
        shift = jnp.max(jnp.linalg.norm(new_centroids - centroids, axis=-1))
        return new_centroids, assignment, it + 1, shift

    def cond(carry):
        _, _, it, shift = carry
        return jnp.logical_and(it < max_iters, shift >= stop_threshold)

    carry0 = (centroids0, jnp.zeros((b,), jnp.int32), jnp.int32(0), jnp.float32(jnp.inf))
    centroids, _, _, _ = jax.lax.while_loop(cond, update, carry0)
    return KmeansOutput(centroids=centroids, assignment=assign(centroids))
