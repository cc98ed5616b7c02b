"""Tests for the lexicographic prefix index vs the dense reference-equivalent."""

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.ops.prefix_search import (
    build_prefix_index,
    duplicate_ranks,
    exists_prefix,
    exists_prefix_dense,
)


def random_corpus(rng, n, d, radix):
    return jnp.array(rng.randint(0, radix, size=(n, d)), jnp.int32)


class TestExistsPrefix:
    def test_matches_dense_reference(self):
        rng = np.random.RandomState(0)
        corpus = random_corpus(rng, 500, 4, 8)
        index = build_prefix_index(corpus)
        for p in range(1, 5):
            queries = random_corpus(rng, 300, p, 8)
            fast = np.asarray(exists_prefix(index, queries))
            dense = np.asarray(exists_prefix_dense(corpus, queries))
            np.testing.assert_array_equal(fast, dense, err_msg=f"prefix len {p}")

    def test_known_prefixes(self):
        corpus = jnp.array([[1, 2, 3], [1, 2, 4], [5, 6, 7]], jnp.int32)
        index = build_prefix_index(corpus)
        assert bool(exists_prefix(index, jnp.array([[1]])))
        assert bool(exists_prefix(index, jnp.array([[1, 2]])))
        assert bool(exists_prefix(index, jnp.array([[1, 2, 4]])))
        assert not bool(exists_prefix(index, jnp.array([[1, 3]])))
        assert not bool(exists_prefix(index, jnp.array([[2]])))
        assert not bool(exists_prefix(index, jnp.array([[1, 2, 5]])))

    def test_batched_query_shapes(self):
        corpus = jnp.array([[0, 0], [1, 1]], jnp.int32)
        index = build_prefix_index(corpus)
        q = jnp.array([[[0, 0], [1, 0]], [[1, 1], [0, 1]]], jnp.int32)  # [2, 2, 2]
        out = np.asarray(exists_prefix(index, q))
        np.testing.assert_array_equal(out, [[True, False], [True, False]])

    def test_query_longer_than_corpus_truncates(self):
        # Ref h_semids.py:207 truncates the prefix to the cache width.
        corpus = jnp.array([[1, 2]], jnp.int32)
        index = build_prefix_index(corpus)
        assert bool(exists_prefix(index, jnp.array([[1, 2, 99]])))

    def test_jittable(self):
        corpus = build_prefix_index(jnp.array([[1, 2], [3, 4]], jnp.int32))
        f = jax.jit(lambda q: exists_prefix(corpus, q))
        assert bool(f(jnp.array([[3, 4]])))

    def test_single_row_corpus(self):
        index = build_prefix_index(jnp.array([[7, 8, 9]], jnp.int32))
        assert bool(exists_prefix(index, jnp.array([[7, 8]])))
        assert not bool(exists_prefix(index, jnp.array([[8]])))


class TestDuplicateRanks:
    def test_ranks_in_corpus_order(self):
        ids = jnp.array([[1, 1], [2, 2], [1, 1], [1, 1], [2, 2]], jnp.int32)
        ranks = np.asarray(duplicate_ranks(ids))
        np.testing.assert_array_equal(ranks, [0, 0, 1, 2, 1])

    def test_all_unique(self):
        ids = jnp.array([[1, 2], [3, 4], [5, 6]], jnp.int32)
        np.testing.assert_array_equal(np.asarray(duplicate_ranks(ids)), [0, 0, 0])

    def test_max_rank_counts_duplicates(self):
        rng = np.random.RandomState(0)
        ids = jnp.array(rng.randint(0, 3, size=(64, 2)), jnp.int32)
        ranks = np.asarray(duplicate_ranks(ids))
        # For each tuple, ranks within its occurrence set must be 0..c-1.
        arr = np.asarray(ids)
        seen = {}
        for i, row in enumerate(map(tuple, arr)):
            expected = seen.get(row, 0)
            assert ranks[i] == expected
            seen[row] = expected + 1
