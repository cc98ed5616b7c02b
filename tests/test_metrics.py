"""Tests for TopK / NDCG accumulators against hand-computed cases."""

import numpy as np

from hidvae_tpu.evaluate.metrics import NDCGAccumulator, TopKAccumulator


class TestTopK:
    def test_exact_first_rank(self):
        acc = TopKAccumulator(ks=[1, 5])
        actual = np.array([[1, 2, 3]])
        top_k = np.array([[[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 1, 1], [2, 2, 2]]])
        acc.accumulate(actual, top_k)
        m = acc.reduce()
        assert m["h@1_slice_:3"] == 1.0
        assert m["h@5_slice_:3"] == 1.0
        assert m["h@1_pos_0"] == 1.0

    def test_match_at_rank_2(self):
        acc = TopKAccumulator(ks=[1, 5])
        actual = np.array([[1, 2]])
        top_k = np.array([[[9, 9], [9, 9], [1, 2], [9, 9], [9, 9]]])
        acc.accumulate(actual, top_k)
        m = acc.reduce()
        assert m["h@1_slice_:2"] == 0.0
        assert m["h@5_slice_:2"] == 1.0

    def test_prefix_vs_full(self):
        acc = TopKAccumulator(ks=[1])
        actual = np.array([[1, 2]])
        top_k = np.array([[[1, 9]]])  # first digit matches, second doesn't
        acc.accumulate(actual, top_k)
        m = acc.reduce()
        assert m["h@1_slice_:1"] == 1.0
        assert m["h@1_slice_:2"] == 0.0
        assert m["h@1_pos_0"] == 1.0
        assert m["h@1_pos_1"] == 0.0

    def test_accumulation_across_batches(self):
        acc = TopKAccumulator(ks=[1])
        acc.accumulate(np.array([[1]]), np.array([[[1]]]))
        acc.accumulate(np.array([[2]]), np.array([[[3]]]))
        assert acc.reduce()["h@1_slice_:1"] == 0.5


class TestNDCG:
    def test_perfect_rank_is_one(self):
        acc = NDCGAccumulator(ks=[1, 5])
        actual = np.array([[1, 2]])
        top_k = np.array([[[1, 2], [9, 9], [9, 9], [9, 9], [9, 9]]])
        acc.accumulate(actual, top_k)
        m = acc.reduce()
        assert m["ndcg@1_slice_:2"] == 1.0
        assert m["ndcg@5_slice_:2"] == 1.0

    def test_rank_two_discount(self):
        acc = NDCGAccumulator(ks=[5])
        actual = np.array([[7]])
        top_k = np.array([[[0], [7], [0], [0], [0]]])
        acc.accumulate(actual, top_k)
        # One relevant item at position 2: dcg = 1/log2(3), idcg = 1/log2(2) = 1.
        expected = 1.0 / np.log2(3)
        np.testing.assert_allclose(acc.reduce()["ndcg@5_slice_:1"], expected, rtol=1e-6)

    def test_no_match_zero(self):
        acc = NDCGAccumulator(ks=[1, 5])
        acc.accumulate(np.array([[1]]), np.array([[[2], [3], [4], [5], [6]]]))
        m = acc.reduce()
        assert m["ndcg@5_slice_:1"] == 0.0

    def test_k_larger_than_candidates_skipped(self):
        acc = NDCGAccumulator(ks=[1, 10])
        acc.accumulate(np.array([[1]]), np.array([[[1], [2]]]))
        m = acc.reduce()
        assert "ndcg@10_slice_:1" not in m
        assert m["ndcg@1_slice_:1"] == 1.0

    def test_multiple_relevant_candidates(self):
        # Duplicated correct tuple in the candidate list counts as multiple
        # relevant positions, matching the reference's binary-relevance math.
        acc = NDCGAccumulator(ks=[5])
        actual = np.array([[3]])
        top_k = np.array([[[3], [3], [0], [0], [0]]])
        acc.accumulate(actual, top_k)
        disc = 1.0 / np.log2(np.arange(2, 7))
        expected = (disc[0] + disc[1]) / (disc[0] + disc[1])
        np.testing.assert_allclose(acc.reduce()["ndcg@5_slice_:1"], expected, rtol=1e-6)
