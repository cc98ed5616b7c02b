"""Tests for the range-carrying constrained-generation primitives."""

import jax.numpy as jnp
import numpy as np

from hidvae_tpu.ops.prefix_search import (
    build_prefix_index,
    first_digit_mask,
    narrow_range,
    prefix_range,
    valid_digit_mask,
)


def sorted_toy():
    corpus = jnp.array(
        [[0, 1, 2], [0, 1, 3], [0, 2, 0], [1, 0, 0], [1, 0, 0], [3, 3, 3]],
        jnp.int32,
    )
    return build_prefix_index(corpus)


class TestPrefixRange:
    def test_ranges(self):
        idx = sorted_toy()
        lo, hi = prefix_range(idx, jnp.array([[0], [1], [2], [3]]))
        np.testing.assert_array_equal(np.asarray(lo), [0, 3, 5, 5])
        np.testing.assert_array_equal(np.asarray(hi), [3, 5, 5, 6])

    def test_two_digit_ranges(self):
        idx = sorted_toy()
        lo, hi = prefix_range(idx, jnp.array([[0, 1], [1, 0], [0, 9]]))
        np.testing.assert_array_equal(np.asarray(hi - lo), [2, 2, 0])


class TestFirstDigitMask:
    def test_mask(self):
        idx = sorted_toy()
        mask = np.asarray(first_digit_mask(idx, 5))
        np.testing.assert_array_equal(mask, [True, True, False, True, False])


class TestValidDigitMask:
    def test_level1_digits(self):
        idx = sorted_toy()
        # Prefix [0] covers rows 0..3 -> level-1 digits {1, 2}.
        lo, hi = prefix_range(idx, jnp.array([[0], [1], [3]]))
        mask = np.asarray(valid_digit_mask(idx, lo, hi, 1, 5, cap=6))
        np.testing.assert_array_equal(mask[0], [False, True, True, False, False])
        np.testing.assert_array_equal(mask[1], [True, False, False, False, False])
        np.testing.assert_array_equal(mask[2], [False, False, False, True, False])

    def test_empty_range(self):
        idx = sorted_toy()
        lo = jnp.array([2], jnp.int32)
        hi = jnp.array([2], jnp.int32)
        mask = np.asarray(valid_digit_mask(idx, lo, hi, 1, 5, cap=4))
        assert not mask.any()

    def test_cap_truncation_is_only_risk(self):
        # With cap >= range size the mask is exact even on duplicate rows.
        idx = sorted_toy()
        lo, hi = prefix_range(idx, jnp.array([[1, 0]]))
        mask = np.asarray(valid_digit_mask(idx, lo, hi, 2, 5, cap=2))
        np.testing.assert_array_equal(mask[0], [True, False, False, False, False])


class TestOutOfRangeDigits:
    def test_valid_digit_mask_excludes_unrepresentable(self):
        """Tag digits >= the vocab (concat layouts) must not clip into slot
        n_digits-1."""
        corpus = build_prefix_index(
            jnp.array([[0, 300, 1], [0, 4, 2], [1, 999, 0]], jnp.int32)
        )
        lo, hi = prefix_range(corpus, jnp.array([[0], [1]]))
        mask = np.asarray(valid_digit_mask(corpus, lo, hi, 1, 5, cap=3))
        # Prefix [0]: level-1 values {4, 300}; only 4 representable in K=5.
        np.testing.assert_array_equal(mask[0], [False, False, False, False, True])
        # Prefix [1]: only 999 -> nothing representable.
        assert not mask[1].any()

    def test_first_digit_mask_excludes_unrepresentable(self):
        corpus = build_prefix_index(jnp.array([[7, 0], [2, 0]], jnp.int32))
        mask = np.asarray(first_digit_mask(corpus, 4))
        np.testing.assert_array_equal(mask, [False, False, True, False])


class TestNarrowRange:
    def test_incremental_matches_direct(self):
        rng = np.random.RandomState(0)
        corpus = jnp.asarray(rng.randint(0, 4, size=(200, 3)), jnp.int32)
        idx = build_prefix_index(corpus)
        n = idx.shape[0]
        # Narrow [0, n) by digit d0 at level 0, then by d1 at level 1; compare
        # against direct prefix_range([d0, d1]).
        for d0 in range(4):
            for d1 in range(4):
                lo0 = jnp.array([0], jnp.int32)
                hi0 = jnp.array([n], jnp.int32)
                lo1, hi1 = narrow_range(idx, lo0, hi0, 0, jnp.array([d0]))
                lo2, hi2 = narrow_range(idx, lo1, hi1, 1, jnp.array([d1]))
                dlo, dhi = prefix_range(idx, jnp.array([[d0, d1]]))
                np.testing.assert_array_equal(np.asarray(lo2), np.asarray(dlo))
                np.testing.assert_array_equal(np.asarray(hi2), np.asarray(dhi))

    def test_absent_digit_empty(self):
        idx = sorted_toy()
        lo, hi = prefix_range(idx, jnp.array([[0]]))
        nlo, nhi = narrow_range(idx, lo, hi, 1, jnp.array([4]))
        assert int((nhi - nlo)[0]) == 0
