"""Device-resident training data: batch sampling inside the jitted step.

The reference streams batches through a torch DataLoader every step
(train_hidvae.py:700, train_transformer.py:394). On TPU — especially through
a remote-dispatch tunnel — per-step host->device transfer and dispatch latency
dominate; and these corpora are small (Amazon Beauty: 12k items x 768 floats
= 37 MB; histories a few MB). So the whole dataset lives in HBM and each train
step *samples its own batch on device*:

  * stage 1: uniform random item indices -> feature/tag gathers
  * stage 2: uniform random sequence rows -> on-device random-crop
    subsampling of (history + target) windows (the vectorized equivalent of
    ref data/processed.py:193-209) -> corpus-table tokenization gather

Sampling is with replacement (the reference reshuffles epochs without
replacement; at corpus sizes >> batch the difference is statistically nil and
with-replacement keeps the step a pure function of (rng, step)).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hidvae_tpu.data.schemas import TokenizedSeqBatch


class DeviceItemData(NamedTuple):
    x: jax.Array                      # [n, F]
    tags_emb: Optional[jax.Array]     # [n, L, Td] or None
    tags_indices: Optional[jax.Array]  # [n, L] or None
    # Optional duplicate-pair mining pool [P, 2] int32 (TPU-native extra, no
    # reference counterpart): rows are item-index pairs whose semantic-ID
    # tuples currently collide, harvested by the trainer from the periodic
    # corpus audit. Sampling `n_pair_rows` of them per batch guarantees
    # in-batch ID collisions, giving the uniqueness loss a signal that scales
    # with the CORPUS duplicate structure instead of the batch-birthday
    # probability (~1% at bs1024 over 200k items — the measured reason the
    # 0.06 repetition gate cannot fire at scale; BASELINE.md XL section).
    mining_pairs: Optional[jax.Array] = None

    @property
    def n(self):
        return self.x.shape[0]

    def _gather(self, idx):
        return (
            jnp.take(self.x, idx, axis=0),
            None if self.tags_emb is None else jnp.take(self.tags_emb, idx, axis=0),
            None if self.tags_indices is None else jnp.take(self.tags_indices, idx, axis=0),
        )

    def sample(self, rng, batch_size: int, n_pair_rows: int = 0):
        if n_pair_rows and self.mining_pairs is not None:
            r_pairs, r_rest = jax.random.split(rng)
            pr = jax.random.randint(
                r_pairs, (n_pair_rows,), 0, self.mining_pairs.shape[0]
            )
            pair_idx = jnp.take(self.mining_pairs, pr, axis=0).reshape(-1)
            rest = jax.random.randint(
                r_rest, (batch_size - 2 * n_pair_rows,), 0, self.n
            )
            idx = jnp.concatenate([pair_idx, rest])
        else:
            idx = jax.random.randint(rng, (batch_size,), 0, self.n)
        return self._gather(idx)


class DeviceSeqData(NamedTuple):
    user_ids: jax.Array   # [n]
    items: jax.Array      # [n, N] int32, -1 padded
    fut: jax.Array        # [n] int32

    @property
    def n(self):
        return self.user_ids.shape[0]

    def sample_rows(self, rng, batch_size: int):
        idx = jax.random.randint(rng, (batch_size,), 0, self.n)
        return (
            jnp.take(self.user_ids, idx, axis=0),
            jnp.take(self.items, idx, axis=0),
            jnp.take(self.fut, idx, axis=0),
        )


def random_crop_windows(rng, items, fut, min_len: int = 3):
    """Vectorized random-crop subsampling of (history + target) windows
    (ref data/processed.py:193-209).

    items: [B, N] int32 (-1 padded), fut: [B]. For each row, the virtual full
    sequence is history ++ [target]; sample a window length in
    [min_len, len+1] and a start so the window fits; the window's last element
    becomes the new target. Rows shorter than min_len are left unchanged.
    """
    b, n = items.shape
    lengths = jnp.sum(items >= 0, axis=1)                 # history lengths
    full_len = lengths + 1
    r1, r2 = jax.random.split(rng)
    u1 = jax.random.uniform(r1, (b,))
    u2 = jax.random.uniform(r2, (b,))
    # win_len ~ U{min_len .. full_len}; start ~ U{0 .. full_len - win_len}.
    span = jnp.maximum(full_len - min_len + 1, 1)
    win_len = min_len + jnp.floor(u1 * span).astype(jnp.int32)
    win_len = jnp.minimum(win_len, full_len)
    start_span = full_len - win_len + 1
    start = jnp.floor(u2 * start_span).astype(jnp.int32)

    # full[j] = items[j] for j < length, fut for j == length.
    pos = start[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    gathered = jnp.take_along_axis(
        items, jnp.clip(pos, 0, n - 1), axis=1
    )
    full_vals = jnp.where(pos == lengths[:, None], fut[:, None], gathered)
    keep = jnp.arange(n, dtype=jnp.int32)[None, :] < (win_len - 1)[:, None]
    new_items = jnp.where(keep, full_vals, -1)
    fut_pos = start + win_len - 1
    new_fut = jnp.where(
        fut_pos == lengths, fut,
        jnp.take_along_axis(items, jnp.clip(fut_pos, 0, n - 1)[:, None], axis=1)[:, 0],
    )
    apply = full_len > min_len
    new_items = jnp.where(apply[:, None], new_items, items)
    new_fut = jnp.where(apply, new_fut, fut)
    return new_items, new_fut


def tokenize_on_device(cached_ids, user_ids, items, fut):
    """Corpus-table tokenization gather (the device-side equivalent of
    HSemanticIdTokenizer.__call__'s cached route, h_semids.py:241-258,
    354-375). Returns a TokenizedSeqBatch."""
    n_items, d = cached_ids.shape
    b, n = items.shape
    safe = jnp.where((items >= 0) & (items < n_items), items, 0)
    seq_ids = jnp.take(cached_ids, safe, axis=0).reshape(b, n * d)
    mask = jnp.repeat(items >= 0, d, axis=1)
    seq_ids = jnp.where(mask, seq_ids, -1)
    fut_ids = jnp.take(cached_ids, jnp.clip(fut, 0, n_items - 1), axis=0)
    ttids = jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, n))
    return TokenizedSeqBatch(
        user_ids=user_ids,
        sem_ids=seq_ids,
        sem_ids_fut=fut_ids,
        seq_mask=mask,
        token_type_ids=ttids,
        token_type_ids_fut=jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, 1)),
    )


def harvest_duplicate_pairs(corpus_ids, split_globals, pool_size: int, np_rng):
    """Harvest a fixed-size pool of colliding item-index PAIRS from a corpus
    audit (host-side; numpy). TPU-native extra — the reference's uniqueness
    loss only ever sees random in-batch collisions (h_rqvae.py:25-105).

    corpus_ids: [N, D] semantic-ID table over ALL items (the audit's table).
    split_globals: sorted global indices of the training split's items
      (ItemData.indices) — pairs are remapped to split-local positions and
      pairs touching items outside the split are dropped.
    pool_size: rows in the returned [pool_size, 2] int32 pool (resampled with
      replacement when fewer collisions exist; subsampled when more).

    Returns None when no intra-split collision exists (mining disables until
    the next audit)."""
    import numpy as np

    _, inverse, counts = np.unique(
        corpus_ids, axis=0, return_inverse=True, return_counts=True
    )
    if int(counts.max(initial=0)) < 2:
        return None
    order = np.argsort(inverse, kind="stable")
    a, b = order[:-1], order[1:]
    same = inverse[a] == inverse[b]
    pa, pb = a[same], b[same]

    sg = np.asarray(split_globals)

    def to_local(vals):
        pos = np.searchsorted(sg, vals)
        pos_c = np.clip(pos, 0, len(sg) - 1)
        return (pos < len(sg)) & (sg[pos_c] == vals), pos_c

    ok_a, la = to_local(pa)
    ok_b, lb = to_local(pb)
    ok = ok_a & ok_b
    if not ok.any():
        return None
    pairs = np.stack([la[ok], lb[ok]], axis=1).astype(np.int32)
    take = np_rng.choice(
        len(pairs), size=pool_size, replace=len(pairs) < pool_size
    )
    return pairs[take]
