"""Plain semantic-ID tokenizer service around a frozen RQ-VAE.

This component is MISSING from the reference repo (modules/tokenizer/semids.py
is imported by train_rqvae.py:20 / train_transformer.py:28 but was never
committed — SURVEY.md §0.1). The API here is reconstructed from its call sites:
  * constructor kwargs at train_rqvae.py:188-198 (incl. `use_dedup_dim` at
    train_transformer.py:269)
  * `.rq_vae` attribute (train_rqvae.py:199)
  * `.reset()` / `.precompute_corpus_ids()` (train_rqvae.py:317-320)
  * `.sem_ids_dim` / `.exists_prefix()` (train_transformer.py:346-348)
  * `__call__` on a SeqBatch (train_transformer.py:395)
  * dedup last column read as duplicate-rank (train_rqvae.py:321-323)

TPU design: the whole corpus sweep is one jitted program over the HBM-resident
item-feature matrix; `exists_prefix` uses the sorted-table binary search from
hidvae_tpu.ops.prefix_search instead of the O(Q*N*D) equality sweep.
"""


import jax
import jax.numpy as jnp

from hidvae_tpu.data.schemas import SeqBatch, TokenizedSeqBatch
from hidvae_tpu.ops.prefix_search import (
    build_prefix_index,
    duplicate_ranks,
    exists_prefix,
)


def _flatten_tokenize(cached_ids, ids, seq_mask):
    """Gather per-item ID tuples and flatten [B, N] item ids -> [B, N*D].

    Mirrors h_semids.py:241-258 + mask-to--1 at :354-356.
    """
    n_items = cached_ids.shape[0]
    d = cached_ids.shape[1]
    safe = jnp.where((ids >= 0) & (ids < n_items), ids, 0)
    gathered = jnp.take(cached_ids, safe, axis=0)          # [B, N, D]
    b, n = ids.shape
    flat = gathered.reshape(b, n * d)
    if seq_mask is not None:
        mask = jnp.repeat(seq_mask, d, axis=1)
        flat = jnp.where(mask, flat, -1)
    else:
        mask = jnp.ones_like(flat, bool)
    return flat, mask


def _token_type_ids(b, n, d):
    return jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, n))


class SemanticIdTokenizer:
    """Tokenizes item-feature batches into flattened semantic-ID sequences."""

    def __init__(
        self,
        model,                      # RqVae module definition
        variables,                  # frozen model variables
        *,
        n_layers: int = 3,
        codebook_size: int = 256,
        use_dedup_dim: bool = False,
        corpus_chunk_size: int = 8192,
    ):
        self.rq_vae = model
        self.variables = variables
        self.n_layers = n_layers
        self.codebook_size = codebook_size
        self.use_dedup_dim = use_dedup_dim
        self.corpus_chunk_size = corpus_chunk_size
        self.reset()

        @jax.jit
        def _encode_ids(variables, x):
            from hidvae_tpu.ops.pallas.rq_kernels import rq_assign_auto

            def run(m, x):
                encoded = m.encode(x.astype(jnp.float32))
                ids, _ = rq_assign_auto(encoded, m.stacked_codebooks())
                return ids

            return model.apply(variables, x, method=run)

        self._encode_ids = _encode_ids

    def reset(self):
        self.cached_ids = None
        self.cached_ids_fingerprint = None
        self._prefix_index = None
        self._prefix_caps = None
        self._prefix_tries = None

    @property
    def sem_ids_dim(self):
        return self.n_layers + 1 if self.use_dedup_dim else self.n_layers

    def _corpus_ids_for(self, item_features, sharding=None):
        """Run the frozen quantizer over the full corpus, chunked to bound HBM
        and double-buffered against host->device upload (tokenizer/sweep.py)."""
        from hidvae_tpu.tokenizer.sweep import sweep_corpus

        return sweep_corpus(
            lambda block: self._encode_ids(self.variables, block),
            item_features, self.corpus_chunk_size, sharding,
        )

    def precompute_corpus_ids(self, item_features, sharding=None) -> jax.Array:
        """Build the [n_items, sem_ids_dim] corpus table (+ dedup rank column).

        Optional `sharding` (NamedSharding over a 'data' mesh axis) runs the
        sweep data-parallel across devices; see HSemanticIdTokenizer."""
        from hidvae_tpu.tokenizer.sweep import features_fingerprint

        sem_ids = self._corpus_ids_for(item_features, sharding)
        if self.use_dedup_dim:
            ranks = duplicate_ranks(sem_ids)
            sem_ids = jnp.concatenate([sem_ids, ranks[:, None]], axis=-1)
        self.cached_ids = sem_ids
        self.cached_ids_fingerprint = features_fingerprint(item_features)
        self._prefix_index = build_prefix_index(sem_ids)
        return self.cached_ids

    def exists_prefix(self, sem_id_prefix) -> jax.Array:
        if self._prefix_index is None:
            raise RuntimeError("No match found in empty cache.")
        return exists_prefix(self._prefix_index, jnp.asarray(sem_id_prefix))

    @property
    def prefix_index(self):
        return self._prefix_index

    @property
    def prefix_caps(self):
        """Per-prefix-length max duplicate counts (exact bitmap bounds for
        constrained generation). caps[l-1] = max rows sharing an l-prefix."""
        if self._prefix_caps is None and self.cached_ids is not None:
            import numpy as np

            ids = np.asarray(self.cached_ids)
            caps = []
            for length in range(1, ids.shape[1]):
                _, counts = np.unique(ids[:, :length], axis=0, return_counts=True)
                caps.append(int(counts.max()))
            self._prefix_caps = caps
        return self._prefix_caps

    def prefix_tries(self, n_digits=None):
        """Per-level trie-node bitmaps for O(1) beam-step validity masks
        (ops.prefix_search.build_prefix_tries); host numpy, cached per width.

        n_digits: bitmap width — pass the DECODER's vocab (num_embeddings):
        tag digits in concatenated/interleaved layouts can exceed the
        semantic codebook size, and values outside [0, n_digits) are dropped
        as unreachable-by-softmax (same semantics as valid_digit_mask)."""
        n_digits = int(n_digits or self.codebook_size)
        if self._prefix_index is None:
            return None
        if self._prefix_tries is None:
            self._prefix_tries = {}
        if n_digits not in self._prefix_tries:
            import numpy as np

            from hidvae_tpu.ops.prefix_search import build_prefix_tries

            self._prefix_tries[n_digits] = build_prefix_tries(
                np.asarray(self._prefix_index), n_digits
            )
        return self._prefix_tries[n_digits]

    def __call__(self, batch: SeqBatch) -> TokenizedSeqBatch:
        if self.cached_ids is None:
            raise RuntimeError("precompute_corpus_ids must run before tokenizing.")
        d = self.cached_ids.shape[1]
        b, n = batch.ids.shape
        sem_ids, seq_mask = _flatten_tokenize(self.cached_ids, batch.ids, batch.seq_mask)
        sem_ids_fut, _ = _flatten_tokenize(self.cached_ids, batch.ids_fut, None)
        return TokenizedSeqBatch(
            user_ids=batch.user_ids,
            sem_ids=sem_ids,
            sem_ids_fut=sem_ids_fut,
            seq_mask=seq_mask,
            token_type_ids=_token_type_ids(b, n, d),
            token_type_ids_fut=_token_type_ids(b, batch.ids_fut.shape[1], d),
        )
