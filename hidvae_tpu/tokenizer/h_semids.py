"""Hierarchical semantic-ID tokenizer service around a frozen HiD-VAE.

Parity: reference modules/tokenizer/h_semids.py (HSemanticIdTokenizer). Three
mutually-exclusive ID layouts (ref :51-57):
  * semantic-only               [s1..sL]
  * concatenated (+pred tags)   [s1..sL, t1..tT]      (ref :134-146)
  * interleaved                 [s1, t1, s2, t2, ...] (ref :147-169)
`sem_ids_dim` follows ref :95-107. `precompute_corpus_ids` sweeps the item
corpus through the frozen model (ref :109-195); `exists_prefix` verifies
ID prefixes against the corpus (ref :197-239) via the sorted-table binary
search in hidvae_tpu.ops.prefix_search; `__call__` tokenizes SeqBatches by
cached gather (ref :241-258, :354-375).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hidvae_tpu.data.schemas import SeqBatch, TokenizedSeqBatch
from hidvae_tpu.ops.prefix_search import (
    build_prefix_index,
    duplicate_ranks,
    exists_prefix,
)
from hidvae_tpu.tokenizer.semids import _flatten_tokenize, _token_type_ids


def interleave_ids(sem_ids, tag_ids):
    """Interleave [.., n_sem] and [.., n_tag] -> [.., n_sem+n_tag] as
    [s1, t1, s2, t2, ...] (ref h_semids.py:155-169)."""
    n_sem = sem_ids.shape[-1]
    n_tag = tag_ids.shape[-1]
    cols = []
    for i in range(max(n_sem, n_tag)):
        if i < n_sem:
            cols.append(sem_ids[..., i : i + 1])
        if i < n_tag:
            cols.append(tag_ids[..., i : i + 1])
    return jnp.concatenate(cols, axis=-1)


class HSemanticIdTokenizer:
    """Tokenizer service over a frozen HRqVae (ref h_semids.py:24-531)."""

    def __init__(
        self,
        model,                      # HRqVae module definition
        variables,                  # frozen model variables (params [+ batch_stats])
        *,
        n_layers: int = 3,
        codebook_size: int = 256,
        tag_class_counts: Optional[Sequence[int]] = None,
        use_dedup_dim: bool = False,
        use_concatenated_ids: bool = False,
        use_interleaved_ids: bool = False,
        corpus_chunk_size: int = 8192,
    ):
        # Mutual exclusion guards (ref h_semids.py:51-57).
        if use_dedup_dim and use_concatenated_ids:
            raise ValueError("use_dedup_dim and use_concatenated_ids are mutually exclusive")
        if use_dedup_dim and use_interleaved_ids:
            raise ValueError("use_dedup_dim and use_interleaved_ids are mutually exclusive")
        if use_concatenated_ids and use_interleaved_ids:
            raise ValueError("use_concatenated_ids and use_interleaved_ids are mutually exclusive")

        self.hrq_vae = model
        self.variables = variables
        self.n_layers = n_layers
        self.codebook_size = codebook_size
        self.tag_class_counts = list(tag_class_counts) if tag_class_counts else None
        self.use_dedup_dim = use_dedup_dim
        self.use_concatenated_ids = use_concatenated_ids
        self.use_interleaved_ids = use_interleaved_ids
        self.corpus_chunk_size = corpus_chunk_size
        self.reset()

        needs_tags = use_concatenated_ids or use_interleaved_ids

        @jax.jit
        def _encode_ids(variables, x):
            from hidvae_tpu.ops.pallas.rq_kernels import rq_assign_auto

            def run(m, x):
                encoded = m.encode(x.astype(jnp.float32))
                ids, _ = rq_assign_auto(encoded, m.stacked_codebooks())
                if needs_tags:
                    tags = m.predict_tags_from_ids(ids)["predictions"]
                else:
                    tags = None
                return ids, tags

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
        """Total ID tuple width (ref h_semids.py:95-107)."""
        if self.use_dedup_dim:
            return self.n_layers + 1
        if (self.use_concatenated_ids or self.use_interleaved_ids) and self.tag_class_counts:
            return self.n_layers + len(self.tag_class_counts)
        return self.n_layers

    def _combine(self, sem_ids, tag_ids):
        if self.use_concatenated_ids:
            return jnp.concatenate([sem_ids, tag_ids], axis=-1)
        if self.use_interleaved_ids:
            return interleave_ids(sem_ids, tag_ids)
        return sem_ids

    def _corpus_ids_for(self, item_features, sharding=None):
        from hidvae_tpu.tokenizer.sweep import sweep_corpus

        def encode_block(block):
            sem_ids, tag_ids = self._encode_ids(self.variables, block)
            return self._combine(sem_ids, tag_ids) if tag_ids is not None else sem_ids

        return sweep_corpus(
            encode_block, item_features, self.corpus_chunk_size, sharding
        )

    def precompute_corpus_ids(self, item_features, sharding=None) -> jax.Array:
        """Build the [n_items, sem_ids_dim] corpus table (ref h_semids.py:109-195).

        `sharding` (optional NamedSharding over a mesh 'data' axis) runs the
        corpus sweep data-parallel over the mesh — each chunk's item rows are
        split across devices and encoded concurrently (the reference's sweep is
        a single-device DataLoader loop, h_semids.py:109-133). Host numpy
        features are uploaded chunk-by-chunk, double-buffered against the
        encode (tokenizer/sweep.py); device-resident features are sliced in
        place."""
        from hidvae_tpu.tokenizer.sweep import features_fingerprint

        ids = self._corpus_ids_for(item_features, sharding)
        if self.use_dedup_dim:
            ranks = duplicate_ranks(ids)
            ids = jnp.concatenate([ids, ranks[:, None]], axis=-1)
        self.cached_ids = ids
        self.cached_ids_fingerprint = features_fingerprint(item_features)
        self._prefix_index = build_prefix_index(ids)
        return self.cached_ids

    def exists_prefix(self, sem_id_prefix) -> jax.Array:
        """Corpus prefix check (ref h_semids.py:197-239)."""
        if self._prefix_index is None:
            raise RuntimeError("No match found in empty cache.")
        return exists_prefix(self._prefix_index, jnp.asarray(sem_id_prefix))

    @property
    def prefix_index(self):
        return self._prefix_index

    @property
    def prefix_caps(self):
        """Per-prefix-length max duplicate counts (see SemanticIdTokenizer)."""
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
        See SemanticIdTokenizer.prefix_tries for the n_digits contract."""
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

    def predict_tags(self, x):
        return self.hrq_vae.apply(self.variables, x, method=lambda m, x: m.predict_tags(x))

    def tokenize_features(self, x, x_fut=None, seq_mask=None, user_ids=None):
        """Tokenize raw item features [B, N, F] directly (cache-miss path,
        ref h_semids.py:262-356)."""
        b, n, f = x.shape
        sem_ids, tag_ids = self._encode_ids(self.variables, x.reshape(-1, f))
        combined = self._combine(sem_ids, tag_ids) if tag_ids is not None else sem_ids
        d = combined.shape[-1]
        flat = combined.reshape(b, n * d)
        if seq_mask is not None:
            mask = jnp.repeat(seq_mask, d, axis=1)
            flat = jnp.where(mask, flat, -1)
        else:
            mask = jnp.ones_like(flat, bool)

        sem_ids_fut = None
        if x_fut is not None:
            nf = x_fut.shape[1] if x_fut.ndim == 3 else 1
            xf = x_fut.reshape(-1, f)
            s_f, t_f = self._encode_ids(self.variables, xf)
            comb_f = self._combine(s_f, t_f) if t_f is not None else s_f
            sem_ids_fut = comb_f.reshape(b, nf * d)

        return TokenizedSeqBatch(
            user_ids=user_ids if user_ids is not None else jnp.zeros((b,), jnp.int32),
            sem_ids=flat,
            sem_ids_fut=sem_ids_fut,
            seq_mask=mask,
            token_type_ids=_token_type_ids(b, n, d),
            token_type_ids_fut=_token_type_ids(b, 1, d) if sem_ids_fut is not None else None,
        )

    def __call__(self, batch: SeqBatch) -> TokenizedSeqBatch:
        """Tokenize a SeqBatch by cached gather (ref h_semids.py:262-388).

        Deviation (PARITY #16): the reference re-encodes cache-MISSING items
        inside each batch; here the corpus table is always precomputed in full
        before training/serving (static shapes, device-resident), so the mixed
        hit/miss case cannot arise — ids outside the table are a caller bug.
        `tokenize_features` covers the no-table-at-all case."""
        if self.cached_ids is None:
            return self.tokenize_features(
                batch.x, batch.x_fut, batch.seq_mask, batch.user_ids
            )
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
