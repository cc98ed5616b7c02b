"""Semantic-ID and user-ID embedders for the retrieval model.

Parity: reference modules/embedding/id_embedder.py (SemIdEmbedder /
UserIdEmbedder). One large embedding table partitioned by (type, layer):
semantic slot = layer * K + id; tag slot = K * n_sem + layer * max_tag_size +
id (max_tag_size = 1000, ref id_embedder.py:52-71); final row = padding.
Handles concatenated and interleaved token layouts (ref :93-146).

TPU redesign: the reference loops over token positions with boolean-mask
scatter (ref :96-146); here the slot computation is a single vectorized
expression over token_type_ids, so embedding lookup is one gather riding HBM
bandwidth. The table is sharded over the model axis under tensor parallelism
(see hidvae_tpu.parallel).
"""

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hidvae_tpu.data.schemas import TokenizedSeqBatch

MAX_TAG_SIZE = 1000  # per tag layer (ref id_embedder.py:52)


class SemIdEmbeddingBatch(NamedTuple):
    seq: jax.Array
    fut: Optional[jax.Array]


def compute_embedding_slots(
    sem_ids,
    token_type_ids,
    *,
    num_embeddings: int,
    n_sem_layers: int,
    n_tag_layers: int,
    use_interleaved_ids: bool,
    padding_idx: int,
    valid_mask=None,
):
    """Vectorized slot index computation (replaces ref id_embedder.py:93-146)."""
    t = token_type_ids
    if use_interleaved_ids:
        is_sem = (t % 2) == 0
        sem_layer = t // 2
        tag_layer = t // 2
    else:
        is_sem = t < n_sem_layers
        sem_layer = t
        tag_layer = t - n_sem_layers

    sem_offset = num_embeddings * n_sem_layers
    sem_slot = sem_layer * num_embeddings + jnp.clip(sem_ids, 0, num_embeddings - 1)
    tag_slot = sem_offset + tag_layer * MAX_TAG_SIZE + jnp.clip(sem_ids, 0, MAX_TAG_SIZE - 1)
    slots = jnp.where(is_sem, sem_slot, tag_slot)

    # Out-of-range layers fall back to padding (ref :107, :114).
    layer_ok = jnp.where(is_sem, sem_layer < n_sem_layers, tag_layer < n_tag_layers)
    slots = jnp.where(layer_ok, slots, padding_idx)
    if valid_mask is not None:
        slots = jnp.where(valid_mask, slots, padding_idx)
    return slots


class SemIdEmbedder(nn.Module):
    """Partitioned semantic/tag ID embedding table (ref id_embedder.py:21-211)."""

    num_embeddings: int       # semantic codebook size per layer
    sem_ids_dim: int          # total ID tuple width (semantic + tag layers)
    embeddings_dim: int
    n_sem_layers: int = 3
    use_interleaved_ids: bool = False

    @property
    def n_tag_layers(self):
        return self.sem_ids_dim - self.n_sem_layers

    @property
    def table_size(self):
        tag_part = MAX_TAG_SIZE * self.n_tag_layers if self.n_tag_layers > 0 else 0
        return self.num_embeddings * self.n_sem_layers + tag_part + 1

    @property
    def padding_idx(self):
        return self.table_size - 1

    def setup(self):
        self.emb = nn.Embed(self.table_size, self.embeddings_dim, name="emb")

    def _slots(self, sem_ids, token_type_ids, valid_mask=None):
        return compute_embedding_slots(
            sem_ids, token_type_ids,
            num_embeddings=self.num_embeddings,
            n_sem_layers=self.n_sem_layers,
            n_tag_layers=self.n_tag_layers,
            use_interleaved_ids=self.use_interleaved_ids,
            padding_idx=self.padding_idx,
            valid_mask=valid_mask,
        )

    def __call__(self, batch: TokenizedSeqBatch) -> SemIdEmbeddingBatch:
        seq_slots = self._slots(batch.sem_ids, batch.token_type_ids, batch.seq_mask)
        seq_embs = self.emb(seq_slots)
        # Zero padded rows (nn.Embed has no padding_idx-zeroing like torch).
        seq_embs = jnp.where(
            (seq_slots == self.padding_idx)[..., None], 0.0, seq_embs
        )
        if batch.sem_ids_fut is not None:
            fut_slots = self._slots(batch.sem_ids_fut, batch.token_type_ids_fut)
            fut_embs = self.emb(fut_slots)
            fut_embs = jnp.where(
                (fut_slots == self.padding_idx)[..., None], 0.0, fut_embs
            )
        else:
            fut_embs = None
        return SemIdEmbeddingBatch(seq=seq_embs, fut=fut_embs)


class UserIdEmbedder(nn.Module):
    """Hashing-trick user embedding: emb[x % buckets] (ref id_embedder.py:214-248)."""

    num_buckets: int
    embedding_dim: int

    @nn.compact
    def __call__(self, x):
        hashed = jnp.mod(x, self.num_buckets)
        return nn.Embed(self.num_buckets, self.embedding_dim, name="emb")(hashed)
