"""Batch schemas (pytree dataclasses).

Capability parity with the reference NamedTuples in
/root/reference/data/schemas.py:7-44 (SeqBatch, TaggedSeqBatch, TokenizedSeqBatch),
re-designed as `flax.struct` pytree dataclasses so whole batches can flow through
`jax.jit` / `jax.device_put` / sharding APIs directly.

Conventions (all static shapes, TPU-friendly):
  B = batch size, N = max sequence length (items), D = semantic-id dim,
  F = item feature dim (768 text embedding [+ categorical one-hots]),
  L = number of tag levels.
Padding: item ids use -1; semantic ids use -1; masks are boolean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SeqBatch:
    """A batch of user histories (or single items when N == 1).

    Mirrors reference SeqBatch (data/schemas.py:7-14).
    """

    user_ids: jax.Array      # [B] int32
    ids: jax.Array           # [B, N] int32, -1 padded
    ids_fut: jax.Array       # [B, 1] int32 target item
    x: jax.Array             # [B, N, F] float item features (-1 rows where padded)
    x_fut: jax.Array         # [B, 1, F] float target item features
    seq_mask: jax.Array      # [B, N] bool


@struct.dataclass
class TaggedSeqBatch:
    """SeqBatch + per-item hierarchical tag supervision.

    Mirrors reference TaggedSeqBatch (data/schemas.py:16-24). For item-level
    batches (stage-1 training) N == 1 and tags are [B, L, 768] / [B, L].
    """

    user_ids: jax.Array
    ids: jax.Array
    ids_fut: jax.Array
    x: jax.Array
    x_fut: jax.Array
    seq_mask: jax.Array
    tags_emb: jax.Array      # [B, L, tag_embed_dim] float
    tags_indices: jax.Array  # [B, L] int32, -1 = missing


@struct.dataclass
class TokenizedSeqBatch:
    """A batch of flattened semantic-ID sequences for the retrieval model.

    Mirrors reference TokenizedSeqBatch (data/schemas.py:27-33). `sem_ids` is the
    flattened [B, N*D] history; `sem_ids_fut` is the [B, D_fut] target prefix
    (D_fut <= D during beam search). `token_type_ids` holds the digit index in
    [0, D) for every position.
    """

    user_ids: jax.Array            # [B] int32
    sem_ids: jax.Array             # [B, N*D] int32, -1 padded
    sem_ids_fut: Optional[jax.Array]        # [B, D_fut] int32 or None
    seq_mask: jax.Array            # [B, N*D] bool
    token_type_ids: jax.Array      # [B, N*D] int32
    token_type_ids_fut: Optional[jax.Array]  # [B, D_fut] int32 or None


def item_batch_from_features(
    x: jax.Array,
    tags_emb: Optional[jax.Array] = None,
    tags_indices: Optional[jax.Array] = None,
):
    """Wrap raw item features [B, F] into a (Tagged)SeqBatch of single items."""
    b = x.shape[0]
    ids = jnp.arange(b, dtype=jnp.int32)[:, None]
    common = dict(
        user_ids=jnp.zeros((b,), jnp.int32),
        ids=ids,
        ids_fut=ids,
        x=x,
        x_fut=x,
        seq_mask=jnp.ones((b, 1), bool),
    )
    if tags_emb is None:
        return SeqBatch(**common)
    return TaggedSeqBatch(**common, tags_emb=tags_emb, tags_indices=tags_indices)
