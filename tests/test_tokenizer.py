"""Tests for the tokenizer services (plain + hierarchical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.data.schemas import SeqBatch
from hidvae_tpu.models.hrqvae import HRqVae
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.models.rqvae import RqVae
from hidvae_tpu.tokenizer import HSemanticIdTokenizer, SemanticIdTokenizer
from hidvae_tpu.tokenizer.h_semids import interleave_ids

F, D, K, L = 32, 8, 16, 3
TAG_COUNTS = (4, 6, 8)
N_ITEMS = 64


def _init_rngs():
    return {
        "params": jax.random.key(0),
        "gumbel": jax.random.key(1),
        "dropout": jax.random.key(2),
        "mixup": jax.random.key(3),
    }


@pytest.fixture(scope="module")
def rqvae_tok():
    model = RqVae(
        input_dim=F, embed_dim=D, hidden_dims=(16,), codebook_size=K,
        n_layers=L, n_cat_features=0,
        codebook_mode=QuantizeForwardMode.STE,
    )
    x = jax.random.normal(jax.random.key(10), (4, F))
    variables = model.init(_init_rngs(), x, 0.2, train=False)
    return model, variables


@pytest.fixture(scope="module")
def hrqvae_tok():
    model = HRqVae(
        input_dim=F, embed_dim=D, hidden_dims=(16,), codebook_size=K,
        n_layers=L, n_cat_features=0, tag_class_counts=TAG_COUNTS, tag_embed_dim=12,
        codebook_mode=QuantizeForwardMode.STE,
    )
    x = jax.random.normal(jax.random.key(10), (4, F))
    tags_emb = jax.random.normal(jax.random.key(11), (4, L, 12))
    tags_idx = jnp.zeros((4, L), jnp.int32)
    variables = model.init(_init_rngs(), x, tags_emb, tags_idx, 0.2, train=False)
    return model, variables


@pytest.fixture(scope="module")
def item_features():
    return jax.random.normal(jax.random.key(20), (N_ITEMS, F))


def make_seq_batch(n_items, b=3, n=5):
    rng = np.random.RandomState(0)
    ids = jnp.array(rng.randint(0, n_items, size=(b, n)), jnp.int32)
    mask = jnp.array([[True] * 5, [True] * 3 + [False] * 2, [True] * 4 + [False]])
    ids = jnp.where(mask, ids, -1)
    return SeqBatch(
        user_ids=jnp.arange(b, dtype=jnp.int32),
        ids=ids,
        ids_fut=jnp.array(rng.randint(0, n_items, size=(b, 1)), jnp.int32),
        x=jnp.zeros((b, n, F)),
        x_fut=jnp.zeros((b, 1, F)),
        seq_mask=mask,
    )


class TestInterleave:
    def test_basic(self):
        s = jnp.array([[1, 2, 3]])
        t = jnp.array([[10, 20, 30]])
        np.testing.assert_array_equal(
            np.asarray(interleave_ids(s, t)), [[1, 10, 2, 20, 3, 30]]
        )

    def test_uneven(self):
        s = jnp.array([[1, 2, 3]])
        t = jnp.array([[10]])
        np.testing.assert_array_equal(np.asarray(interleave_ids(s, t)), [[1, 10, 2, 3]])


class TestPlainTokenizer:
    def test_precompute_and_dims(self, rqvae_tok, item_features):
        model, variables = rqvae_tok
        tok = SemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        assert tok.sem_ids_dim == L
        ids = tok.precompute_corpus_ids(item_features)
        assert ids.shape == (N_ITEMS, L)
        assert np.asarray(ids).min() >= 0 and np.asarray(ids).max() < K

    def test_dedup_dim(self, rqvae_tok, item_features):
        model, variables = rqvae_tok
        tok = SemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K, use_dedup_dim=True
        )
        assert tok.sem_ids_dim == L + 1
        ids = np.asarray(tok.precompute_corpus_ids(item_features))
        assert ids.shape == (N_ITEMS, L + 1)
        # Dedup column: every (tuple, rank) pair is unique.
        assert len({tuple(r) for r in ids}) == N_ITEMS

    def test_chunked_matches_single(self, rqvae_tok, item_features):
        model, variables = rqvae_tok
        tok_big = SemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        tok_small = SemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K, corpus_chunk_size=17
        )
        np.testing.assert_array_equal(
            np.asarray(tok_big.precompute_corpus_ids(item_features)),
            np.asarray(tok_small.precompute_corpus_ids(item_features)),
        )

    def test_tokenize_gather_and_mask(self, rqvae_tok, item_features):
        model, variables = rqvae_tok
        tok = SemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        corpus = np.asarray(tok.precompute_corpus_ids(item_features))
        batch = make_seq_batch(N_ITEMS)
        out = tok(batch)
        b, n = batch.ids.shape
        assert out.sem_ids.shape == (b, n * L)
        assert out.sem_ids_fut.shape == (b, L)
        # Valid position gather correctness.
        got = np.asarray(out.sem_ids)[0, :L]
        np.testing.assert_array_equal(got, corpus[int(batch.ids[0, 0])])
        # Padded positions are -1.
        assert (np.asarray(out.sem_ids)[1, 3 * L :] == -1).all()
        # token_type_ids cycle 0..L-1.
        np.testing.assert_array_equal(
            np.asarray(out.token_type_ids)[0, : 2 * L], list(range(L)) * 2
        )

    def test_exists_prefix_roundtrip(self, rqvae_tok, item_features):
        model, variables = rqvae_tok
        tok = SemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        corpus = np.asarray(tok.precompute_corpus_ids(item_features))
        assert bool(tok.exists_prefix(jnp.array([corpus[0][:2]])))
        assert bool(tok.exists_prefix(jnp.array([corpus[0]])))
        # An ID value outside the codebook can never be a corpus prefix.
        assert not bool(tok.exists_prefix(jnp.array([[K + 5]])))


class TestHTokenizer:
    def test_layout_guards(self, hrqvae_tok):
        model, variables = hrqvae_tok
        with pytest.raises(ValueError):
            HSemanticIdTokenizer(model, variables, use_dedup_dim=True,
                                 use_concatenated_ids=True)
        with pytest.raises(ValueError):
            HSemanticIdTokenizer(model, variables, use_concatenated_ids=True,
                                 use_interleaved_ids=True)

    def test_semantic_only(self, hrqvae_tok, item_features):
        model, variables = hrqvae_tok
        tok = HSemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        assert tok.sem_ids_dim == L
        ids = tok.precompute_corpus_ids(item_features)
        assert ids.shape == (N_ITEMS, L)

    def test_concatenated_layout(self, hrqvae_tok, item_features):
        model, variables = hrqvae_tok
        tok = HSemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K,
            tag_class_counts=TAG_COUNTS, use_concatenated_ids=True,
        )
        assert tok.sem_ids_dim == L + len(TAG_COUNTS)
        ids = np.asarray(tok.precompute_corpus_ids(item_features))
        assert ids.shape == (N_ITEMS, L + len(TAG_COUNTS))
        # Semantic digits < K; tag digits < per-layer class count.
        assert ids[:, :L].max() < K
        for i, c in enumerate(TAG_COUNTS):
            assert ids[:, L + i].max() < c

    def test_interleaved_layout(self, hrqvae_tok, item_features):
        model, variables = hrqvae_tok
        tok_c = HSemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K,
            tag_class_counts=TAG_COUNTS, use_concatenated_ids=True,
        )
        tok_i = HSemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K,
            tag_class_counts=TAG_COUNTS, use_interleaved_ids=True,
        )
        concat = np.asarray(tok_c.precompute_corpus_ids(item_features))
        inter = np.asarray(tok_i.precompute_corpus_ids(item_features))
        # Interleaved is a column permutation of concatenated.
        perm = [0, L, 1, L + 1, 2, L + 2]
        np.testing.assert_array_equal(inter, concat[:, perm])

    def test_tokenize_full_width(self, hrqvae_tok, item_features):
        model, variables = hrqvae_tok
        tok = HSemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K,
            tag_class_counts=TAG_COUNTS, use_concatenated_ids=True,
        )
        tok.precompute_corpus_ids(item_features)
        batch = make_seq_batch(N_ITEMS)
        out = tok(batch)
        d_total = L + len(TAG_COUNTS)
        assert out.sem_ids.shape == (3, 5 * d_total)
        assert out.sem_ids_fut.shape == (3, d_total)
        assert out.token_type_ids_fut.shape == (3, d_total)

    def test_tokenize_features_cache_miss(self, hrqvae_tok):
        model, variables = hrqvae_tok
        tok = HSemanticIdTokenizer(model, variables, n_layers=L, codebook_size=K)
        x = jax.random.normal(jax.random.key(30), (2, 4, F))
        mask = jnp.ones((2, 4), bool)
        out = tok.tokenize_features(x, x_fut=jax.random.normal(jax.random.key(31), (2, 1, F)),
                                    seq_mask=mask)
        assert out.sem_ids.shape == (2, 4 * L)
        assert out.sem_ids_fut.shape == (2, L)
