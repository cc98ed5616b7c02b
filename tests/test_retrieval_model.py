"""Tests for the stage-2 retrieval model: embedders, transformer, CE loss, and
constrained beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.data.schemas import TokenizedSeqBatch
from hidvae_tpu.models.embedder import (
    MAX_TAG_SIZE,
    SemIdEmbedder,
    UserIdEmbedder,
    compute_embedding_slots,
)
from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
from hidvae_tpu.ops.prefix_search import build_prefix_index

B, N, D, K = 4, 6, 3, 16  # batch, items, digits per item, codebook
EMB, ATTN = 16, 32


def make_tokenized_batch(rng_seed=0, d=D, n=N, b=B, k=K):
    rng = np.random.RandomState(rng_seed)
    t = n * d
    sem_ids = jnp.array(rng.randint(0, k, size=(b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    mask = mask.at[1, (n - 2) * d :].set(False)  # one ragged row
    sem_ids = jnp.where(mask, sem_ids, -1)
    ttids = jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, n))
    return TokenizedSeqBatch(
        user_ids=jnp.arange(b, dtype=jnp.int32),
        sem_ids=sem_ids,
        sem_ids_fut=jnp.array(rng.randint(0, k, size=(b, d)), jnp.int32),
        seq_mask=mask,
        token_type_ids=ttids,
        token_type_ids_fut=jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, 1)),
    )


def make_model(**kw):
    cfg = dict(
        embedding_dim=EMB, attn_dim=ATTN, dropout=0.1, num_heads=4, n_layers=2,
        num_embeddings=K, sem_id_dim=D, max_pos=64, n_sem_layers=D,
    )
    cfg.update(kw)
    return EncoderDecoderRetrievalModel(**cfg)


@pytest.fixture(scope="module")
def model_and_vars():
    model = make_model()
    batch = make_tokenized_batch()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, False
    )
    return model, variables


class TestSlots:
    def test_semantic_only(self):
        sem_ids = jnp.array([[3, 5, 7]])
        ttids = jnp.array([[0, 1, 2]])
        slots = compute_embedding_slots(
            sem_ids, ttids, num_embeddings=K, n_sem_layers=3, n_tag_layers=0,
            use_interleaved_ids=False, padding_idx=999,
        )
        np.testing.assert_array_equal(np.asarray(slots), [[3, K + 5, 2 * K + 7]])

    def test_concatenated_tags(self):
        sem_ids = jnp.array([[3, 5, 7, 2, 9, 4]])
        ttids = jnp.array([[0, 1, 2, 3, 4, 5]])
        slots = compute_embedding_slots(
            sem_ids, ttids, num_embeddings=K, n_sem_layers=3, n_tag_layers=3,
            use_interleaved_ids=False, padding_idx=99999,
        )
        off = 3 * K
        expected = [[3, K + 5, 2 * K + 7, off + 2, off + MAX_TAG_SIZE + 9,
                     off + 2 * MAX_TAG_SIZE + 4]]
        np.testing.assert_array_equal(np.asarray(slots), expected)

    def test_interleaved_tags(self):
        sem_ids = jnp.array([[3, 2, 5, 9, 7, 4]])  # s1 t1 s2 t2 s3 t3
        ttids = jnp.array([[0, 1, 2, 3, 4, 5]])
        slots = compute_embedding_slots(
            sem_ids, ttids, num_embeddings=K, n_sem_layers=3, n_tag_layers=3,
            use_interleaved_ids=True, padding_idx=99999,
        )
        off = 3 * K
        expected = [[3, off + 2, K + 5, off + MAX_TAG_SIZE + 9, 2 * K + 7,
                     off + 2 * MAX_TAG_SIZE + 4]]
        np.testing.assert_array_equal(np.asarray(slots), expected)

    def test_masked_to_padding(self):
        sem_ids = jnp.array([[3, -1]])
        ttids = jnp.array([[0, 1]])
        slots = compute_embedding_slots(
            sem_ids, ttids, num_embeddings=K, n_sem_layers=2, n_tag_layers=0,
            use_interleaved_ids=False, padding_idx=777,
            valid_mask=jnp.array([[True, False]]),
        )
        np.testing.assert_array_equal(np.asarray(slots), [[3, 777]])


class TestEmbedders:
    def test_sem_id_embedder_shapes(self):
        emb = SemIdEmbedder(num_embeddings=K, sem_ids_dim=D, embeddings_dim=EMB,
                            n_sem_layers=D)
        batch = make_tokenized_batch()
        variables = emb.init(jax.random.key(0), batch)
        out = emb.apply(variables, batch)
        assert out.seq.shape == (B, N * D, EMB)
        assert out.fut.shape == (B, D, EMB)
        # Padded positions embed to exactly zero.
        padded = np.asarray(out.seq)[1, (N - 2) * D :]
        np.testing.assert_array_equal(padded, 0.0)

    def test_user_id_hashing(self):
        emb = UserIdEmbedder(num_buckets=10, embedding_dim=EMB)
        variables = emb.init(jax.random.key(0), jnp.array([0]))
        e1 = emb.apply(variables, jnp.array([3]))
        e2 = emb.apply(variables, jnp.array([13]))  # same bucket: 13 % 10 == 3
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


class TestForward:
    def test_loss_shapes_and_finiteness(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out = model.apply(variables, batch, False)
        assert np.isfinite(float(out.loss))
        assert out.loss_d.shape == (D,)
        assert out.logits.shape == (B, D + 1, K)

    def test_out_of_range_targets_ignored(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        bad = batch.replace(
            sem_ids_fut=jnp.full_like(batch.sem_ids_fut, -1)
        )
        out = model.apply(variables, bad, False)
        assert float(out.loss) == 0.0

    def test_grad_flows_to_embedder(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()

        def loss_fn(params):
            return model.apply({"params": params}, batch, True,
                               rngs={"dropout": jax.random.key(3)}).loss

        g = jax.grad(loss_fn)(variables["params"])
        emb_g = float(jnp.sum(jnp.abs(g["sem_id_embedder"]["emb"]["embedding"])))
        assert emb_g > 0  # mirrors the reference's gradient-flow assert
        wpe_g = float(jnp.sum(jnp.abs(g["wpe"]["embedding"])))
        assert wpe_g > 0

    def test_causality(self, model_and_vars):
        """Digit i's logits must not depend on future digits > i."""
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out1 = model.apply(variables, batch, False)
        fut2 = batch.sem_ids_fut.at[:, -1].set((batch.sem_ids_fut[:, -1] + 1) % K)
        out2 = model.apply(variables, batch.replace(sem_ids_fut=fut2), False)
        l1 = np.asarray(out1.logits)
        l2 = np.asarray(out2.logits)
        # Positions 0..D-1 (BOS..digit D-2 inputs) unchanged; only the final
        # position (which consumed digit D-1) may change.
        np.testing.assert_allclose(l1[:, : D - 1 + 1], l2[:, : D - 1 + 1], atol=1e-5)


class TestGroupedCrossAttention:
    def test_matches_repeated_kv(self):
        """grouped_cross_attention([B*g] queries, [B] kv) must equal the dense
        path on jnp.repeat(kv, g) — the layout beam search relies on."""
        from hidvae_tpu.models.attention import (
            dot_product_attention,
            grouped_cross_attention,
            make_attention_mask,
        )

        rng = np.random.RandomState(0)
        b, g, h, nq, m, dh = 3, 4, 2, 5, 7, 8
        q = jnp.asarray(rng.randn(b * g, h, nq, dh), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
        pad = jnp.asarray(rng.rand(b, m) > 0.3)
        pad = pad.at[:, 0].set(True)  # at least one valid key per row

        got = grouped_cross_attention(q, k, v, kv_padding_mask=pad)
        kr = jnp.repeat(k, g, axis=0)
        vr = jnp.repeat(v, g, axis=0)
        mask = make_attention_mask(nq, m, causal=False,
                                   kv_padding_mask=jnp.repeat(pad, g, axis=0))
        want = dot_product_attention(q, kr, vr, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_decode_logits_grouped_matches_repeated(self, model_and_vars):
        """decode_logits with enc at [B] and beams at [B*g] must match the
        explicit jnp.repeat(enc, g) path (the round-1 beam implementation)."""
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        g = 3
        enc, ctx_mask = model.apply(
            variables, batch, method=EncoderDecoderRetrievalModel.encode_context)
        # Beam rows are user-major ([u0b0, u0b1, ..., u1b0, ...]) — the layout
        # generate_next_sem_id's reshape(b*k, ...) produces.
        fut = jnp.repeat(batch.sem_ids_fut, g, axis=0)
        tt = jnp.repeat(batch.token_type_ids_fut, g, axis=0)
        users = jnp.repeat(batch.user_ids, g, axis=0)

        def logits(e, m):
            return model.apply(
                variables, e, m, fut, tt, users,
                method=EncoderDecoderRetrievalModel.decode_logits)

        got = logits(enc, ctx_mask)  # grouped: kv batch B, query batch B*g
        want = logits(jnp.repeat(enc, g, axis=0), jnp.repeat(ctx_mask, g, axis=0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


class TestGeneration:
    def test_unconstrained_shapes(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out = model.apply(
            variables, batch, None,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        assert out.sem_ids.shape == (B, 32, D)
        assert out.log_probas.shape == (B, 32)
        ids = np.asarray(out.sem_ids)
        assert ids.min() >= 0 and ids.max() < K
        # Beams sorted by score.
        lp = np.asarray(out.log_probas)
        assert (np.diff(lp, axis=-1) <= 1e-5).all()

    def test_constrained_outputs_exist_in_corpus(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.RandomState(7)
        corpus = jnp.array(rng.randint(0, K, size=(40, D)), jnp.int32)
        index = build_prefix_index(corpus)
        batch = make_tokenized_batch()
        out = model.apply(
            variables, batch, index,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        corpus_set = {tuple(r) for r in np.asarray(corpus)}
        ids = np.asarray(out.sem_ids)
        lp = np.asarray(out.log_probas)
        # Any beam with score > penalty threshold must be a real corpus tuple.
        for bi in range(B):
            for ki in range(32):
                if lp[bi, ki] > -5000:
                    assert tuple(ids[bi, ki]) in corpus_set

    def test_trie_masks_match_cap_gather_beam(self, model_and_vars):
        """Constrained generation must be IDENTICAL whether validity masks
        come from the [Q, cap] range gather or the O(1) trie-node bitmaps
        (ops.prefix_search.build_prefix_tries) — same beams, same scores."""
        from hidvae_tpu.ops.prefix_search import build_prefix_tries

        model, variables = model_and_vars
        rng = np.random.RandomState(11)
        # Skewed corpus: most rows share digit-0 == 0 (worst case for caps).
        corpus = rng.randint(0, K, size=(60, D)).astype(np.int32)
        corpus[:50, 0] = 0
        index = build_prefix_index(jnp.asarray(corpus))
        caps = []
        for length in range(1, D):
            _, counts = np.unique(np.asarray(index)[:, :length], axis=0,
                                  return_counts=True)
            caps.append(int(counts.max()))
        tries = {
            lvl: (jnp.asarray(s), jnp.asarray(bm))
            for lvl, (s, bm) in build_prefix_tries(np.asarray(index), K).items()
        }
        batch = make_tokenized_batch()
        out_caps = model.apply(
            variables, batch, index, prefix_caps=tuple(caps),
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        out_tries = model.apply(
            variables, batch, index, prefix_tries=tries,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        np.testing.assert_array_equal(
            np.asarray(out_caps.sem_ids), np.asarray(out_tries.sem_ids)
        )
        np.testing.assert_allclose(
            np.asarray(out_caps.log_probas), np.asarray(out_tries.log_probas),
            rtol=1e-6,
        )

    def test_top1_mode(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out = model.apply(
            variables, batch, None, top_k=False,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        assert out.sem_ids.shape == (B, 1, D)

    def test_greedy_matches_argmax_rollout(self, model_and_vars):
        """Unconstrained k=1 beam equals greedy digit-by-digit argmax."""
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out = model.apply(
            variables, batch, None, top_k=False,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        # Manual greedy rollout.
        enc, mask = model.apply(variables, batch, False,
                                method=EncoderDecoderRetrievalModel.encode_context)
        dec_in = jnp.zeros((B, D), jnp.int32)
        ttids = jnp.tile(jnp.arange(D, dtype=jnp.int32), (B, 1))
        for i in range(D):
            logits = model.apply(
                variables, enc, mask, dec_in, ttids, batch.user_ids, False,
                method=EncoderDecoderRetrievalModel.decode_logits,
            )
            nxt = jnp.argmax(logits[:, i, :], axis=-1).astype(jnp.int32)
            dec_in = dec_in.at[:, i].set(nxt)
        np.testing.assert_array_equal(
            np.asarray(out.sem_ids[:, 0, :]), np.asarray(dec_in)
        )

    def test_sampled_generation_runs(self, model_and_vars):
        model, variables = model_and_vars
        batch = make_tokenized_batch()
        out = model.apply(
            variables, batch, None, sample=True, rng=jax.random.key(5),
            temperature=0.8,
            method=EncoderDecoderRetrievalModel.generate_next_sem_id,
        )
        assert out.sem_ids.shape == (B, 32, D)
