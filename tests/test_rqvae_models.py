"""Forward/backward tests for RqVae and HRqVae."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.models.hrqvae import HRqVae
from hidvae_tpu.models.quantize import QuantizeForwardMode
from hidvae_tpu.models.rqvae import RqVae, p_unique_ids_stat

B, F, D, K, L = 16, 64, 8, 32, 3
TAG_COUNTS = (4, 8, 12)


def make_rqvae(**kw):
    cfg = dict(
        input_dim=F, embed_dim=D, hidden_dims=(32, 16), codebook_size=K,
        n_layers=L, n_cat_features=0,
        codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
    )
    cfg.update(kw)
    return RqVae(**cfg)


def make_hrqvae(**kw):
    cfg = dict(
        input_dim=F, embed_dim=D, hidden_dims=(32, 16), codebook_size=K,
        n_layers=L, n_cat_features=0, tag_class_counts=TAG_COUNTS,
        tag_embed_dim=24, codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
        use_focal_loss=True,
    )
    cfg.update(kw)
    return HRqVae(**cfg)


def rngs():
    return {
        "params": jax.random.key(0),
        "gumbel": jax.random.key(1),
        "dropout": jax.random.key(2),
        "mixup": jax.random.key(3),
    }


class TestPUnique:
    def test_all_unique(self):
        ids = jnp.array([[0, 1], [1, 2], [2, 3]])
        assert float(p_unique_ids_stat(ids)) == 1.0

    def test_all_same(self):
        ids = jnp.zeros((4, 3), jnp.int32)
        np.testing.assert_allclose(float(p_unique_ids_stat(ids)), 0.25)

    def test_mixed(self):
        ids = jnp.array([[0, 0], [0, 0], [1, 1], [2, 2]])
        np.testing.assert_allclose(float(p_unique_ids_stat(ids)), 0.75)


class TestRqVae:
    def test_forward_shapes_and_finiteness(self):
        model = make_rqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        variables = model.init(rngs(), x, 0.2, train=False)
        out = model.apply(variables, x, 0.2, train=False)
        assert out.embs_norm.shape == (B, L)
        assert np.isfinite(float(out.loss))
        assert 0.0 <= float(out.p_unique_ids) <= 1.0

    def test_semantic_ids_deterministic_eval(self):
        model = make_rqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        variables = model.init(rngs(), x, 0.2, train=False)
        o1 = model.apply(variables, x, 0.001, train=False,
                         method=lambda m, x, t, train: m.get_semantic_ids(x, t, train))
        o2 = model.apply(variables, x, 0.001, train=False,
                         method=lambda m, x, t, train: m.get_semantic_ids(x, t, train))
        np.testing.assert_array_equal(np.asarray(o1.sem_ids), np.asarray(o2.sem_ids))
        assert o1.sem_ids.shape == (B, L)
        assert o1.embeddings.shape == (B, L, D)

    @pytest.mark.parametrize("mode", list(QuantizeForwardMode))
    def test_gradients_flow_each_mode(self, mode):
        model = make_rqvae(codebook_mode=mode)
        x = jax.random.normal(jax.random.key(5), (B, F))
        variables = model.init(rngs(), x, 0.2, train=True)

        def loss_fn(params):
            out = model.apply({"params": params}, x, 0.2, train=True,
                              rngs={"gumbel": jax.random.key(7)})
            return out.loss

        g = jax.grad(loss_fn)(variables["params"])
        enc_g = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["encoder"], 0.0
        )
        cb_g = float(jnp.sum(jnp.abs(g["quantize_0"]["embedding"])))
        assert enc_g > 0
        assert cb_g > 0

    def test_cat_features_path(self):
        model = make_rqvae(n_cat_features=6)
        x = jax.random.normal(jax.random.key(5), (B, F))
        variables = model.init(rngs(), x, 0.2, train=False)
        out = model.apply(variables, x, 0.2, train=False)
        assert np.isfinite(float(out.loss))

    def test_residual_structure(self):
        """residual[i+1] = residual[i] - emb[i] by construction."""
        model = make_rqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        variables = model.init(rngs(), x, 0.2, train=False)
        out = model.apply(variables, x, 0.001, train=False,
                          method=lambda m, x, t, train: m.get_semantic_ids(x, t, train))
        res = np.asarray(out.residuals)
        emb = np.asarray(out.embeddings)
        np.testing.assert_allclose(res[:, 1], res[:, 0] - emb[:, 0], atol=1e-5)
        np.testing.assert_allclose(res[:, 2], res[:, 1] - emb[:, 1], atol=1e-5)


class TestHRqVae:
    def _init(self, model, x, tags_emb, tags_idx, train):
        return model.init(rngs(), x, tags_emb, tags_idx, 0.2, train=train)

    def test_forward_with_tags(self):
        model = make_hrqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, L, 24))
        tags_idx = jnp.stack(
            [jax.random.randint(jax.random.key(i), (B,), 0, c) for i, c in enumerate(TAG_COUNTS)],
            axis=-1,
        )
        variables = self._init(model, x, tags_emb, tags_idx, train=False)
        out = model.apply(variables, x, tags_emb, tags_idx, 0.2, train=False)
        for name in ["loss", "reconstruction_loss", "rqvae_loss", "tag_align_loss",
                     "tag_pred_loss", "sem_id_uniqueness_loss"]:
            assert np.isfinite(float(getattr(out, name))), name
        assert 0.0 <= float(out.tag_pred_accuracy) <= 1.0
        assert out.tag_pred_loss_by_layer.shape == (L,)

    def test_forward_without_tags(self):
        model = make_hrqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, L, 24))
        tags_idx = jnp.zeros((B, L), jnp.int32)
        variables = self._init(model, x, tags_emb, tags_idx, train=False)
        out = model.apply(variables, x, None, None, 0.2, train=False)
        assert float(out.tag_align_loss) == 0.0
        assert float(out.tag_pred_loss) == 0.0

    def test_train_step_with_batch_stats(self):
        model = make_hrqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, L, 24))
        tags_idx = jnp.zeros((B, L), jnp.int32)
        variables = self._init(model, x, tags_emb, tags_idx, train=True)
        assert "batch_stats" in variables

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, tags_emb, tags_idx, 0.2, train=True,
                rngs={"gumbel": jax.random.key(1), "dropout": jax.random.key(2),
                      "mixup": jax.random.key(3)},
                mutable=["batch_stats"],
            )
            return out.loss

        g = jax.grad(loss_fn)(variables["params"])
        proj_g = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["tag_projector_0"], 0.0
        )
        pred_g = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["tag_predictor_0"], 0.0
        )
        assert proj_g > 0 and pred_g > 0

    def test_predict_tags_shapes(self):
        model = make_hrqvae()
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, L, 24))
        tags_idx = jnp.zeros((B, L), jnp.int32)
        variables = self._init(model, x, tags_emb, tags_idx, train=False)
        out = model.apply(variables, x, method=lambda m, x: m.predict_tags(x))
        assert out["predictions"].shape == (B, L)
        assert out["confidences"].shape == (B, L)
        # Sequence input
        xs = jax.random.normal(jax.random.key(7), (4, 5, F))
        out_seq = model.apply(variables, xs, method=lambda m, x: m.predict_tags(x))
        assert out_seq["predictions"].shape == (4, 5, L)
        conf = np.asarray(out_seq["confidences"])
        assert np.all(conf >= 0) and np.all(conf <= 1)

    def test_uniqueness_weight_double_applied(self):
        """Parity check: total includes w_u^2 * raw_penalty (see module docstring)."""
        model = make_hrqvae(sem_id_uniqueness_weight=2.0, tag_alignment_weight=0.0,
                            tag_prediction_weight=0.0)
        x = jnp.ones((4, F)) * 0.1  # identical rows -> guaranteed ID collisions
        variables = model.init(rngs(), x, None, None, 0.2, train=False)
        out = model.apply(variables, x, None, None, 0.2, train=False)
        # loss - recon - rq should equal w_u * uniq_loss where uniq_loss already
        # contains one factor of w_u.
        residual = float(out.loss) - float(out.reconstruction_loss) - float(out.rqvae_loss)
        np.testing.assert_allclose(residual, 2.0 * float(out.sem_id_uniqueness_loss), rtol=1e-5)


class TestUntaggedExtraLevels:
    """n_layers > len(tag_class_counts): extra quantization levels refine the
    residual without tag supervision (scales the ID space to catalogs larger
    than the tag hierarchy is deep; the reference always couples them 1:1)."""

    def _setup(self, n_layers=4):
        model = make_hrqvae(n_layers=n_layers)
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, L, 24))
        tags_idx = jnp.stack(
            [jax.random.randint(jax.random.key(i), (B,), 0, c)
             for i, c in enumerate(TAG_COUNTS)],
            axis=-1,
        )
        variables = model.init(rngs(), x, tags_emb, tags_idx, 0.2, train=False)
        return model, variables, x, tags_emb, tags_idx

    def test_forward_ids_wider_than_tags(self):
        model, variables, x, tags_emb, tags_idx = self._setup()
        assert model.n_tag_levels == L
        # Only L tag heads exist even though there are 4 quantize levels.
        heads = [k for k in variables["params"] if k.startswith("tag_predictor_")]
        assert sorted(heads) == [f"tag_predictor_{i}" for i in range(L)]
        out = model.apply(variables, x, tags_emb, tags_idx, 0.2, train=False)
        assert np.isfinite(float(out.loss))
        assert out.tag_pred_loss_by_layer.shape == (L,)
        ids = model.apply(
            variables, x,
            method=lambda m, x: m.get_semantic_ids(m.encode(x)).sem_ids,
        )
        assert ids.shape == (B, 4)

    def test_tag_losses_match_coupled_model_semantics(self):
        """Per-level tag losses are means over tag levels, so the scale is
        comparable with the coupled (n_layers == n_tags) model."""
        model, variables, x, tags_emb, tags_idx = self._setup()
        out = model.apply(variables, x, tags_emb, tags_idx, 0.2, train=False)
        np.testing.assert_allclose(
            float(out.tag_pred_loss),
            float(jnp.mean(out.tag_pred_loss_by_layer)), rtol=1e-6,
        )

    def test_predict_tags_from_ids_tag_levels_only(self):
        model, variables, x, tags_emb, tags_idx = self._setup()
        ids = model.apply(
            variables, x,
            method=lambda m, x: m.get_semantic_ids(m.encode(x)).sem_ids,
        )
        out = model.apply(
            variables, ids, method=lambda m, i: m.predict_tags_from_ids(i)
        )
        assert out["predictions"].shape == (B, L)
        out2 = model.apply(variables, x, method=lambda m, x: m.predict_tags(x))
        assert out2["predictions"].shape == (B, L)

    def test_tokenizer_concat_layout_width(self):
        from hidvae_tpu.tokenizer.h_semids import HSemanticIdTokenizer

        model, variables, x, _, _ = self._setup()
        tok = HSemanticIdTokenizer(
            model, variables, n_layers=4, codebook_size=K,
            tag_class_counts=list(TAG_COUNTS), use_concatenated_ids=True,
        )
        assert tok.sem_ids_dim == 4 + L
        ids = tok.precompute_corpus_ids(np.asarray(x))
        assert ids.shape == (B, 4 + L)
        # Semantic digits in [0, K), tag digits within their class counts.
        ids_np = np.asarray(ids)
        assert ids_np[:, :4].max() < K
        for t, c in enumerate(TAG_COUNTS):
            assert ids_np[:, 4 + t].max() < c

    def test_trailing_zero_counts_mark_untagged_levels(self):
        """Regression: the trainer pads tags to n_layers with -1 and derives a
        0 class count for the extra levels (train/hidvae.py:335), so the model
        receives e.g. [33, 257, 2049, 0] — the trailing 0 must mean "untagged
        level", not a zero-width tag head (which crashed variance-scaling init
        with ZeroDivisionError on the first xl4 run)."""
        padded = list(TAG_COUNTS) + [0]
        model = make_hrqvae(n_layers=4, tag_class_counts=padded)
        assert model.n_tag_levels == L
        assert model.resolved_tag_class_counts == list(TAG_COUNTS)
        x = jax.random.normal(jax.random.key(5), (B, F))
        tags_emb = jax.random.normal(jax.random.key(6), (B, 4, 24))
        tags_idx = np.full((B, 4), -1, np.int32)
        for i, c in enumerate(TAG_COUNTS):
            tags_idx[:, i] = np.asarray(
                jax.random.randint(jax.random.key(i), (B,), 0, c)
            )
        tags_idx = jnp.asarray(tags_idx)
        variables = model.init(rngs(), x, tags_emb, tags_idx, 0.2, train=False)
        heads = [k for k in variables["params"] if k.startswith("tag_predictor_")]
        assert sorted(heads) == [f"tag_predictor_{i}" for i in range(L)]
        out = model.apply(variables, x, tags_emb, tags_idx, 0.2, train=False)
        assert np.isfinite(float(out.loss))


class TestMixedPrecision:
    """Stage-1 AMP: bf16 matmul compute, fp32 params/quantizer/losses
    (ref train_hidvae.py:77-80, autocast at :702)."""

    def test_hrqvae_bf16_forward_backward(self):
        model = make_hrqvae(dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(10), (B, F))
        te = jax.random.normal(jax.random.key(11), (B, L, 24))
        ti = jnp.zeros((B, L), jnp.int32)
        variables = model.init(rngs(), x, te, ti, 0.2, train=True)
        # Params stay fp32 under AMP.
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32, leaf.dtype

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                x, te, ti, 0.2, train=True, rngs=rngs(), mutable=["batch_stats"],
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert loss.dtype == jnp.float32
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_bf16_ids_match_tokenizer_path(self):
        """The quantizer runs fp32 even under AMP, so eval IDs must be
        identical between direct apply and the corpus-sweep path."""
        from hidvae_tpu.tokenizer.h_semids import HSemanticIdTokenizer

        model = make_hrqvae(dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(12), (B, F))
        te = jax.random.normal(jax.random.key(13), (B, L, 24))
        ti = jnp.zeros((B, L), jnp.int32)
        variables = model.init(rngs(), x, te, ti, 0.2, train=True)
        direct = model.apply(
            variables,
            model.apply(variables, x, method=HRqVae.encode),
            gumbel_t=0.001, train=False,
            method=HRqVae.get_semantic_ids,
        ).sem_ids
        tok = HSemanticIdTokenizer(
            model, variables, n_layers=L, codebook_size=K,
            tag_class_counts=list(TAG_COUNTS),
        )
        corpus = tok.precompute_corpus_ids(np.asarray(x))
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(corpus)[:, :L])
