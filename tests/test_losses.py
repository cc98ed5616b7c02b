"""Unit tests for hidvae_tpu.models.losses against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np

from hidvae_tpu.models.losses import (
    categorical_reconstruction_loss,
    quantize_loss,
    reconstruction_loss,
    tag_alignment_loss,
    tag_prediction_loss,
    uniqueness_loss,
)


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestReconstruction:
    def test_squared_error_sum(self):
        x = jnp.array([[1.0, 2.0], [0.0, 0.0]])
        x_hat = jnp.array([[2.0, 4.0], [1.0, 1.0]])
        np.testing.assert_allclose(np.asarray(reconstruction_loss(x_hat, x)), [5.0, 2.0])

    def test_categorical_split(self):
        # 2 dense dims + 2 categorical dims.
        x = jnp.array([[1.0, 0.0, 1.0, 0.0]])
        x_hat = jnp.array([[0.5, 0.5, 2.0, -2.0]])
        dense = (0.5 ** 2) * 2
        z = np.array([2.0, -2.0])
        y = np.array([1.0, 0.0])
        bce = (np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))).sum()
        got = float(categorical_reconstruction_loss(x_hat, x, n_cat_feats=2)[0])
        np.testing.assert_allclose(got, dense + bce, rtol=1e-4)

    def test_zero_cats_falls_back(self):
        x = jax.random.normal(jax.random.key(0), (4, 8))
        xh = jax.random.normal(jax.random.key(1), (4, 8))
        np.testing.assert_allclose(
            np.asarray(categorical_reconstruction_loss(xh, x, 0)),
            np.asarray(reconstruction_loss(xh, x)),
        )


class TestQuantizeLoss:
    def test_value(self):
        q = jnp.array([[1.0, 0.0]])
        v = jnp.array([[0.0, 1.0]])
        # emb + 0.5 * commit = 2 + 0.5*2 = 3
        np.testing.assert_allclose(np.asarray(quantize_loss(q, v, 0.5)), [3.0])

    def test_gradient_split(self):
        # d/dv of ||sg(q)-v||^2 = -2(q-v); commitment term has no v-grad.
        q = jnp.array([[1.0, 2.0]])
        v = jnp.array([[0.0, 0.0]])
        gv = jax.grad(lambda v: jnp.sum(quantize_loss(q, v, 0.25)))(v)
        np.testing.assert_allclose(np.asarray(gv), [[-2.0, -4.0]])
        gq = jax.grad(lambda q: jnp.sum(quantize_loss(q, v, 0.25)))(q)
        np.testing.assert_allclose(np.asarray(gq), [[0.5, 1.0]])  # 0.25 * 2(q-v)


class TestAlignment:
    def test_infonce_manual(self):
        rng = np.random.RandomState(0)
        cb = rng.randn(4, 8).astype(np.float32)
        tg = rng.randn(4, 8).astype(np.float32)
        cbn = cb / np.linalg.norm(cb, axis=-1, keepdims=True)
        tgn = tg / np.linalg.norm(tg, axis=-1, keepdims=True)
        logits = cbn @ tgn.T / 0.1
        lp = np.log(np_softmax(logits))
        expected = -np.mean(np.diag(lp))
        layer_idx, w = 2, 0.5
        expected *= w * (1.0 / (layer_idx * 0.5 + 1.0))
        got = float(tag_alignment_loss(jnp.array(cb), jnp.array(tg), layer_idx, w, 0.1))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_perfect_alignment_low_loss(self):
        x = jax.random.normal(jax.random.key(0), (16, 8))
        aligned = tag_alignment_loss(x, x, 0, 1.0, 0.1)
        shuffled = tag_alignment_loss(x, jnp.roll(x, 1, axis=0), 0, 1.0, 0.1)
        assert float(aligned) < float(shuffled)


class TestUniqueness:
    def test_no_collisions_zero(self):
        ids = jnp.array([[0, 1], [1, 2], [2, 3]])
        feats = jax.random.normal(jax.random.key(0), (3, 8))
        assert float(uniqueness_loss(ids, feats, margin=0.0, weight=1.0)) == 0.0

    def test_collision_penalized(self):
        ids = jnp.array([[0, 1], [0, 1], [2, 3]])
        f = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # colliding pair identical
        # cos sim of the colliding pair = 1; relu(1 - 0.5) = 0.5; weight 2 -> 1.0
        got = float(uniqueness_loss(ids, f, margin=0.5, weight=2.0))
        np.testing.assert_allclose(got, 1.0, rtol=1e-5)

    def test_below_margin_no_penalty(self):
        ids = jnp.array([[0, 1], [0, 1]])
        f = jnp.array([[1.0, 0.0], [0.0, 1.0]])  # orthogonal -> cos 0 < margin
        assert float(uniqueness_loss(ids, f, margin=0.5, weight=1.0)) == 0.0

    def test_batch_of_one(self):
        ids = jnp.array([[0, 1]])
        f = jnp.ones((1, 4))
        assert float(uniqueness_loss(ids, f)) == 0.0


class TestTagPrediction:
    def test_eval_ce_matches_manual(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(8, 5).astype(np.float32)
        targets = rng.randint(0, 5, size=(8,))
        out = tag_prediction_loss(
            jnp.array(logits), jnp.array(targets), layer_idx=0,
            use_focal_loss=False, use_mixup=False, training=False,
        )
        # CE with label smoothing 0.05 + 0.05 * KL(uniform || probs)
        ls = 0.05
        one_hot = np.eye(5)[targets] * (1 - ls) + ls / 5
        lp = np.log(np_softmax(logits))
        ce = (-(one_hot * lp).sum(-1)).mean()
        probs = np_softmax(logits)
        kl = np.mean(((1 / 5) * (np.log(1 / 5) - np.log(probs + 1e-8))).sum(-1))
        np.testing.assert_allclose(float(out.loss), ce + 0.05 * kl, rtol=1e-4)

    def test_accuracy(self):
        logits = jnp.array([[5.0, 0.0], [0.0, 5.0], [5.0, 0.0], [0.0, 5.0]])
        targets = jnp.array([0, 1, 1, 1])
        out = tag_prediction_loss(logits, targets, training=False, use_mixup=False)
        np.testing.assert_allclose(float(out.accuracy), 0.75)

    def test_invalid_targets_masked(self):
        logits = jnp.array([[5.0, 0.0], [0.0, 5.0]])
        out_full = tag_prediction_loss(logits, jnp.array([0, -1]), training=False, use_mixup=False)
        out_one = tag_prediction_loss(logits[:1], jnp.array([0]), training=False, use_mixup=False)
        # KL term differs between batches, so compare accuracy and finiteness.
        np.testing.assert_allclose(float(out_full.accuracy), float(out_one.accuracy))
        assert np.isfinite(float(out_full.loss))

    def test_all_invalid_returns_zero(self):
        logits = jax.random.normal(jax.random.key(0), (4, 3))
        out = tag_prediction_loss(logits, jnp.array([-1, -1, -1, -1]), training=False)
        assert float(out.loss) == 0.0 and float(out.accuracy) == 0.0

    def test_focal_downweights_easy(self):
        easy = jnp.array([[10.0, -10.0]])
        hard = jnp.array([[0.1, 0.0]])
        t = jnp.array([0])
        le = tag_prediction_loss(easy, t, use_focal_loss=True, training=False).loss
        lh = tag_prediction_loss(hard, t, use_focal_loss=True, training=False).loss
        assert float(le) < float(lh)

    def test_focal_with_class_counts(self):
        logits = jax.random.normal(jax.random.key(0), (16, 4))
        targets = jnp.zeros((16,), jnp.int32)
        counts = jnp.array([100, 10, 5, 1])
        out = tag_prediction_loss(
            logits, targets, use_focal_loss=True, class_counts=counts, training=False
        )
        assert np.isfinite(float(out.loss))

    def test_mixup_training_path_runs(self):
        logits = jax.random.normal(jax.random.key(0), (8, 4))
        targets = jnp.array([0, 1, 2, 3, 0, 1, 2, -1])
        out = tag_prediction_loss(
            logits, targets, use_mixup=True, training=True, rng=jax.random.key(1)
        )
        assert np.isfinite(float(out.loss))

    def test_grad_flows(self):
        targets = jnp.array([0, 1, 2])
        g = jax.grad(
            lambda l: tag_prediction_loss(l, targets, use_focal_loss=True, training=False).loss
        )(jax.random.normal(jax.random.key(0), (3, 4)))
        assert float(jnp.sum(jnp.abs(g))) > 0
