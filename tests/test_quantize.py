"""Tests for the Quantize layer: assignment parity, straight-through gradients,
rotation trick, and the RQ-VAE / HRqVae forward passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.models.quantize import (
    Quantize,
    QuantizeForwardMode,
    rotation_trick_transform,
)


def make_layer(mode, **kw):
    return Quantize(embed_dim=8, n_embed=16, forward_mode=mode, **kw)


def init_and_apply(layer, x, train, temperature=0.5, rngs_extra=None):
    rngs = {"params": jax.random.key(0)}
    variables = layer.init(
        {**rngs, "gumbel": jax.random.key(1)}, x, temperature, train=train
    )
    call_rngs = {"gumbel": jax.random.key(2)}
    out = layer.apply(variables, x, temperature, train=train, rngs=call_rngs)
    return variables, out


class TestAssignment:
    def test_ids_match_numpy_argmin(self):
        layer = make_layer(QuantizeForwardMode.STE)
        x = jax.random.normal(jax.random.key(3), (32, 8))
        variables, out = init_and_apply(layer, x, train=False)
        cb = np.asarray(variables["params"]["embedding"])
        dist = ((np.asarray(x)[:, None] - cb[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(out.ids), dist.argmin(-1))

    def test_eval_emb_is_codebook_row(self):
        layer = make_layer(QuantizeForwardMode.STE)
        x = jax.random.normal(jax.random.key(3), (4, 8))
        variables, out = init_and_apply(layer, x, train=False)
        cb = np.asarray(variables["params"]["embedding"])
        np.testing.assert_allclose(np.asarray(out.embeddings), cb[np.asarray(out.ids)], rtol=1e-6)

    def test_codebook_normalize(self):
        layer = make_layer(QuantizeForwardMode.STE, codebook_normalize=True)
        x = jax.random.normal(jax.random.key(3), (4, 8))
        _, out = init_and_apply(layer, x, train=False)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.embeddings), axis=-1), 1.0, rtol=1e-5
        )


class TestStraightThrough:
    def test_ste_value_and_gradient(self):
        layer = make_layer(QuantizeForwardMode.STE)
        x = jax.random.normal(jax.random.key(3), (4, 8))
        variables, out = init_and_apply(layer, x, train=True)
        cb = np.asarray(variables["params"]["embedding"])
        np.testing.assert_allclose(np.asarray(out.embeddings), cb[np.asarray(out.ids)], rtol=1e-6)

        # Gradient of sum(embeddings) wrt x must be identity-like (passthrough).
        def f(x):
            o = layer.apply(variables, x, 0.5, train=True, rngs={"gumbel": jax.random.key(0)})
            return jnp.sum(o.embeddings)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)), rtol=1e-6)

    def test_gumbel_soft_mixture(self):
        layer = make_layer(QuantizeForwardMode.GUMBEL_SOFTMAX)
        x = jax.random.normal(jax.random.key(3), (4, 8))
        variables, out = init_and_apply(layer, x, train=True)

        # Gradient wrt codebook must be nonzero (soft mixture path).
        def f(params):
            o = layer.apply({"params": params}, x, 0.5, train=True,
                            rngs={"gumbel": jax.random.key(2)})
            return jnp.sum(o.embeddings ** 2)

        g = jax.grad(f)(variables["params"])
        assert float(jnp.sum(jnp.abs(g["embedding"]))) > 0

    def test_rotation_trick_output_close_to_codebook(self):
        layer = make_layer(QuantizeForwardMode.ROTATION_TRICK)
        x = jax.random.normal(jax.random.key(3), (16, 8))
        variables, out = init_and_apply(layer, x, train=True)
        cb = np.asarray(variables["params"]["embedding"])
        target = cb[np.asarray(out.ids)]
        # The rotation maps x's direction onto the codebook direction, scaled by
        # ||x||: out/||out|| should match target/||target||.
        got_dir = np.asarray(out.embeddings)
        got_dir = got_dir / np.linalg.norm(got_dir, axis=-1, keepdims=True)
        tgt_dir = target / np.linalg.norm(target, axis=-1, keepdims=True)
        np.testing.assert_allclose(got_dir, tgt_dir, atol=1e-4)


class TestRotationTransform:
    def test_maps_u_to_q(self):
        rng = np.random.RandomState(0)
        u = rng.randn(8, 4).astype(np.float32)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        q = rng.randn(8, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        out = rotation_trick_transform(jnp.array(u), jnp.array(q), jnp.array(u))
        np.testing.assert_allclose(np.asarray(out), q, atol=1e-5)

    def test_preserves_norm(self):
        rng = np.random.RandomState(1)
        e = rng.randn(8, 4).astype(np.float32)
        u = e / np.linalg.norm(e, axis=-1, keepdims=True)
        q = rng.randn(8, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        out = rotation_trick_transform(jnp.array(u), jnp.array(q), jnp.array(e))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(e, axis=-1),
            rtol=1e-4,
        )

    def test_gradient_flows_through_e(self):
        u = jnp.array([[1.0, 0.0]])
        q = jnp.array([[0.0, 1.0]])
        g = jax.grad(lambda e: jnp.sum(rotation_trick_transform(u, q, e)))(jnp.array([[1.0, 0.0]]))
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestSimVq:
    def test_sim_vq_projects(self):
        layer = make_layer(QuantizeForwardMode.STE, sim_vq=True)
        x = jax.random.normal(jax.random.key(3), (4, 8))
        variables, out = init_and_apply(layer, x, train=False)
        assert "out_proj" in variables["params"]
        assert out.embeddings.shape == (4, 8)
