"""One residual-quantization level: codebook distance, hard assignment, and a
straight-through estimator.

Parity: reference modules/quantize.py:48-154 (Quantize). Modes:
  * GUMBEL_SOFTMAX — soft mixture weights @ codebook (ref :125-130)
  * STE            — x + sg(emb - x) (ref :131-133)
  * ROTATION_TRICK — Householder-style rotation transform (ref :34-45, :134-140,
                     eq. 4.2 of arXiv:2410.06424)
plus optional SimVQ out-projection (arXiv:2411.02038) and codebook L2
normalization (ref :70-73).

TPU redesign: k-means codebook init is an explicit pre-training pass (see
hidvae_tpu.ops.kmeans + trainers), not a lazy first-forward side effect
(ref :103-104) — lazy mutation is incompatible with a pure jitted step. The
eval-path hard assignment is served by the fused Pallas argmin kernel on TPU
(hidvae_tpu.ops.pallas). PRNG for Gumbel noise is threaded via flax's 'gumbel'
rng collection.
"""

from enum import Enum
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hidvae_tpu.models.losses import quantize_loss
from hidvae_tpu.ops.distances import DistanceMode, compute_distance
from hidvae_tpu.ops.gumbel import gumbel_softmax_sample
from hidvae_tpu.ops.normalize import l2norm


class QuantizeForwardMode(Enum):
    GUMBEL_SOFTMAX = 1
    STE = 2
    ROTATION_TRICK = 3


class QuantizeOutput(NamedTuple):
    embeddings: jax.Array  # [B, D] straight-through quantized embedding
    ids: jax.Array         # [B] int32 hard assignment
    loss: jax.Array        # [B] commitment + codebook loss


def rotation_trick_transform(u, q, e):
    """Rotate e from the direction of u onto q (ref quantize.py:34-45).

    u, q: unit vectors [B, D] (treated as constants); e: [B, D] carries grad.
    out = e - 2 (e.w) w + 2 (e.u) q   with  w = normalize(u + q).
    """
    u = jax.lax.stop_gradient(u)
    q = jax.lax.stop_gradient(q)
    w = jax.lax.stop_gradient(l2norm(u + q, axis=-1, eps=1e-6))
    ew = jnp.sum(e * w, axis=-1, keepdims=True)
    eu = jnp.sum(e * u, axis=-1, keepdims=True)
    return e - 2.0 * ew * w + 2.0 * eu * q


class Quantize(nn.Module):
    """A single codebook level (ref modules/quantize.py:48-154)."""

    embed_dim: int
    n_embed: int
    codebook_normalize: bool = False
    sim_vq: bool = False
    commitment_weight: float = 0.25
    forward_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    distance_mode: DistanceMode = DistanceMode.L2

    def setup(self):
        # Uniform [0, 1) init matching nn.init.uniform_ (ref quantize.py:86-89);
        # normally overwritten by the explicit k-means init pass.
        self.embedding = self.param(
            "embedding",
            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32),
            (self.n_embed, self.embed_dim),
        )
        if self.sim_vq:
            self.out_proj = nn.Dense(self.embed_dim, use_bias=False, name="out_proj")

    def codebook(self):
        """Effective codebook after SimVQ projection / normalization (ref :106)."""
        cb = self.embedding
        if self.sim_vq:
            cb = self.out_proj(cb)
        if self.codebook_normalize:
            cb = l2norm(cb, axis=-1)
        return cb

    def get_item_embeddings(self, ids):
        return jnp.take(self.codebook(), ids, axis=0)

    def __call__(self, x, temperature, train: bool = False) -> QuantizeOutput:
        codebook = self.codebook()
        dist = compute_distance(x, codebook, self.distance_mode)
        ids = jnp.argmin(jax.lax.stop_gradient(dist), axis=-1).astype(jnp.int32)

        if train:
            if self.forward_mode == QuantizeForwardMode.GUMBEL_SOFTMAX:
                rng = self.make_rng("gumbel")
                weights = gumbel_softmax_sample(rng, -dist, temperature)
                emb = jnp.dot(weights, codebook, preferred_element_type=jnp.float32)
                emb_out = emb
            elif self.forward_mode == QuantizeForwardMode.STE:
                emb = jnp.take(codebook, ids, axis=0)
                emb_out = x + jax.lax.stop_gradient(emb - x)
            elif self.forward_mode == QuantizeForwardMode.ROTATION_TRICK:
                emb = jnp.take(codebook, ids, axis=0)
                emb_out = rotation_trick_transform(
                    x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8),
                    emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8),
                    x,
                )
            else:
                raise ValueError(f"Unsupported forward mode {self.forward_mode}")
            loss = quantize_loss(x, emb, self.commitment_weight)
        else:
            emb_out = jnp.take(codebook, ids, axis=0)
            loss = quantize_loss(x, emb_out, self.commitment_weight)

        return QuantizeOutput(embeddings=emb_out, ids=ids, loss=loss)
