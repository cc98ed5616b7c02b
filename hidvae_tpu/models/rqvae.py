"""Plain residual-quantized VAE (RQ-VAE) tokenizer model.

Parity: reference modules/rqvae.py (RqVae). Encoder MLP -> L x {quantize,
subtract residual} -> decoder on summed codebook embeddings; reconstruction
split into l2-normalized dense dims + categorical logits; debug stats
`embs_norm` and `p_unique_ids`.

TPU design: pure flax.linen module; the L-level loop is unrolled at trace time
(n_layers is static and small) so XLA fuses the whole residual cascade into one
program; k-means init is an explicit pass (see hidvae_tpu.train.init).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from hidvae_tpu.models.layers import MLP
from hidvae_tpu.models.losses import (
    categorical_reconstruction_loss,
    reconstruction_loss,
)
from hidvae_tpu.models.quantize import Quantize, QuantizeForwardMode
from hidvae_tpu.ops.distances import DistanceMode
from hidvae_tpu.ops.normalize import l2norm


@struct.dataclass
class RqVaeOutput:
    embeddings: jax.Array     # [B, L, D] per-level quantized embeddings
    residuals: jax.Array      # [B, L, D] per-level residual inputs
    sem_ids: jax.Array        # [B, L] int32
    quantize_loss: jax.Array  # [B]


@struct.dataclass
class RqVaeComputedLosses:
    loss: jax.Array                 # scalar
    reconstruction_loss: jax.Array  # scalar (batch mean)
    rqvae_loss: jax.Array           # scalar (batch mean)
    embs_norm: jax.Array            # [B, L] per-level embedding norms
    p_unique_ids: jax.Array         # scalar fraction of unique ID tuples


def p_unique_ids_stat(sem_ids):
    """Fraction of distinct ID tuples in the batch (ref rqvae.py:153-157).

    Counts rows with no identical row at a larger index (i.e. last occurrences),
    which equals the number of distinct tuples, divided by B.
    """
    b = sem_ids.shape[0]
    eq = jnp.all(sem_ids[:, None, :] == sem_ids[None, :, :], axis=-1)
    upper = jnp.triu(eq, k=1)
    no_later_dup = ~jnp.any(upper, axis=1)
    return jnp.sum(no_later_dup) / b


class RqVae(nn.Module):
    """Residual quantizer VAE (ref modules/rqvae.py:37-165)."""

    input_dim: int
    embed_dim: int
    hidden_dims: Sequence[int]
    codebook_size: int
    codebook_normalize: bool = False
    codebook_sim_vq: bool = False
    codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    codebook_distance: DistanceMode = DistanceMode.L2
    n_layers: int = 3
    commitment_weight: float = 0.25
    n_cat_features: int = 18
    # AMP compute dtype for the encoder/decoder matmuls (ref train_rqvae.py
    # amp/mixed_precision_type); quantizer + losses stay fp32.
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            Quantize(
                embed_dim=self.embed_dim,
                n_embed=self.codebook_size,
                forward_mode=self.codebook_mode,
                distance_mode=self.codebook_distance,
                # Only level 0 normalizes its codebook (ref rqvae.py:70).
                codebook_normalize=(i == 0 and self.codebook_normalize),
                sim_vq=self.codebook_sim_vq,
                commitment_weight=self.commitment_weight,
                name=f"quantize_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.encoder = MLP(
            hidden_dims=self.hidden_dims,
            out_dim=self.embed_dim,
            normalize=self.codebook_normalize,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = MLP(
            hidden_dims=list(self.hidden_dims)[::-1],
            out_dim=self.input_dim,
            normalize=True,
            dtype=self.dtype,
            name="decoder",
        )

    def encode(self, x):
        # fp32 into the quantizer (argmin agreement across train/eval/kernel).
        return self.encoder(x).astype(jnp.float32)

    def decode(self, x):
        return self.decoder(x)

    def stacked_codebooks(self):
        """Effective per-level codebooks [L, K, D] (post SimVQ/normalize), the
        input to the fused Pallas assignment kernel (hidvae_tpu.ops.pallas)."""
        return jnp.stack([layer.codebook() for layer in self.layers])

    def get_semantic_ids(self, x, gumbel_t: float = 0.001, train: bool = False) -> RqVaeOutput:
        """Residual quantization cascade (ref rqvae.py:114-138)."""
        res = self.encode(x)
        embs, residuals, sem_ids, q_loss = [], [], [], 0.0
        for layer in self.layers:
            residuals.append(res)
            out = layer(res, temperature=gumbel_t, train=train)
            q_loss = q_loss + out.loss
            res = res - out.embeddings
            embs.append(out.embeddings)
            sem_ids.append(out.ids)
        return RqVaeOutput(
            embeddings=jnp.stack(embs, axis=-2),      # [B, L, D]
            residuals=jnp.stack(residuals, axis=-2),  # [B, L, D]
            sem_ids=jnp.stack(sem_ids, axis=-1),      # [B, L]
            quantize_loss=q_loss,
        )

    def reconstruct(self, embeddings_sum):
        """Decode + dense/categorical split (ref rqvae.py:145-146)."""
        x_hat = self.decode(embeddings_sum)
        if self.n_cat_features > 0:
            x_hat = jnp.concatenate(
                [
                    l2norm(x_hat[..., : -self.n_cat_features], axis=-1),
                    x_hat[..., -self.n_cat_features:],
                ],
                axis=-1,
            )
        else:
            x_hat = l2norm(x_hat, axis=-1)
        return x_hat

    def __call__(self, x, gumbel_t: float, train: bool = False) -> RqVaeComputedLosses:
        """Training/eval forward on item features x: [B, input_dim]
        (ref rqvae.py:140-165)."""
        quantized = self.get_semantic_ids(x, gumbel_t, train=train)
        x_hat = self.reconstruct(jnp.sum(quantized.embeddings, axis=-2))
        if self.n_cat_features > 0:
            recon = categorical_reconstruction_loss(x_hat, x, self.n_cat_features)
        else:
            recon = reconstruction_loss(x_hat, x)
        rq_loss = quantized.quantize_loss
        loss = jnp.mean(recon + rq_loss)
        embs_norm = jnp.linalg.norm(quantized.embeddings, axis=-1)  # [B, L]
        return RqVaeComputedLosses(
            loss=loss,
            reconstruction_loss=jnp.mean(recon),
            rqvae_loss=jnp.mean(rq_loss),
            embs_norm=embs_norm,
            p_unique_ids=jax.lax.stop_gradient(p_unique_ids_stat(quantized.sem_ids)),
        )
