"""Shared flax.linen building blocks.

Parity targets: reference modules/encoder.py (MLP), modules/normalize.py
(RMSNorm / L2NormalizationLayer as modules).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hidvae_tpu.ops.normalize import l2norm, rms_norm


class RMSNorm(nn.Module):
    """RMSNorm with learned scale (ref modules/normalize.py:21-32)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, weight=weight, eps=self.eps)


class MLP(nn.Module):
    """Bias-free Linear stack with SiLU + optional dropout and L2-norm output
    (ref modules/encoder.py:7-36)."""

    hidden_dims: Sequence[int]
    out_dim: int
    dropout: float = 0.0
    normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.hidden_dims) + [self.out_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, use_bias=False, name=f"dense_{i}", dtype=self.dtype)(x)
            if i != len(dims) - 1:
                x = nn.silu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.normalize:
            # Normalize in fp32 regardless of compute dtype: the quantizer's
            # distance argmin downstream is precision-sensitive.
            x = l2norm(x.astype(jnp.float32), axis=-1)
        return x
