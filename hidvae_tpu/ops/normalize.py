"""Normalization primitives.

Parity: reference modules/normalize.py:7-32 (l2norm / L2NormalizationLayer /
RMSNorm). Pure functions here; the learned-scale RMSNorm module lives in
hidvae_tpu.models.layers.
"""

import jax.numpy as jnp
from jax import lax


def l2norm(x, axis=-1, eps=1e-12):
    """L2-normalize along `axis`.

    Matches torch.nn.functional.normalize semantics (denominator clamped to eps):
    x / max(||x||_2, eps).
    """
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def rms_norm(x, weight=None, eps=1e-6):
    """RMS normalization computed in fp32 then cast back (ref normalize.py:21-32)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    y = y.astype(dtype)
    if weight is not None:
        y = y * weight
    return y
