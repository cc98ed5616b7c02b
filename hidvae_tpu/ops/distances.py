"""Codebook distance + nearest-code assignment.

Parity: the distance/argmin inside reference modules/quantize.py:108-122
(expanded L2 distance ||x||^2 + ||c||^2 - 2 x c^T, or negative cosine), built
around a single MXU matmul. `nearest_code` is the quantizer hot path; on TPU it
can be served by the fused Pallas kernel in hidvae_tpu.ops.pallas.rq_kernels
(argmin fused with the distance matmul, no [B, K] HBM materialization).
"""

from enum import Enum

import jax
import jax.numpy as jnp

from hidvae_tpu.ops.normalize import l2norm


class DistanceMode(Enum):
    L2 = 1
    COSINE = 2


def l2_distance(x, codebook):
    """Expanded squared-L2 distance matrix [B, K] (ref quantize.py:108-113).

    x: [B, D], codebook: [K, D]. The cross term rides the MXU; the squared-norm
    terms are rank-1 broadcasts XLA fuses into the same loop.
    """
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)            # [B, 1]
    c2 = jnp.sum(jnp.square(codebook), axis=-1)[None, :]           # [1, K]
    # Full-precision MXU passes: assignment argmin must not flip on bf16-pass
    # rounding (keeps training/eval/Pallas paths in exact agreement).
    xc = jnp.dot(x, codebook.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return x2 + c2 - 2.0 * xc


def cosine_distance(x, codebook):
    """Negative cosine similarity [B, K] (ref quantize.py:114-118).

    Note the reference normalizes x per-row but scales the x@C^T product by the
    *column* norms of C^T post-hoc, which is mathematically the same as
    normalizing codebook rows first; we do the latter.
    """
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    cn = l2norm(codebook, axis=-1)
    return -jnp.dot(xn, cn.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)


def compute_distance(x, codebook, mode: DistanceMode):
    if mode == DistanceMode.L2:
        return l2_distance(x, codebook)
    if mode == DistanceMode.COSINE:
        return cosine_distance(x, codebook)
    raise ValueError(f"Unsupported distance mode {mode}")


def nearest_code(x, codebook, mode: DistanceMode = DistanceMode.L2):
    """Hard assignment ids [B] = argmin_k dist(x, codebook_k) (ref quantize.py:122)."""
    dist = compute_distance(x, codebook, mode)
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)
