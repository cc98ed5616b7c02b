"""Fused residual-quantization Pallas kernel (TPU).

The stage-1 hot path outside training is the corpus sweep
(`precompute_corpus_ids`, SURVEY.md §3.4): encode every item, then for L
codebook levels compute an L2-distance matrix, argmin, gather the code vector,
and subtract. In plain XLA each level materializes a [B, K] distance matrix in
HBM between fused regions; this kernel keeps the whole L-level cascade in VMEM
per batch tile — one MXU matmul per level for the cross term, argmin on the
VPU, and a one-hot matmul (MXU) instead of a dynamic row gather for the code
lookup.

Replaces (capability-wise) the reference's only accelerator kernel, the Triton
padded->jagged converter (ops/triton/jagged.py) — which a TPU design does not
need — with a kernel where the FLOPs actually are.

Shapes: x [B, D], codebooks [L, K, D] (already out-projected/normalized).
Outputs: ids [B, L] int32, quantized-sum [B, D] float32.
Constraints: D and K should be multiples of 128 lanes are NOT required —
Mosaic handles small D (32) by padding sublanes; K=256 fits lanes naturally.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256


def _rq_kernel(x_ref, cb_ref, ids_ref, qsum_ref, *, n_levels: int, n_embed: int):
    x = x_ref[...].astype(jnp.float32)            # [TB, D]
    qsum = jnp.zeros_like(x)
    res = x
    for level in range(n_levels):
        cb = cb_ref[level].astype(jnp.float32)    # [K, D]
        x2 = jnp.sum(res * res, axis=-1, keepdims=True)            # [TB, 1]
        c2 = jnp.sum(cb * cb, axis=-1)[None, :]                    # [1, K]
        xc = jax.lax.dot_general(
            res, cb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                          # [TB, K]
        dist = x2 + c2 - 2.0 * xc
        ids = jnp.argmin(dist, axis=-1).astype(jnp.int32)          # [TB]
        one_hot = (
            ids[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, n_embed), 1)
        ).astype(jnp.float32)                                      # [TB, K]
        emb = jax.lax.dot_general(
            one_hot, cb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                          # [TB, D]
        ids_ref[:, level] = ids
        qsum = qsum + emb
        res = res - emb
    qsum_ref[...] = qsum


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def rq_assign(x, codebooks, *, block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused L-level residual quantization.

    x: [B, D] float; codebooks: [L, K, D] float (post-transform).
    Returns (ids [B, L] int32, quantized_sum [B, D] float32).
    B is padded to a block multiple internally.
    """
    b, d = x.shape
    n_levels, n_embed, d2 = codebooks.shape
    assert d == d2, (d, d2)

    block_b = min(block_b, max(8, b))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bp = x.shape[0]

    grid = (bp // block_b,)
    ids, qsum = pl.pallas_call(
        functools.partial(_rq_kernel, n_levels=n_levels, n_embed=n_embed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels, n_embed, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, n_levels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n_levels), jnp.int32),
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), codebooks.astype(jnp.float32))
    if pad:
        ids = ids[:b]
        qsum = qsum[:b]
    return ids, qsum


def rq_assign_reference(x, codebooks):
    """Pure-XLA reference implementation (also the CPU path)."""
    res = x.astype(jnp.float32)
    qsum = jnp.zeros_like(res)
    ids = []
    for level in range(codebooks.shape[0]):
        cb = codebooks[level].astype(jnp.float32)
        x2 = jnp.sum(res * res, axis=-1, keepdims=True)
        c2 = jnp.sum(cb * cb, axis=-1)[None, :]
        dist = x2 + c2 - 2.0 * jnp.dot(
            res, cb.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        emb = jnp.take(cb, idx, axis=0)
        ids.append(idx)
        qsum = qsum + emb
        res = res - emb
    return jnp.stack(ids, axis=-1), qsum


def rq_assign_auto(x, codebooks, *, block_b: int = DEFAULT_BLOCK_B):
    """Dispatch to the Pallas kernel on TPU, XLA reference elsewhere."""
    if jax.default_backend() == "tpu":
        return rq_assign(x, codebooks, block_b=block_b)
    return rq_assign_reference(x, codebooks)
