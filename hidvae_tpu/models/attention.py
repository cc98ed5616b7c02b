"""Multi-head attention with dense padded masking.

Capability parity: reference modules/transformer/attention.py (Attend /
MultiHeadAttention). The reference batches ragged user histories as
NestedTensors via a Triton padded->jagged kernel (ops/triton/jagged.py) because
PyTorch SDPA wants jagged inputs; on TPU the idiomatic equivalent is dense
padded attention with boolean key masks — XLA fuses the mask into the softmax,
and the jagged<->padded conversions disappear entirely (SURVEY.md §2.1).

Fused QKV projection for self-attention and split Q / KV for cross-attention
(ref attention.py:169-175), final output projection (ref :179).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def dot_product_attention(q, k, v, *, mask=None, dtype=jnp.float32):
    """q: [B, H, Nq, Dh]; k, v: [B, H, Nk, Dh]; mask broadcastable to
    [B, H, Nq, Nk] (True = attend). Softmax in fp32."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(dtype)


def make_attention_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool = False,
    kv_padding_mask=None,
):
    """Build a [B or 1, 1, Nq, Nk] boolean attention mask."""
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((q_len, kv_len), bool))[None, None]
    if kv_padding_mask is not None:
        pad = kv_padding_mask[:, None, None, :]  # [B, 1, 1, Nk]
        mask = pad if mask is None else (mask & pad)
    return mask


class MultiHeadAttention(nn.Module):
    """MHA with fused projections (ref attention.py:148-232)."""

    d_out: int
    num_heads: int
    cross_attn: bool = False
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        x_kv=None,
        *,
        kv_padding_mask=None,
        is_causal: bool = True,
    ):
        assert self.d_out % self.num_heads == 0
        head_dim = self.d_out // self.num_heads

        if self.cross_attn:
            assert x_kv is not None, "cross attention requires x_kv"
            q = nn.Dense(self.d_out, use_bias=self.qkv_bias, name="q", dtype=self.dtype)(x)
            kv = nn.Dense(2 * self.d_out, use_bias=self.qkv_bias, name="kv", dtype=self.dtype)(x_kv)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(3 * self.d_out, use_bias=self.qkv_bias, name="qkv", dtype=self.dtype)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        mask = make_attention_mask(
            q.shape[2], k.shape[2], causal=is_causal, kv_padding_mask=kv_padding_mask
        )
        out = dot_product_attention(q, k, v, mask=mask, dtype=self.dtype)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.d_out, use_bias=False, name="proj", dtype=self.dtype)(out)
