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


import flax.linen as nn
from typing import Optional

import jax
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


def grouped_cross_attention(q, k, v, *, kv_padding_mask=None, dtype=jnp.float32):
    """Cross-attention where g query rows share each key/value row: q is
    [B*g, H, Nq, Dh] and k/v stay at [B, H, M, Dh] (beam search: g beams per
    user attend to one encoder output). Avoids materializing
    jnp.repeat(kv, g) — at 32 beams that repeat dominated generation cost
    (the reference instead re-expands its cached encoder output per step,
    modules/model.py:259-265)."""
    b = k.shape[0]
    g = q.shape[0] // b
    assert q.shape[0] == b * g
    scale = q.shape[-1] ** -0.5
    qg = q.reshape(b, g, *q.shape[1:])                      # [B, g, H, Nq, Dh]
    logits = jnp.einsum("bghqd,bhkd->bghqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_padding_mask is not None:
        logits = jnp.where(kv_padding_mask[:, None, None, None, :], logits,
                           jnp.finfo(jnp.float32).min)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bghqk,bhkd->bghqd", weights, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out.reshape(b * g, *out.shape[2:])


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


def _flash_self_attention(q, k, v, kv_padding_mask, is_causal, dtype):
    """Self-attention via the Pallas TPU flash kernel (seq padded to a block
    multiple; padding expressed as segment ids so padded keys never attend)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    block = 128
    pad = (-n) % block
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
    if kv_padding_mask is None:
        seg = jnp.ones((b, n + pad), jnp.int32)
        if pad:
            seg = seg.at[:, n:].set(0)
    else:
        seg = jnp.pad(kv_padding_mask.astype(jnp.int32), ((0, 0), (0, pad)))
    out = flash_attention(
        q.astype(dtype), k.astype(dtype), v.astype(dtype),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=is_causal,
        sm_scale=d ** -0.5,
    )
    return out[:, :, :n, :].astype(dtype)


class MultiHeadAttention(nn.Module):
    """MHA with fused projections (ref attention.py:148-232).

    `use_flash`: None = auto (Pallas flash kernel for self-attention on TPU
    when the sequence is long enough to beat the dense path); True/False
    forces. Cross-attention always uses the dense path (decoder queries are
    at most sem_id_dim+1 tokens).
    """

    d_out: int
    num_heads: int
    cross_attn: bool = False
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_flash: Optional[bool] = None

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

        # Measured on v5e: at this domain's longest sequences (601 tokens,
        # ML-32M) XLA's dense masked attention beats the flash kernel both
        # forward (2.2 vs 3.0 ms fp32) and fwd+bwd (109 vs 219 ms/step bf16,
        # 4-layer stack) — flash's tiled backward only pays off at lengths
        # this workload never reaches; the auto path needs >= 2048 tokens and
        # use_flash=True forces it for future long-context variants.
        flash_capable = (
            not self.cross_attn
            and jax.default_backend() == "tpu"
            and head_dim % 64 == 0
            and q.shape[2] > 1
        )
        if self.use_flash is None:
            use_flash = flash_capable and q.shape[2] >= 2048  # auto threshold
        else:
            use_flash = self.use_flash and flash_capable
        if self.cross_attn and q.shape[0] != k.shape[0]:
            # Beam-grouped cross-attention: queries carry B*g rows, keys stay
            # at B rows (see grouped_cross_attention).
            assert q.shape[0] % k.shape[0] == 0, (
                f"query batch {q.shape[0]} not a multiple of kv batch {k.shape[0]}"
            )
            out = grouped_cross_attention(
                q, k, v, kv_padding_mask=kv_padding_mask, dtype=self.dtype
            )
        elif use_flash:
            out = _flash_self_attention(
                q, k, v, kv_padding_mask, is_causal, self.dtype
            )
        else:
            mask = make_attention_mask(
                q.shape[2], k.shape[2], causal=is_causal,
                kv_padding_mask=kv_padding_mask,
            )
            out = dot_product_attention(q, k, v, mask=mask, dtype=self.dtype)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.d_out, use_bias=False, name="proj", dtype=self.dtype)(out)
