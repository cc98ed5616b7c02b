"""Pre-norm transformer blocks and the encoder-decoder.

Parity: reference modules/transformer/model.py (TransformerBlock,
TransformerDecoder, TransformerEncoderDecoder). Pre-norm RMSNorm, SiLU MLP
feed-forward with hidden [1024] (ref model.py:46-56), cross-attention queries
computed from the *block input* x (ref model.py:78-80 — not from attn_out).

TPU design: stateless modules; the reference's Python-side encoder-output
cache (model.py:181-186) becomes an explicit `context_encoded` argument the
beam-search loop carries, and its (disabled) KV cache is unnecessary — the
decoder side is at most sem_id_dim+1 tokens, one fused attention per step.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hidvae_tpu.models.attention import MultiHeadAttention
from hidvae_tpu.models.layers import MLP, RMSNorm


class TransformerBlock(nn.Module):
    """Pre-norm block: self-attn (+ optional cross-attn) + FF (ref model.py:21-92).

    `is_causal` / `train` are construction-time fields (not call kwargs) so the
    block can sit behind nn.remat with only array arguments crossing the
    checkpoint boundary.
    """

    d_out: int
    num_heads: int
    dropout: float = 0.0
    do_cross_attn: bool = False
    mlp_hidden_dims: Sequence[int] = (1024,)
    dtype: jnp.dtype = jnp.float32
    is_causal: bool = True
    train: bool = False
    use_flash: Optional[bool] = None  # None = auto; True forces flash self-attn

    @nn.compact
    def __call__(
        self,
        x,
        x_kv=None,
        self_padding_mask=None,
        kv_padding_mask=None,
    ):
        is_causal, train = self.is_causal, self.train
        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = RMSNorm(self.d_out, name="attn_norm")(x)
        attn_out = x + MultiHeadAttention(
            d_out=self.d_out, num_heads=self.num_heads, name="attention",
            dtype=self.dtype, use_flash=self.use_flash,
        )(drop(h), kv_padding_mask=self_padding_mask, is_causal=is_causal)

        if self.do_cross_attn:
            hc = RMSNorm(self.d_out, name="cross_attn_norm")(x)  # query from x (ref :79)
            attn_out = attn_out + MultiHeadAttention(
                d_out=self.d_out, num_heads=self.num_heads, cross_attn=True,
                name="cross_attention", dtype=self.dtype,
            )(drop(hc), x_kv, kv_padding_mask=kv_padding_mask, is_causal=False)

        ff = RMSNorm(self.d_out, name="ffn_norm")(attn_out)
        ff = MLP(hidden_dims=self.mlp_hidden_dims, out_dim=self.d_out,
                 dropout=self.dropout, name="ff", dtype=self.dtype)(ff, train=train)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return attn_out + ff


class TransformerStack(nn.Module):
    """N stacked blocks (ref TransformerDecoder, model.py:95-136).

    `remat=True` rematerializes each block on the backward pass
    (jax.checkpoint), trading FLOPs for HBM — needed at MovieLens sequence
    lengths (200 items x 3 digits = 601 tokens) with large batches.
    """

    d_out: int
    num_heads: int
    n_layers: int
    dropout: float = 0.0
    do_cross_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        *,
        self_padding_mask=None,
        kv_padding_mask=None,
        is_causal: bool = True,
        train: bool = False,
    ):
        block_cls = (
            nn.remat(TransformerBlock, prevent_cse=False) if self.remat
            else TransformerBlock
        )
        for i in range(self.n_layers):
            x = block_cls(
                d_out=self.d_out, num_heads=self.num_heads, dropout=self.dropout,
                do_cross_attn=self.do_cross_attn, name=f"block_{i}",
                dtype=self.dtype, is_causal=is_causal, train=train,
                use_flash=self.use_flash,
            )(x, context, self_padding_mask, kv_padding_mask)
        return x


class TransformerEncoderDecoder(nn.Module):
    """Non-causal encoder over the history + causal decoder with cross-attention
    (ref model.py:139-188)."""

    d_out: int
    num_heads: int
    encoder_layers: int
    decoder_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    encoder_flash: Optional[bool] = None  # None = auto; True forces flash on encoder self-attn

    def setup(self):
        self.encoder = TransformerStack(
            d_out=self.d_out, num_heads=self.num_heads, n_layers=self.encoder_layers,
            dropout=self.dropout, do_cross_attn=False, name="encoder",
            dtype=self.dtype, remat=self.remat, use_flash=self.encoder_flash,
        )
        self.decoder = TransformerStack(
            d_out=self.d_out, num_heads=self.num_heads, n_layers=self.decoder_layers,
            dropout=self.dropout, do_cross_attn=True, name="decoder",
            dtype=self.dtype, remat=self.remat,
        )

    def encode(self, context, *, padding_mask=None, train: bool = False):
        return self.encoder(
            context, self_padding_mask=padding_mask, is_causal=False, train=train
        )

    def decode(self, x, context_encoded, *, context_padding_mask=None, train: bool = False):
        return self.decoder(
            x, context_encoded,
            self_padding_mask=None, kv_padding_mask=context_padding_mask,
            is_causal=True, train=train,
        )

    def __call__(self, x, context, *, padding_mask=None, train: bool = False):
        enc = self.encode(context, padding_mask=padding_mask, train=train)
        return self.decode(x, enc, context_padding_mask=padding_mask, train=train)
